"""Round-11: baseline JPEG codec (``operators/jpeg.py``) and its wiring
into the multimodal column family. The container ships no image
library, so conformance is pinned the way the PNG/WAV/Y4M codecs are:
spec-level marker structure, exactly-representable cases decoded
bit-exact, lossy round trips bounded tight at high quality across
4:4:4 / 4:2:0 / restart-interval / odd-dimension variants, loud
refusals for the non-baseline processes, and the Spark-side pipeline
(mapInPandas decode features, cross-container perceptual near-dup)."""

from __future__ import annotations

import numpy as np
import pytest

from opcua_ingestion_engine_spark.operators.jpeg import (
    decode_jpeg, encode_jpeg,
)


def _smooth_rgb(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack(
        [
            (xx * 5 + 40 + seed) % 256,
            (yy * 5 + 80) % 256,
            ((xx + yy) * 3 + 60) % 256,
        ],
        axis=-1,
    )
    return (img.astype(float) * 0.35 + 90).astype(np.uint8)


def test_flat_gray_roundtrip_is_exact():
    """A constant 128 image is DC-only with every coefficient zero —
    the one case quantization cannot perturb, so the round trip must
    be bit-exact (a real conformance anchor, not a tolerance)."""
    flat = np.full((16, 24, 3), 128, dtype=np.uint8)
    px, w, h, ch = decode_jpeg(encode_jpeg(flat, quality=50))
    assert (w, h, ch) == (24, 16, 3)
    assert np.array_equal(px.reshape(16, 24, 3), flat)
    # grayscale too
    g = np.full((8, 8), 128, dtype=np.uint8)
    px, w, h, ch = decode_jpeg(encode_jpeg(g, quality=50))
    assert (w, h, ch) == (8, 8, 1) and np.array_equal(px, g)


@pytest.mark.parametrize("subsampling,tol", [("444", 3), ("420", 6)])
@pytest.mark.parametrize("restart", [0, 2])
def test_smooth_roundtrip_bounded(subsampling, tol, restart):
    img = _smooth_rgb(37, 29)
    data = encode_jpeg(
        img, quality=92, subsampling=subsampling, restart_interval=restart
    )
    px, w, h, ch = decode_jpeg(data)
    assert (w, h, ch) == (29, 37, 3)
    err = np.abs(px.reshape(37, 29, 3).astype(int) - img.astype(int))
    assert err.max() <= tol, err.max()
    if restart:
        assert any(
            data[i] == 0xFF and 0xD0 <= data[i + 1] <= 0xD7
            for i in range(2, len(data) - 2)
        ), "restart markers must be present in the stream"


def test_grayscale_and_odd_dimensions():
    yy, xx = np.mgrid[0:13, 0:10]
    gray = ((yy * 3 + xx) % 200).astype(np.uint8)
    px, w, h, ch = decode_jpeg(encode_jpeg(gray, quality=95))
    assert (w, h, ch) == (10, 13, 1)
    assert np.abs(px.astype(int) - gray.astype(int)).max() <= 2


def test_marker_structure():
    data = encode_jpeg(_smooth_rgb(16, 16), quality=85)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in data, f"missing segment {marker.hex()}"


def test_refusals_are_loud_and_typed():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    # lossless (SOF3) / arithmetic (SOF9) refuse as NotImplementedError,
    # not garbage (SOF2 progressive DECODES since round 12)
    with pytest.raises(NotImplementedError, match="lossless|arithmetic"):
        decode_jpeg(b"\xff\xd8\xff\xc3\x00\x04\x00\x00")
    with pytest.raises(NotImplementedError, match="lossless|arithmetic"):
        decode_jpeg(b"\xff\xd8\xff\xc9\x00\x04\x00\x00")
    # truncation mid-stream is a ValueError, never silent
    data = encode_jpeg(_smooth_rgb(16, 16))
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg(data[: len(data) // 2])


def test_dc_prediction_spans_blocks():
    """A wide image exercises DC-difference chaining across many MCUs;
    a step gradient makes every block's DC differ."""
    img = np.repeat(
        np.arange(0, 250, 10, dtype=np.uint8).reshape(1, -1), 9, axis=0
    )
    img = np.repeat(img, 8, axis=1)[:, :190]  # 9 x 190, 24 MCUs wide
    px, w, h, ch = decode_jpeg(encode_jpeg(img, quality=97))
    assert (w, h, ch) == (190, 9, 1)
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 3


def test_multimodal_features_decode_real_jpegs(spark):
    from opcua_ingestion_engine_spark import catalog as C
    from opcua_ingestion_engine_spark.operators import multimodal as M

    docs = C.load_table(
        spark, "/root/testdata/sf0.001", "documents"
    ).limit(40)
    feats = {
        r["doc_id"]: r
        for r in M.multimodal_features(
            docs, png_every=7, jpeg_every=5
        ).collect()
    }
    saw_jpeg = 0
    for did, f in feats.items():
        if did % 7 != 0 and did % 5 == 0:
            saw_jpeg += 1
            assert f["fmt"] == "jpeg"
            src = M._png_pixels_for(did)
            if src.ndim == 3 and src.shape[2] == 4:
                src = src[..., :3]
            h, w = src.shape[:2]
            # dimensions come from SOF0, not the meta column
            assert (f["width"], f["height"]) == (w, h)
            # lossy: the decoded mean tracks the source mean
            assert abs(f["px_mean"] - src.mean()) < 16.0
            assert f["n_bytes"] != src.size  # decode ran on ENCODED bytes
    assert saw_jpeg >= 3


def test_cross_container_neardup_pairs_png_with_jpeg(spark):
    """The capability the hash-family bucket key buys: the SAME pixels
    encoded once as PNG and once as JPEG must surface as a near-dup
    pair (re-encode detection), while unrelated images must not."""
    from pyspark.sql import functions as F

    from opcua_ingestion_engine_spark.operators import multimodal as M
    from opcua_ingestion_engine_spark.operators.dedup import (
        hamming_neardup_pairs,
    )

    img_a = _smooth_rgb(24, 24)
    # high-contrast block pattern: every aHash bit far from the mean,
    # so the fingerprint is stable across containers AND clearly
    # different content from img_a
    yy, xx = np.mgrid[0:24, 0:24]
    img_b = np.repeat(
        (((yy // 12 + xx // 12) % 2) * 255).astype(np.uint8)[..., None],
        3, axis=-1,
    )
    rows = [
        (1, M.encode_png(img_a, filter_type=2), "png"),
        (2, encode_jpeg(img_a, quality=95), "jpeg"),   # re-encode of 1
        (3, M.encode_png(img_b, filter_type=1), "png"),
        (4, encode_jpeg(img_b, quality=95, subsampling="420"), "jpeg"),
    ]
    mm = spark.createDataFrame(
        rows, "doc_id long, payload binary, fmt string"
    ).select(
        "doc_id", "payload",
        F.struct(F.col("fmt").alias("fmt")).alias("meta"),
    )
    hashed = M.image_ahash(mm)
    pairs = {
        tuple(sorted((r["doc_a"], r["doc_b"])))
        for r in hamming_neardup_pairs(
            hashed, "phash", max_hamming=3, n_bands=4, same_key="family"
        ).collect()
    }
    assert (1, 2) in pairs, pairs
    assert (3, 4) in pairs, pairs
    assert (1, 3) not in pairs and (2, 4) not in pairs and (1, 4) not in pairs


def test_corrupted_streams_fail_typed_never_hang():
    """Adversarial bytes must raise a TYPED error quickly (ValueError /
    NotImplementedError / IndexError / struct.error) — never hang, loop,
    or return garbage silently. Deterministic corruption sweep: every
    truncation point (stride 7) and single-byte flips (stride 11) of a
    real stream."""
    import struct as _struct

    img = _smooth_rgb(16, 16)
    data = bytearray(encode_jpeg(img, quality=85))
    allowed = (ValueError, NotImplementedError, IndexError, _struct.error)
    for cut in range(2, len(data), 7):
        try:
            decode_jpeg(bytes(data[:cut]))
        except allowed:
            pass  # typed refusal is the contract
    flips = 0
    for pos in range(2, len(data), 11):
        mutated = bytearray(data)
        mutated[pos] ^= 0x5A
        try:
            px, w, h, ch = decode_jpeg(bytes(mutated))
            # a surviving decode must still honor the declared geometry
            assert px.shape == (h, w * ch)
        except allowed:
            flips += 1
    assert flips > 0  # the sweep did hit the entropy/marker machinery
