"""[EXT] E5 — multimodal column convention (SURVEY.md §2.11).

Convention: a modality payload travels as an opaque ``binary`` column next
to a typed metadata struct::

    payload  BINARY                      -- encoded image/audio/video bytes
    meta     STRUCT<width INT, height INT, channels INT, fmt STRING>

Three formats decode for real, everything else raises NotImplementedError:

- ``png`` — a pure-stdlib decoder (``zlib`` inflate + per-scanline
  unfilter walk, all five PNG filter types, 8-bit gray/RGB/RGBA): real
  pixel stats from real image bytes, no external codec needed. A matching
  minimal encoder (:func:`encode_png`) generates test fixtures and the
  mixed-format corpus.
- ``wav`` — real RIFF/PCM decode via the stdlib ``wave`` module: signal
  features (duration, RMS, peak) from real audio bytes.
- ``fake8`` — the deterministic byte-stream stand-in kept from round 1
  (payload bytes ARE the "pixels"), so plumbing tests stay codec-free.

``jpeg`` (round 11; SOF2 round 12) — real ITU-T T.81 decode via the
pure-numpy codec in ``operators/jpeg.py`` (baseline SOF0 AND
progressive SOF2, 4:4:4/4:2:2/4:2:0, restart markers; lossless/
arithmetic raise loudly), plus spec-conformant sequential and
progressive encoders so fixtures exist without an image library.
Compressed audio/video still need codecs the container doesn't ship
(verified: no PIL/ffmpeg); their path is the guarded NotImplementedError.
The Spark plumbing — schema convention, Arrow-batched ``mapInPandas``,
batch shapes, fan-out sampling — is identical for every format.

Scale notes: payloads ride in parquet binary columns; feature extraction
is ``mapInPandas`` (Arrow batches, zero-copy into pandas) — the canonical
Spark shape for Python-only per-row work. No shuffle: extraction is a
projection; partition sizing is controlled upstream by
``spark.sql.files.maxPartitionBytes`` against the payload column size.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAKE_FORMAT = "fake8"
PNG_FORMAT = "png"
JPEG_FORMAT = "jpeg"

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, byte_sum bigint, width int, height int, "
    "fmt string, px_mean double"
)

# ---------------------------------------------------------------------------
# Pure-stdlib PNG codec (RFC 2083): 8-bit depth, color types 0/2/6,
# no interlace. Enough to decode real PNGs produced by any standard
# encoder at these settings — and to produce them for fixtures.
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_COLOR_CHANNELS = {0: 1, 2: 3, 6: 4}


def _png_chunk(typ: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + typ
        + body
        + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
    )


def encode_png(pixels, filter_type: int = 0) -> bytes:
    """Minimal PNG encoder: 8-bit depth, grayscale/RGB/RGBA chosen by
    array shape (h,w) / (h,w,3) / (h,w,4), single IDAT, the same
    ``filter_type`` (0-4) applied to every scanline. Exists for fixture
    generation and the mixed-format corpus; filters 1-4 exercise the
    decoder's unfilter paths against the roundtrip identity."""
    arr = np.ascontiguousarray(np.asarray(pixels, dtype=np.uint8))
    if arr.ndim == 2:
        h, w, ch, color = *arr.shape, 1, 0
    elif arr.ndim == 3 and arr.shape[2] == 3:
        (h, w, ch), color = arr.shape, 2
    elif arr.ndim == 3 and arr.shape[2] == 4:
        (h, w, ch), color = arr.shape, 6
    else:
        raise ValueError(f"unsupported pixel array shape {arr.shape}")
    flat = arr.reshape(h, w * ch)
    if not 0 <= filter_type <= 4:
        raise ValueError(f"bad PNG filter type {filter_type}")
    lines = []
    prior = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        line = flat[y]
        lines.append(bytes([filter_type]) + _png_filter(line, prior, ch, filter_type))
        prior = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )


def _png_filter(line: np.ndarray, prior: np.ndarray, bpp: int, ft: int) -> bytes:
    """Apply PNG filter ``ft`` to a reconstructed scanline (encoder side).
    uint8 arithmetic wraps mod 256 exactly as the spec requires."""
    if ft == 0:
        return line.tobytes()
    left = np.zeros_like(line)
    left[bpp:] = line[:-bpp]
    if ft == 1:
        return (line - left).tobytes()
    if ft == 2:
        return (line - prior).tobytes()
    if ft == 3:
        avg = ((left.astype(np.int32) + prior.astype(np.int32)) >> 1).astype(np.uint8)
        return (line - avg).tobytes()
    up_left = np.zeros_like(prior)
    up_left[bpp:] = prior[:-bpp]
    pred = _paeth(left, prior, up_left)
    return (line - pred).tobytes()


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor over int32 copies of left/up/up-left."""
    a, b, c = (x.astype(np.int32) for x in (a, b, c))
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _decode_png(data: bytes) -> tuple[np.ndarray, int, int, int]:
    """Decode a PNG into (pixels uint8 [h, w*ch], width, height, channels).

    Chunk walk with CRC verification, zlib inflate of the concatenated
    IDAT stream, then scanline unfiltering. Filters 0/2 are vectorized
    whole-line numpy; 1/3/4 carry an intra-line data dependency, resolved
    lane-wise: filter 1 (Sub) is a cumulative sum per byte lane mod 256
    (vectorized cumsum over a strided view); 3/4 fall back to a per-byte
    walk (scanlines are short; numpy uint8 wrap matches the spec).
    """
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, width, height, color, idat = 8, None, None, None, []
    while pos + 12 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(typ + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        pos += 12 + length
        if typ == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise NotImplementedError(f"only 8-bit PNG supported (depth={depth})")
            if color not in _COLOR_CHANNELS:
                raise NotImplementedError(
                    f"PNG color type {color} not supported (palette/16-bit)"
                )
            if interlace:
                raise NotImplementedError("Adam7 interlaced PNG not supported")
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    ch = _COLOR_CHANNELS[color]
    stride = width * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"PNG pixel stream length {len(raw)} != expected {(stride + 1) * height}"
        )
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters, lines = rows[:, 0], rows[:, 1:]
    out = np.empty((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft, line = int(filters[y]), lines[y]
        if ft == 0:
            recon = line.copy()
        elif ft == 1:
            # Sub: recon[i] = line[i] + recon[i-bpp] — per-lane cumsum mod 256
            recon = np.cumsum(
                line.reshape(width, ch).astype(np.int64), axis=0
            ).astype(np.uint8).reshape(stride)
        elif ft == 2:
            recon = line + prior
        elif ft == 3:
            recon = line.copy()
            for i in range(stride):
                left = int(recon[i - ch]) if i >= ch else 0
                recon[i] = (int(line[i]) + ((left + int(prior[i])) >> 1)) & 0xFF
        elif ft == 4:
            recon = line.copy()
            for i in range(stride):
                a = int(recon[i - ch]) if i >= ch else 0
                b = int(prior[i])
                c = int(prior[i - ch]) if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                recon[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG scanline filter {ft}")
        out[y] = recon
        prior = out[y]
    return out, width, height, ch


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build the multimodal convention columns from the documents fixture:
    payload = UTF-8 bytes of the text (a stand-in for encoded pixels),
    meta derived deterministically from doc_id."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            ((F.col("doc_id") * 7) % 640 + 16).cast("int").alias("width"),
            ((F.col("doc_id") * 13) % 480 + 16).cast("int").alias("height"),
            F.lit(3).alias("channels"),
            F.lit(FAKE_FORMAT).alias("fmt"),
        ).alias("meta"),
    )


def decode_image(payload: bytes, fmt: str) -> dict:
    """Decode one payload into pixel features.

    ``png`` runs the real stdlib decoder (pixel stats over DECODED bytes,
    dimensions from IHDR); ``jpeg`` runs the real T.81 decoder
    (``operators/jpeg.py`` — baseline SOF0 and progressive SOF2,
    4:4:4/4:2:2/4:2:0, restart markers; lossless/arithmetic raise
    loudly); ``fake8`` treats the payload bytes as
    the pixels (vectorized ``np.frombuffer`` sum — the shape a real
    kernel uses, never a per-byte Python loop); every other format
    raises NotImplementedError (compressed audio/video still need codecs
    this environment doesn't ship — the guard IS the documented
    extension point).
    """
    if fmt in (PNG_FORMAT, JPEG_FORMAT):
        if fmt == PNG_FORMAT:
            px, w, h, _ch = _decode_png(bytes(payload))
        else:
            from .jpeg import decode_jpeg

            px, w, h, _ch = decode_jpeg(bytes(payload))
        total = int(px.sum(dtype=np.int64))
        return {
            "n_bytes": len(payload),
            "byte_sum": total,
            "width": w,
            "height": h,
            "px_mean": total / px.size,
        }
    if fmt == FAKE_FORMAT:
        arr = np.frombuffer(payload, dtype=np.uint8)
        total = int(arr.sum(dtype=np.int64))
        return {
            "n_bytes": len(payload),
            "byte_sum": total,
            "width": None,
            "height": None,
            "px_mean": total / arr.size if arr.size else 0.0,
        }
    raise NotImplementedError(
        f"decode for format {fmt!r} requires a codec not present in this "
        "environment; supported here: 'png' (stdlib decoder), 'fake8' "
        "(deterministic stub)"
    )


def extract_features(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: decode each payload and emit feature rows.
    Arrow hands payloads to pandas as Python bytes — the real batch shape
    an image pipeline would see. Decoded dimensions (PNG IHDR) win over
    the metadata column; formats without intrinsic dimensions (fake8)
    pass the metadata through."""
    for pdf in frames:
        feats = [decode_image(p, f) for p, f in zip(pdf["payload"], pdf["fmt"])]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": [f["n_bytes"] for f in feats],
                "byte_sum": [f["byte_sum"] for f in feats],
                "width": pd.Series(
                    [
                        f["width"] if f["width"] is not None else m
                        for f, m in zip(feats, pdf["width"])
                    ],
                    dtype="int32",
                ),
                "height": pd.Series(
                    [
                        f["height"] if f["height"] is not None else m
                        for f, m in zip(feats, pdf["height"])
                    ],
                    dtype="int32",
                ),
                "fmt": pdf["fmt"],
                "px_mean": pd.Series([f["px_mean"] for f in feats], dtype="float64"),
            }
        )


def _png_pixels_for(doc_id: int) -> np.ndarray:
    """Deterministic tiny test image for the mixed corpus: dimensions and
    color type derived from doc_id, gradient pixel pattern."""
    w, h = 4 + doc_id % 13, 4 + doc_id % 11
    ch = (1, 3, 4)[doc_id % 3]
    y, x = np.mgrid[0:h, 0:w]
    base = (3 * x + 5 * y + doc_id) % 256
    if ch == 1:
        return base.astype(np.uint8)
    planes = [(base + 17 * c) % 256 for c in range(ch)]
    return np.stack(planes, axis=-1).astype(np.uint8)


def attach_payload_mixed(
    docs: DataFrame, text_col: str = "text", png_every: int = 7,
    jpeg_every: "int | None" = None,
) -> DataFrame:
    """Mixed-format corpus: every ``png_every``-th doc_id carries a REAL
    PNG payload (tiny deterministic image, cycling gray/RGB/RGBA,
    encoded by :func:`encode_png` with the scanline filter cycling 0-4 so
    decode exercises every unfilter path); every ``jpeg_every``-th
    remaining doc_id carries a REAL baseline JPEG (gray/RGB cycling,
    4:4:4 and 4:2:0 alternating, restart intervals every third one, so
    decode exercises the sampling/restart paths); the rest carry the
    ``fake8`` text-bytes payload.

    PNG payloads are synthesized inside ``mapInPandas`` — payload
    construction is Python-side by nature here, standing in for bytes
    that a real pipeline reads from object storage; the downstream decode
    path neither knows nor cares where the bytes came from."""
    mixed_schema = (
        "doc_id bigint, payload binary, width int, height int, "
        "channels int, fmt string"
    )

    def build(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in frames:
            payloads, widths, heights, chans, fmts = [], [], [], [], []
            for did, text in zip(pdf["doc_id"].astype("int64"), pdf[text_col]):
                did = int(did)
                if did % png_every == 0:
                    px = _png_pixels_for(did)
                    h, w = px.shape[:2]
                    ch = 1 if px.ndim == 2 else px.shape[2]
                    payloads.append(encode_png(px, filter_type=did % 5))
                    widths.append(w)
                    heights.append(h)
                    chans.append(ch)
                    fmts.append(PNG_FORMAT)
                elif jpeg_every and did % jpeg_every == 0:
                    from .jpeg import encode_jpeg, encode_jpeg_progressive

                    px = _png_pixels_for(did)
                    if px.ndim == 3 and px.shape[2] == 4:
                        px = px[..., :3]  # JPEG has no alpha channel
                    h, w = px.shape[:2]
                    ch = 1 if px.ndim == 2 else px.shape[2]
                    # every third JPEG row is PROGRESSIVE (SOF2, round
                    # 12) — same coefficients, multi-scan encoding —
                    # so the mixed corpus exercises both decode paths
                    if did % 3 == 1:
                        payloads.append(
                            encode_jpeg_progressive(
                                px,
                                quality=85 + did % 11,
                                subsampling="420" if did % 2 else "444",
                            )
                        )
                    else:
                        payloads.append(
                            encode_jpeg(
                                px,
                                quality=85 + did % 11,
                                subsampling="420" if did % 2 else "444",
                                restart_interval=2 if did % 3 == 0 else 0,
                            )
                        )
                    widths.append(w)
                    heights.append(h)
                    chans.append(ch)
                    fmts.append(JPEG_FORMAT)
                else:
                    payloads.append((text or "").encode("utf-8"))
                    widths.append((did * 7) % 640 + 16)
                    heights.append((did * 13) % 480 + 16)
                    chans.append(3)
                    fmts.append(FAKE_FORMAT)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "channels": pd.Series(chans, dtype="int32"),
                    "fmt": fmts,
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(build, mixed_schema).select(
        "doc_id",
        "payload",
        F.struct("width", "height", "channels", "fmt").alias("meta"),
    )


def multimodal_features(
    docs: DataFrame, png_every: int | None = None,
    jpeg_every: int | None = None,
) -> DataFrame:
    """E5 — end-to-end: attach payload/meta, flatten for Arrow, decode via
    mapInPandas, return typed features. ``png_every`` switches to the
    mixed fake8/PNG corpus (real decode on the PNG rows); ``jpeg_every``
    additionally makes every such remaining doc a REAL baseline JPEG
    (real T.81 decode)."""
    mm = (
        attach_payload_mixed(
            docs, png_every=png_every, jpeg_every=jpeg_every
        )
        if png_every is not None
        else attach_payload(docs)
    )
    flat = mm.select(
        "doc_id",
        "payload",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.fmt").alias("fmt"),
    )
    return flat.mapInPandas(extract_features, FEATURE_SCHEMA)


def _pack_bits64(bits: np.ndarray) -> int:
    """Pack a 64-element boolean array into a signed 64-bit int (bit i =
    bits[i]) — the single shared bit-packer behind every perceptual
    fingerprint, so the text/image/video hash spaces can never drift
    apart by copy-paste edits."""
    v = np.uint64(0)
    for i, b in enumerate(bits):
        if b:
            v |= np.uint64(1) << np.uint64(i)
    return int(v.astype(np.int64))


def _flat_hash64(salt: str, level: float) -> int:
    """Fingerprint for a ZERO-VARIANCE input, where threshold-vs-mean
    hashing degenerates to all-zero bits (an all-black and an all-white
    image would both hash to 0 and spuriously pair). Quantize the level
    to 6 bits and derive a salted md5 fingerprint: same flat level ->
    same hash (true duplicates still collide), different levels or
    different modalities -> ~32 expected hamming (never pairs)."""
    import hashlib

    q = int(level) >> 2
    digest = hashlib.md5(f"{salt}:{q}".encode()).digest()[:8]
    return int(np.uint64(int.from_bytes(digest, "big")).astype(np.int64))


def _ahash64(gray: np.ndarray) -> int:
    """64-bit average hash of a 2-D grayscale array: sample an 8x8 grid
    (nearest-index, so any dimensions >= 1x1 work), threshold each sample
    against the grid mean, pack the bits. The standard cheap perceptual
    fingerprint — stable under re-encoding and small pixel noise, which
    is exactly what byte-level (E1) dedup misses for images. Flat images
    take the salted level fingerprint (see :func:`_flat_hash64`)."""
    h, w = gray.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(8) * w) // 8
    grid = gray[np.ix_(ys, xs)].astype(np.float64)
    if np.all(grid == grid.flat[0]):
        return _flat_hash64("flat-img", grid.flat[0])
    return _pack_bits64((grid > grid.mean()).flatten())


def _profile_hash64(data: np.ndarray) -> int:
    """fake8 analogue of the aHash: 64 nearest-index samples over the
    byte stream, thresholded against their mean; flat streams take the
    salted level fingerprint."""
    n = data.size
    if n == 0:
        return 0
    idx = (np.arange(64) * n) // 64
    s = data[idx].astype(np.float64)
    if np.all(s == s[0]):
        return _flat_hash64("flat-f8", s[0])
    return _pack_bits64(s > s.mean())


def _gray_plane(px: np.ndarray, w: int, h: int, ch: int) -> np.ndarray:
    """Decoded PNG pixel block (h, w*ch) -> 2-D grayscale (channel
    mean) — the one conversion both the image and video hash paths use."""
    if ch == 1:
        return px.reshape(h, w)
    return px.reshape(h, w, ch).mean(axis=2)


def image_ahash(mm: DataFrame) -> DataFrame:
    """E5 x E2 — perceptual fingerprint per payload: decode, gray-average
    the channels, 8x8 average-hash (``png``/``jpeg`` — real decoders);
    byte-profile hash (``fake8``); NotImplementedError guard for
    undecodable formats. ``family`` says which 64-bit hash SPACE a row
    lives in ("pixel" for decoded images regardless of container,
    "profile" for the byte stub) — the near-dup bucket key, so a PNG and
    a JPEG re-encode of the same pixels CAN pair while profile hashes
    never cross into pixel space. mapInPandas projection — no shuffle;
    the hash is 8 bytes per doc, so the downstream near-dup search never
    touches pixels again."""

    def do_hash(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in frames:
            hashes = []
            families = []
            for p, f in zip(pdf["payload"], pdf["fmt"]):
                if f in (PNG_FORMAT, JPEG_FORMAT):
                    if f == PNG_FORMAT:
                        px, w, h, ch = _decode_png(bytes(p))
                    else:
                        from .jpeg import decode_jpeg

                        px, w, h, ch = decode_jpeg(bytes(p))
                    hashes.append(_ahash64(_gray_plane(px, w, h, ch)))
                    families.append("pixel")
                elif f == FAKE_FORMAT:
                    hashes.append(
                        _profile_hash64(np.frombuffer(p, dtype=np.uint8))
                    )
                    families.append("profile")
                else:
                    raise NotImplementedError(
                        f"perceptual hash for format {f!r} requires a codec "
                        "not present in this environment"
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "fmt": pdf["fmt"],
                    "family": families,
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    flat = mm.select(
        "doc_id", "payload", F.col("meta.fmt").alias("fmt")
    )
    return flat.mapInPandas(
        do_hash, "doc_id bigint, fmt string, family string, phash bigint"
    )


def image_neardup_pairs(
    docs: DataFrame,
    png_every: int = 7,
    max_hamming: int = 3,
    n_bands: int = 4,
    max_bucket: int | None = None,
    jpeg_every: "int | None" = None,
) -> DataFrame:
    """E5 x E2 — image near-duplicate pairs over the mixed corpus:
    perceptual aHash fingerprints -> the shared banded hamming search
    (pigeonhole-exact, same engine as the SimHash text path). Catches
    re-encoded / lightly-perturbed images that byte-exact dedup misses;
    pixels are touched exactly once (the hash pass). The hash FAMILY is
    the bucket key (``same_key``): every decoded image hashes into one
    "pixel" space whatever its container — a JPEG re-encode of a PNG
    pairs — while the fake8 byte-profile hashes live in their own
    space and never cross in."""
    from .dedup import hamming_neardup_pairs

    mm = attach_payload_mixed(
        docs, png_every=png_every, jpeg_every=jpeg_every
    )
    return hamming_neardup_pairs(
        image_ahash(mm), "phash", max_hamming, n_bands, max_bucket,
        same_key="family",
    )


RESIZE_SCHEMA = (
    "doc_id bigint, payload binary, width int, height int, channels int, "
    "fmt string"
)


def resize_payload(mm: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """E5 — image resize plumbing: payload -> payload at (target_w,
    target_h), meta updated. Same mapInPandas batch shape a Pillow
    ``Image.resize`` would use; the ``fake8`` "codec" resizes by cyclic
    byte tiling (numpy ``resize`` — deterministic from the input bytes
    alone), real formats raise like :func:`decode_image`. Output payload
    size is exactly ``target_w * target_h * channels``."""
    import numpy as np

    def do_resize(frames):
        for pdf in frames:
            out = []
            for p, f, ch in zip(pdf["payload"], pdf["fmt"], pdf["channels"]):
                if f != FAKE_FORMAT:
                    raise NotImplementedError(
                        f"resize for format {f!r} requires an image codec; "
                        "only the deterministic 'fake8' stub is available"
                    )
                arr = np.frombuffer(p, dtype=np.uint8)
                out.append(np.resize(arr, target_w * target_h * int(ch)).tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": out,
                    "width": target_w,
                    "height": target_h,
                    "channels": pdf["channels"].astype("int32"),
                    "fmt": pdf["fmt"],
                }
            )

    flat = mm.select(
        "doc_id",
        "payload",
        F.col("meta.channels").alias("channels"),
        F.col("meta.fmt").alias("fmt"),
    )
    return flat.mapInPandas(do_resize, RESIZE_SCHEMA).select(
        "doc_id",
        "payload",
        F.struct("width", "height", "channels", "fmt").alias("meta"),
    )


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary"


def sample_frames(
    docs: DataFrame, frame_size: int = 256, stride: int = 4
) -> DataFrame:
    """E5 — video frame sampling plumbing: treat the payload as a sequence
    of fixed-size encoded frames and emit every ``stride``-th one. The
    fan-out mapInPandas shape (one input row -> many frame rows) is what a
    real ffmpeg-backed sampler produces; frames here are deterministic
    byte slices, so the result is DuckDB-checkable (q_e5_frame_sample
    compares md5 per emitted frame). The trailing partial frame is kept —
    real decoders also emit a final short GOP."""

    def do_sample(frames):
        for pdf in frames:
            ids, idxs, chunks = [], [], []
            for did, p in zip(pdf["doc_id"].astype("int64"), pdf["payload"]):
                for i in range(0, -(-len(p) // frame_size), stride):
                    ids.append(did)
                    idxs.append(i)
                    chunks.append(p[i * frame_size : (i + 1) * frame_size])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": chunks,
                }
            )

    flat = attach_payload(docs).select("doc_id", "payload")
    return flat.mapInPandas(do_sample, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Audio — real RIFF/WAV PCM decode via the stdlib ``wave`` module. Like the
# PNG path, this needs no external codec: WAV PCM is a header walk + a
# numpy frombuffer, so the audio modality's decode is REAL while
# compressed formats (mp3/ogg/flac) stay behind the NotImplementedError
# guard with the rest of the codec-dependent world.
# ---------------------------------------------------------------------------

WAV_FORMAT = "wav"

AUDIO_SCHEMA = (
    "doc_id bigint, n_bytes bigint, sample_rate int, n_channels int, "
    "n_samples bigint, duration_s double, rms double, peak int"
)


def encode_wav(samples: "np.ndarray", sample_rate: int = 16000) -> bytes:
    """Minimal WAV writer: 16-bit PCM, mono (n,) or multi-channel (n, ch)
    int16 arrays, via the stdlib ``wave`` module. Fixture/mixed-corpus
    generator, same role as :func:`encode_png`."""
    import io
    import wave

    arr = np.asarray(samples, dtype=np.int16)
    ch = 1 if arr.ndim == 1 else arr.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def decode_audio(payload: bytes, fmt: str) -> dict:
    """Decode one audio payload into signal features. ``wav`` (16-bit PCM)
    is decoded for real: numpy over the raw frames — n_samples, duration,
    RMS, peak. Compressed formats raise NotImplementedError (no codecs in
    this environment)."""
    if fmt != WAV_FORMAT:
        raise NotImplementedError(
            f"decode for audio format {fmt!r} requires a codec not present "
            "in this environment; supported here: 'wav' (stdlib PCM decode)"
        )
    import io
    import wave

    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV supported")
        ch, rate, n = w.getnchannels(), w.getframerate(), w.getnframes()
        x = np.frombuffer(w.readframes(n), dtype=np.int16)
    return {
        "n_bytes": len(payload),
        "sample_rate": rate,
        "n_channels": ch,
        "n_samples": n,
        "duration_s": n / rate if rate else 0.0,
        "rms": float(np.sqrt(np.mean(x.astype(np.float64) ** 2))) if x.size else 0.0,
        "peak": int(np.abs(x.astype(np.int32)).max()) if x.size else 0,
    }


def _wav_samples_for(doc_id: int) -> tuple["np.ndarray", int]:
    """Deterministic test signal: an integer-frequency ramp-modulated
    square-ish wave — reproducible from doc_id alone, no RNG."""
    rate = 8000
    n = 400 + (doc_id % 7) * 100
    t = np.arange(n, dtype=np.int64)
    freq = 3 + doc_id % 11
    # square wave from integer phase (exact, engine-independent)
    phase = (t * freq // rate) % 2
    amp = 3000 + (doc_id % 5) * 1000
    return ((2 * phase - 1) * amp).astype(np.int16), rate


def audio_features(docs: DataFrame, wav_every: int = 5) -> DataFrame:
    """E5 (audio) — end-to-end: every ``wav_every``-th doc carries a real
    WAV payload (deterministic PCM signal), decoded by mapInPandas into
    signal features. Docs without an audio payload are skipped (a real
    corpus stores modality per row; the filter is the dispatch)."""
    audio_schema_in = "doc_id bigint, payload binary"

    def build(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in frames:
            ids, payloads = [], []
            for did in pdf["doc_id"].astype("int64"):
                did = int(did)
                if did % wav_every == 0:
                    samples, rate = _wav_samples_for(did)
                    ids.append(did)
                    payloads.append(encode_wav(samples, rate))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"), "payload": payloads}
            )

    def extract(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in frames:
            feats = [decode_audio(p, WAV_FORMAT) for p in pdf["payload"]]
            out = {"doc_id": pdf["doc_id"].astype("int64")}
            for k, dtype in (
                ("n_bytes", "int64"), ("sample_rate", "int32"),
                ("n_channels", "int32"), ("n_samples", "int64"),
                ("duration_s", "float64"), ("rms", "float64"), ("peak", "int32"),
            ):
                out[k] = pd.Series([f[k] for f in feats], dtype=dtype)
            yield pd.DataFrame(out)

    wav = docs.select("doc_id").mapInPandas(build, audio_schema_in)
    return wav.mapInPandas(extract, AUDIO_SCHEMA)


# ---------------------------------------------------------------------------
# Pure-stdlib Y4M (YUV4MPEG2) video codec: the standard UNCOMPRESSED
# video interchange format — plain-text header, raw C420 planes per
# frame. Real video bytes decoded with zero external codecs; compressed
# containers (mp4/h264/vp9) stay behind the NotImplementedError guard.
# ---------------------------------------------------------------------------

Y4M_FORMAT = "y4m"
Y4M_MAGIC = b"YUV4MPEG2"

VIDEO_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, n_frames int, "
    "fps double, duration_s double, luma_mean double, motion double"
)


def encode_y4m(frames: "np.ndarray", fps_num: int = 25, fps_den: int = 1) -> bytes:
    """Minimal YUV4MPEG2 writer: grayscale frame stack (n, h, w) uint8 as
    C420 (luma = the frames, chroma planes neutral 128). Fixture/mixed-
    corpus generator, same role as :func:`encode_png`/``encode_wav``.
    Even dimensions required by 4:2:0 subsampling."""
    f = np.asarray(frames, dtype=np.uint8)
    n, h, w = f.shape
    if h % 2 or w % 2:
        raise ValueError("C420 needs even dimensions")
    head = f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A1:1 C420\n".encode()
    chroma = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    out = [head]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(f[i].tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def decode_y4m(payload: bytes) -> tuple["np.ndarray", int, int, float]:
    """Decode a YUV4MPEG2 stream into (luma frames (n, h, w) uint8,
    width, height, fps). Chroma planes are walked (stream framing) but
    only luma is returned — the plane every vision feature here uses."""
    data = bytes(payload)
    if not data.startswith(Y4M_MAGIC):
        raise ValueError("not a Y4M stream (bad magic)")
    nl = data.index(b"\n")
    w = h = None
    fps = 25.0
    for tok in data[len(Y4M_MAGIC):nl].split():
        t = tok.decode()
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("F"):
            num, den = t[1:].split(":")
            fps = int(num) / int(den)
        elif t.startswith("C") and t[1:] not in ("420", "420jpeg", "420mpeg2"):
            raise NotImplementedError(f"only C420 chroma supported, got {t}")
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    y_size, c_size = h * w, (h // 2) * (w // 2)
    pos, frames = nl + 1, []
    while pos < len(data):
        if data[pos:pos + 5] != b"FRAME":
            raise ValueError("bad Y4M frame marker")
        fnl = data.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("truncated Y4M frame header")
        pos = fnl + 1
        if pos + y_size + 2 * c_size > len(data):
            raise ValueError("truncated Y4M frame")
        frames.append(
            np.frombuffer(data, dtype=np.uint8, count=y_size, offset=pos)
            .reshape(h, w)
        )
        pos += y_size + 2 * c_size
    return np.stack(frames) if frames else np.empty((0, h, w), np.uint8), w, h, fps


def decode_video(payload: bytes, fmt: str) -> dict:
    """Decode one video payload into stream features: dimensions, frame
    count, duration, mean luma, and mean inter-frame absolute difference
    (the cheap motion signal a sampling curator thresholds on — static
    slideshows score ~0, real footage higher)."""
    if fmt != Y4M_FORMAT:
        raise NotImplementedError(
            f"decode for video format {fmt!r} requires a codec not present "
            "in this environment; supported here: 'y4m' (stdlib YUV decode)"
        )
    frames, w, h, fps = decode_y4m(payload)
    n = frames.shape[0]
    motion = (
        float(np.abs(np.diff(frames.astype(np.int16), axis=0)).mean())
        if n >= 2
        else 0.0
    )
    return {
        "n_bytes": len(payload),
        "width": w,
        "height": h,
        "n_frames": n,
        "fps": fps,
        "duration_s": n / fps if fps else 0.0,
        "luma_mean": float(frames.mean()) if n else 0.0,
        "motion": motion,
    }


def audio_energy_hash64(samples: "np.ndarray") -> int:
    """64-bit audio fingerprint: RMS energy over 64 equal windows,
    thresholded against the mean energy (Shazam-lite, no FFT needed).
    AMPLITUDE-INVARIANT by construction — scaling every sample by a
    constant scales all window energies and their mean equally, so a
    volume-normalized re-encode collides with its source (the audio
    analogue of the re-encoded-PNG case). Flat signals take the salted
    level fingerprint."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim > 1:
        x = x.mean(axis=1)
    n = x.size
    if n == 0:
        return 0
    bounds = (np.arange(65) * n) // 64
    # per-window mean square via one cumulative sum (exact, O(n))
    csq = np.concatenate([[0.0], np.cumsum(x * x)])
    widths = np.maximum(bounds[1:] - bounds[:-1], 1)
    energies = (csq[bounds[1:]] - csq[bounds[:-1]]) / widths
    if np.all(energies == energies[0]):
        return _flat_hash64("flat-audio", float(np.sqrt(energies[0])))
    return _pack_bits64(energies > energies.mean())


def audio_neardup_pairs(
    docs: DataFrame,
    wav_every: int = 5,
    max_hamming: int = 3,
    n_bands: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """E5 x E2 (audio) — near-duplicate clip pairs: decode each WAV,
    fingerprint its energy profile, feed the shared banded hamming
    search. Catches volume-scaled / re-encoded copies byte dedup
    misses; samples are touched exactly once (the hash pass)."""
    from .dedup import hamming_neardup_pairs

    def build(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in frames:
            ids, payloads = [], []
            for did in pdf["doc_id"].astype("int64"):
                did = int(did)
                if did % wav_every == 0:
                    samples, rate = _wav_samples_for(did)
                    ids.append(did)
                    payloads.append(encode_wav(samples, rate))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"), "payload": payloads}
            )

    def do_hash(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in frames:
            hashes = []
            for p in pdf["payload"]:
                with wave.open(io.BytesIO(bytes(p)), "rb") as wv:
                    x = np.frombuffer(
                        wv.readframes(wv.getnframes()), dtype=np.int16
                    )
                hashes.append(audio_energy_hash64(x))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    wav = docs.select("doc_id").mapInPandas(build, "doc_id bigint, payload binary")
    hashes = wav.mapInPandas(do_hash, "doc_id bigint, phash bigint")
    return hamming_neardup_pairs(
        hashes, "phash", max_hamming, n_bands, max_bucket
    )


def _y4m_frames_for(doc_id: int) -> "np.ndarray":
    """Deterministic tiny clip: a bright square translating across a
    gradient background — nonzero motion, reproducible from doc_id."""
    n = 3 + doc_id % 4
    h, w = 16 + 2 * (doc_id % 5), 16 + 2 * (doc_id % 3)
    y, x = np.mgrid[0:h, 0:w]
    gradient = ((2 * x + 3 * y + 11 * doc_id) % 128).astype(np.uint8)
    out = np.empty((n, h, w), dtype=np.uint8)
    for i in range(n):
        frame = gradient.copy()
        sx = (3 * i + doc_id) % (w - 4)
        frame[2:6, sx:sx + 4] = 250
        out[i] = frame
    return out


def video_features(docs: DataFrame, y4m_every: int = 9) -> DataFrame:
    """E5 (video) — end-to-end: every ``y4m_every``-th doc carries a real
    uncompressed Y4M clip (deterministic synthetic footage), decoded by
    mapInPandas into stream features. Same dispatch-by-filter shape as
    the audio path."""

    def build(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in frames:
            ids, payloads = [], []
            for did in pdf["doc_id"].astype("int64"):
                did = int(did)
                if did % y4m_every == 0:
                    ids.append(did)
                    payloads.append(encode_y4m(_y4m_frames_for(did)))
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"), "payload": payloads}
            )

    def extract(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in frames:
            feats = [decode_video(p, Y4M_FORMAT) for p in pdf["payload"]]
            out = {"doc_id": pdf["doc_id"].astype("int64")}
            for k, dtype in (
                ("n_bytes", "int64"), ("width", "int32"), ("height", "int32"),
                ("n_frames", "int32"), ("fps", "float64"),
                ("duration_s", "float64"), ("luma_mean", "float64"),
                ("motion", "float64"),
            ):
                out[k] = pd.Series([f[k] for f in feats], dtype=dtype)
            yield pd.DataFrame(out)

    clips = docs.select("doc_id").mapInPandas(build, "doc_id bigint, payload binary")
    return clips.mapInPandas(extract, VIDEO_SCHEMA)


def sample_video_frames(
    docs: DataFrame, y4m_every: int = 9, stride: int = 2
) -> DataFrame:
    """E5 (video) — TRUE frame sampling: decode the Y4M stream, emit
    every ``stride``-th luma frame re-encoded as a standalone PNG —
    the composition a vision-pretraining pipeline runs (video -> frame
    images -> the image dedup/feature path). Fan-out mapInPandas, one
    clip row -> many image rows; downstream consumers (e.g.
    :func:`image_ahash`) treat each frame as an ordinary PNG payload.

    The codec IS in the path: clips are materialized as Y4M bytes and
    the sampled frames come from ``decode_y4m`` of those bytes (not from
    the synthetic generator), so this operator works unchanged on real
    Y4M payloads and any luma-extraction bug is visible to its tests."""

    def sample(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in frames:
            ids, idxs, payloads = [], [], []
            for did in pdf["doc_id"].astype("int64"):
                did = int(did)
                if did % y4m_every:
                    continue
                clip, _w, _h, _fps = decode_y4m(
                    encode_y4m(_y4m_frames_for(did))
                )
                for i in range(0, clip.shape[0], stride):
                    ids.append(did)
                    idxs.append(i)
                    payloads.append(encode_png(clip[i]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_png": payloads,
                }
            )

    return docs.select("doc_id").mapInPandas(
        sample, "doc_id bigint, frame_idx int, frame_png binary"
    )


def frame_ahash(frames: DataFrame) -> DataFrame:
    """Perceptual fingerprint per sampled video frame — the bridge from
    the video path into the image near-dup machinery (near-identical
    frames across clips collide in the banded hamming search exactly
    like near-identical standalone images)."""

    def do_hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = []
            for p in pdf["frame_png"]:
                px, w, h, ch = _decode_png(bytes(p))
                hashes.append(_ahash64(_gray_plane(px, w, h, ch)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "frame_idx": pdf["frame_idx"].astype("int32"),
                    "phash": pd.Series(hashes, dtype="int64"),
                }
            )

    return frames.mapInPandas(
        do_hash, "doc_id bigint, frame_idx int, phash bigint"
    )


def clip_pairs_by_shared_frames(
    frame_hashes: DataFrame, min_shared: int = 2, max_freq: int | None = None
) -> DataFrame:
    """E5 x E2 — clip-level near-duplicate pairs from per-frame
    fingerprints: two clips pair when they share >= ``min_shared``
    distinct frame hashes (re-posted / re-cut footage detection — the
    video analogue of shared-shingle text dedup).

    Shape: an inverted index on the fingerprint — distinct (doc, hash),
    ONE shuffle on the hash, in-bucket pair expansion, per-pair distinct
    count. Never clip x clip. A hash shared by many clips (intro cards,
    black frames) blows the bucket up quadratically; ``max_freq`` drops
    such non-discriminative hashes the way a text pipeline drops
    stopword shingles."""
    dh = frame_hashes.select("doc_id", "phash").distinct()
    buckets = (
        dh.groupBy("phash")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    if max_freq is not None:
        buckets = buckets.filter(F.size("ids") <= max_freq)
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x: F.transform(
                F.filter(F.col("ids"), lambda y: y > x),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        buckets.select("phash", F.explode(pairs).alias("p"))
        .groupBy("p.doc_a", "p.doc_b")
        .agg(F.count_distinct("phash").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
