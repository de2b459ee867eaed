"""[EXT] E5 — multimodal column convention (SURVEY.md §2.11).

Convention: a modality payload travels as an opaque ``binary`` column next
to a typed metadata struct::

    payload  BINARY                      -- encoded image/audio/video bytes
    meta     STRUCT<width INT, height INT, channels INT, fmt STRING>

Per the build brief, the container ships no image/audio codecs, so the
actual decode is STUBBED: :func:`decode_image` raises NotImplementedError
for real formats and routes the deterministic ``fake8`` format through a
pure-Python "decoder" whose output is reproducible from the bytes alone.
Everything AROUND the stub — the schema convention, the Arrow-batched
``mapInPandas`` plumbing, batch shapes, and partition behavior — is real
and tested; swapping in Pillow/librosa later changes one function body.

Scale notes: payloads ride in parquet binary columns; feature extraction
is ``mapInPandas`` (Arrow batches, zero-copy into pandas) — the canonical
Spark shape for Python-only per-row work. No shuffle: extraction is a
projection; partition sizing is controlled upstream by
``spark.sql.files.maxPartitionBytes`` against the payload column size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAKE_FORMAT = "fake8"

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, byte_sum bigint, width int, height int"
)


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
    """The stubbed decoder. Real formats raise (no codecs in this
    environment); the deterministic ``fake8`` format treats the payload
    as raw bytes and returns reproducible features."""
    if fmt != FAKE_FORMAT:
        raise NotImplementedError(
            f"decode for format {fmt!r} requires an image codec not present "
            "in this environment; only the deterministic 'fake8' stub is "
            "available"
        )
    return {"n_bytes": len(payload), "byte_sum": sum(payload)}


def extract_features(frames: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: decode each payload and emit feature rows.
    Arrow hands payloads to pandas as Python bytes — the real batch shape
    an image pipeline would see."""
    for pdf in frames:
        feats = [decode_image(p, f) for p, f in zip(pdf["payload"], pdf["fmt"])]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "n_bytes": [f["n_bytes"] for f in feats],
                "byte_sum": [f["byte_sum"] for f in feats],
                "width": pdf["width"].astype("int32"),
                "height": pdf["height"].astype("int32"),
            }
        )


def multimodal_features(docs: DataFrame) -> DataFrame:
    """E5 — end-to-end: attach payload/meta, flatten for Arrow, decode via
    mapInPandas, return typed features."""
    flat = attach_payload(docs).select(
        "doc_id",
        "payload",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.fmt").alias("fmt"),
    )
    return flat.mapInPandas(extract_features, FEATURE_SCHEMA)


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
