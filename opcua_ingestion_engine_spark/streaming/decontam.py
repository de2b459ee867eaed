"""Streaming decontamination (E2/E8 cross-corpus form, streaming twin).

An ingest pipeline should drop benchmark-contaminated documents AS THEY
ARRIVE, not in a post-hoc sweep. The reference corpus (benchmarks,
held-out evals, a previous run's training set) is FIXED for the life of
the stream, so its half of the cross-corpus join — shingling, MinHash
signatures, banded buckets — is built exactly once at sink construction
and frozen; per micro-batch work is then proportional to the batch:
sign the batch's docs, meet the frozen reference buckets on
(band, bucket), exact-Jaccard-verify the candidates, anti-join the hits.

Because each document's verdict depends only on (doc, reference) — no
doc-vs-doc state across batches — the union of per-batch survivors
equals the batch ``dedup.decontaminate`` over the same docs under ANY
batch split (pinned in tests). That makes this the simplest of the
incremental sinks: the only cross-batch state is the redelivery guard.

At 100 TB the frozen index is a bucketed table keyed on (band, bucket)
(the per-batch candidate join is then exchange-free on the stored side)
and the reference shingle store is re-read by candidate semi-join;
locally both are eagerly checkpointed reference-sized frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup as D


class StreamingDecontaminateSink:
    """foreachBatch sink: construct with the FIXED reference corpus;
    feed micro-batches of (doc_id, text[, ...]) docs via
    ``process_batch``; decontaminated survivors accumulate in ``kept``
    and the (doc, reference, jaccard) evidence in ``hits``."""

    def __init__(
        self,
        reference: DataFrame,
        threshold: float = 0.5,
        n: int = 3,
        num_hashes: int = 96,
        bands: int = 32,
        rows_per_band: int = 3,
        max_bucket: int | None = None,
    ):
        if bands * rows_per_band > num_hashes:
            raise ValueError(
                f"band geometry {bands}x{rows_per_band} needs "
                f"{bands * rows_per_band} hashes, got num_hashes={num_hashes}"
            )
        self.threshold = threshold
        self.n = n
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = rows_per_band
        shingle = F.array_distinct(
            D.word_ngrams(F.col("text"), n)
        ).alias("sh_b")
        # frozen reference half — built ONCE, reused every batch
        ref_sh = reference.select(
            F.col("doc_id").alias("doc_b"), shingle
        ).localCheckpoint(eager=True)
        bb = D.banded_buckets(
            D.minhash_signatures(
                reference.select(
                    "doc_id",
                    F.array_distinct(
                        D.word_ngrams(F.col("text"), n)
                    ).alias("shingles"),
                ),
                num_hashes,
            ),
            bands,
            rows_per_band,
        )
        if max_bucket is not None:
            sizes = (
                bb.groupBy("band", "bucket")
                .agg(F.count("*").alias("_sz"))
                .filter(F.col("_sz") <= max_bucket)
                .drop("_sz")
            )
            bb = bb.join(sizes, ["band", "bucket"], "left_semi")
        self.ref_buckets = bb.select(
            F.col("doc_id").alias("doc_b"), "band", "bucket"
        ).localCheckpoint(eager=True)
        self._ref_shingles = ref_sh
        self.kept: DataFrame | None = None
        self.hits: DataFrame | None = None
        self.batches_seen = 0
        self._done_batch_ids: set[int] = set()

    def process_batch(self, batch_docs: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once; re-appending a redelivered
        # batch would duplicate survivor rows
        if batch_id in self._done_batch_ids:
            return
        shingle = F.array_distinct(D.word_ngrams(F.col("text"), self.n))
        sig = D.minhash_signatures(
            batch_docs.select("doc_id", shingle.alias("shingles")),
            self.num_hashes,
        )
        cand = (
            D.banded_buckets(sig, self.bands, self.rows_per_band)
            .select(F.col("doc_id").alias("doc_a"), "band", "bucket")
            .join(self.ref_buckets, ["band", "bucket"])
            .select("doc_a", "doc_b")
            .distinct()
            .localCheckpoint(eager=False)
        )
        batch_sh = batch_docs.join(
            F.broadcast(
                cand.select(F.col("doc_a").alias("doc_id")).distinct()
            ),
            "doc_id",
            "left_semi",
        ).select(F.col("doc_id").alias("doc_a"), shingle.alias("sh_a"))
        verified = (
            cand.join(batch_sh, "doc_a")
            .join(self._ref_shingles, "doc_b")
            .withColumn("jaccard", D._jaccard(F.col("sh_a"), F.col("sh_b")))
            .filter(F.col("jaccard") >= self.threshold)
            .select("doc_a", "doc_b", "jaccard")
        )
        hit_ids = verified.select(
            F.col("doc_a").alias("doc_id")
        ).distinct()
        survivors = batch_docs.join(
            F.broadcast(hit_ids), "doc_id", "left_anti"
        ).localCheckpoint(eager=True)
        batch_hits = verified.localCheckpoint(eager=True)
        self.kept = (
            survivors if self.kept is None
            else self.kept.unionByName(survivors)
        )
        self.hits = (
            batch_hits if self.hits is None
            else self.hits.unionByName(batch_hits)
        )
        self.batches_seen += 1
        self._done_batch_ids.add(batch_id)
