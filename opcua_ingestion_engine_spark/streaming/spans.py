"""Streaming-incremental substring dedup (E2 span level, streaming form).

The batch operator (``operators/dedup.repeated_spans``) scans the whole
corpus; this sink maintains the SAME window index across micro-batches —
the shape a continuously-ingesting pipeline runs:

- Per batch: compute the batch's positional k-token window digests once
  (one pass over the batch), append the postings to the accumulated
  index, and fold the batch's per-digest counts into the count state.
  Per-batch work is O(batch): postings are kept as a LIST of per-batch
  checkpointed frames (never re-materialized), and only the count state
  (O(distinct windows) rows of 16-byte digest + count) is re-folded.
- ``result()`` joins the accumulated postings against the hot digests
  (total count >= min_repeats) and merges islands — the identical final
  computation as the batch operator, so the report EQUALS the batch
  answer under ANY batching (window counts are additive; pinned by
  pytest and by sharing the batch query's DuckDB oracle).

State size honesty: the posting index is corpus-token-sized — it IS the
inverted window index a span-dedup deployment persists (same class as
the contamination n-gram index), not per-key streaming state; the count
state is distinct-window-sized. Neither ever rides a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import merge_window_spans, positional_windows


class IncrementalSpanDedupSink:
    """foreachBatch sink: feed micro-batches of (doc_id, text) rows via
    ``process_batch``; read the accumulated span report via ``result``."""

    def __init__(self, k: int = 15, min_repeats: int = 2):
        self.k = k
        self.min_repeats = min_repeats
        self._postings: list[DataFrame] = []  # per-batch checkpointed frames
        self._counts: DataFrame | None = None  # (g, cnt)
        self._seen: DataFrame | None = None  # doc_id redelivery guard
        self.batches_seen = 0

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        # Redelivery guard: window counts are ADDITIVE, not idempotent —
        # unlike the LWW merge sinks, re-processing a delivered doc would
        # double its windows and inflate frequencies. Drop already-seen
        # doc_ids (state is O(docs) bare ids). Distinct DOCS with equal
        # text keep counting separately — those are real corpus repeats.
        if self._seen is not None:
            docs = docs.join(self._seen, "doc_id", "left_anti")
        ids = docs.select("doc_id").distinct()
        self._seen = (
            ids if self._seen is None else self._seen.unionByName(ids)
        ).localCheckpoint(eager=True)
        wins = positional_windows(docs, k=self.k).localCheckpoint(eager=True)
        self._postings.append(wins)
        bc = wins.groupBy("g").agg(F.count("*").alias("cnt"))
        if self._counts is None:
            merged = bc
        else:
            merged = (
                self._counts.unionByName(bc)
                .groupBy("g")
                .agg(F.sum("cnt").alias("cnt"))
            )
        # checkpoint per batch: keeps the count-state plan linear instead
        # of a per-batch-deepening union/agg chain
        self._counts = merged.localCheckpoint(eager=True)
        self.batches_seen += 1

    def result(self) -> DataFrame:
        if not self._postings:
            raise RuntimeError("no batches processed yet")
        hot = (
            self._counts.filter(F.col("cnt") >= self.min_repeats).select("g")
        )
        postings = self._postings[0]
        for p in self._postings[1:]:
            postings = postings.unionByName(p)
        return merge_window_spans(postings.join(hot, "g", "left_semi"), self.k)
