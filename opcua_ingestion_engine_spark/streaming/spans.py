"""Streaming-incremental substring dedup (E2 span level, streaming form).

The batch operator (``operators/dedup.repeated_spans``) scans the whole
corpus; this sink maintains the SAME window index across micro-batches —
the shape a continuously-ingesting pipeline runs:

- Per batch: compute the batch's positional k-token window digests once
  (ONE evaluation of the batch frame), append the postings to the
  accumulated index, and fold the batch's per-digest counts into the
  count state. Postings are kept as LSM-style tiers of checkpointed
  frames: each batch enters at level 0 and equal-level tiers merge
  pairwise (binary-counter discipline), so plan depth is O(log batches)
  and amortized per-batch compaction work is O(batch * log batches) —
  never a full-index rewrite. The count state (O(distinct windows) rows
  of 16-byte digest + count) re-folds per batch.
- ``result()`` joins the accumulated postings against the hot digests
  (total count >= min_repeats) and merges islands — the identical final
  computation as the batch operator, so the report EQUALS the batch
  answer under ANY batching (window counts are additive; pinned by
  pytest and by sharing the batch query's DuckDB oracle).

Redelivery discipline (same contract as the sibling incremental sinks,
but counts are ADDITIVE, not idempotent, so it is load-bearing here):

- a batch_id already fully processed is SKIPPED outright (foreachBatch
  re-runs a failed batch with the same id);
- state is mutated ONLY after every Spark job for the batch succeeded —
  a mid-batch failure leaves the sink exactly as before the attempt, so
  the retry re-processes cleanly instead of half-counting (mutating the
  seen-guard first would permanently drop the batch's docs on retry);
- within a batch, duplicate doc_ids are collapsed, and doc_ids seen in
  PRIOR batches are dropped (source-level at-least-once duplicates) —
  distinct docs with equal text still count separately, as real corpus
  repeats should.

State size honesty: the posting index is corpus-token-sized — it IS the
inverted window index a span-dedup deployment persists (same class as
the contamination n-gram index), not per-key streaming state; the count
and seen states are distinct-window- and doc-count-sized. Nothing ever
rides a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    apply_spans,
    merge_window_spans,
    positional_windows,
)


class IncrementalSpanDedupSink:
    """foreachBatch sink: feed micro-batches of (doc_id, text) rows via
    ``process_batch``; read the accumulated span report via ``result``.

    Durable mode (``state_root`` set): the window postings land as an
    APPEND-STRUCTURED versioned table (``tablefmt.commit_append`` —
    postings are append-only by construction, so each batch pays
    O(batch) write amplification and the manifest's directory list IS
    the tier structure the ephemeral mode maintains in memory), plus an
    O(docs) ``seen`` table for the source-duplicate guard. Counts are
    derived AT READ TIME from the postings table (one groupBy over the
    same data ``result`` must scan anyway), so a batch needs exactly
    two sub-commits. Each sub-commit carries the batch_id in its
    manifest and is independently skipped on retry; the seen commit
    goes LAST, so a crash between the two leaves a retry that
    recomputes the identical windows (the guard hasn't admitted the
    batch yet) and completes only the missing commit — exact-once per
    table, restart-safe from the manifests alone."""

    def __init__(
        self,
        k: int = 15,
        min_repeats: int = 2,
        state_root: str | None = None,
        auto_compact: int | None = 64,
    ):
        self.k = k
        self.min_repeats = min_repeats
        self.state_root = state_root
        self.auto_compact = auto_compact
        self._postings: list[tuple[int, DataFrame]] = []  # (level, frame) tiers
        self._counts: DataFrame | None = None  # (g, cnt)
        self._seen: DataFrame | None = None  # doc_id source-dup guard
        self._done_batch_ids: set[int] = set()
        self.batches_seen = 0
        if state_root is not None:
            import os

            from ..operators import tablefmt as TF

            self._postings_root = os.path.join(state_root, "postings")
            self._seen_root = os.path.join(state_root, "seen")
            self._postings_done = {
                m["app"]["batch_id"]
                for m in TF.history(self._postings_root)
                if "batch_id" in m.get("app", {})
            }
            self._seen_done = {
                m["app"]["batch_id"]
                for m in TF.history(self._seen_root)
                if "batch_id" in m.get("app", {})
            }
            # a batch is fully durable only when BOTH sub-commits landed
            self._done_batch_ids = self._postings_done & self._seen_done
            self.batches_seen = len(self._done_batch_ids)

    def _process_batch_durable(self, docs: DataFrame, batch_id: int) -> None:
        from ..operators import tablefmt as TF

        spark = docs.sparkSession
        if self._seen_done:
            seen = TF.read_version(spark, self._seen_root)
            docs = docs.join(seen, "doc_id", "left_anti")
        wins = positional_windows(docs, k=self.k).localCheckpoint(eager=True)
        if batch_id not in self._postings_done:
            TF.commit_append(
                wins, self._postings_root, app={"batch_id": batch_id}
            )
            self._postings_done.add(batch_id)
        # seen LAST: until it lands, a retry recomputes identical windows
        # (docs shorter than k emit none and re-seeing them is harmless)
        if batch_id not in self._seen_done:
            TF.commit_append(
                wins.select("doc_id").distinct(),
                self._seen_root,
                app={"batch_id": batch_id},
            )
            self._seen_done.add(batch_id)
        self._done_batch_ids.add(batch_id)
        self.batches_seen += 1
        # maintenance AFTER the batch's durability point: a compaction
        # failure loses nothing (the append log is the state; the next
        # batch retries the cadence), and old manifests keep the
        # batch_id ledger — maybe_compact never vacuums
        for r in (self._postings_root, self._seen_root):
            TF.maybe_compact(spark, r, self.auto_compact)

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        if batch_id in self._done_batch_ids:
            return  # foreachBatch retry of a fully-processed batch
        docs = docs.dropDuplicates(["doc_id"])
        if self.state_root is not None:
            self._process_batch_durable(docs, batch_id)
            return
        if self._seen is not None:
            docs = docs.join(self._seen, "doc_id", "left_anti")

        # --- all Spark jobs first; NO sink state is touched until every
        # one has succeeded, so a mid-batch failure retries cleanly ---
        wins = positional_windows(docs, k=self.k).localCheckpoint(eager=True)
        bc = wins.groupBy("g").agg(F.count("*").alias("cnt"))
        if self._counts is None:
            folded = bc
        else:
            folded = (
                self._counts.unionByName(bc)
                .groupBy("g")
                .agg(F.sum("cnt").alias("cnt"))
            )
        new_counts = folded.localCheckpoint(eager=True)
        # seen-ids derive from the WINDOWS frame (no second evaluation of
        # the batch); docs shorter than k emit no windows, so re-seeing
        # them later is harmless — they can never contribute counts
        ids = wins.select("doc_id").distinct()
        new_seen = (
            ids if self._seen is None else self._seen.unionByName(ids)
        ).localCheckpoint(eager=True)

        # --- commit (plain attribute writes; no Spark failure possible) ---
        self._postings.append((0, wins))
        self._counts = new_counts
        self._seen = new_seen
        self._done_batch_ids.add(batch_id)
        self.batches_seen += 1
        # LSM binary-counter compaction: merge equal-level tiers pairwise.
        # A level-L tier holds ~2^L batches, so a batch is re-merged only
        # when its tier promotes — O(log batches) times over the stream's
        # life — and the tier count (result()'s union width) stays
        # O(log batches). A single full-index re-checkpoint per window
        # would instead cost O(corpus) per compaction (quadratic total).
        # Non-destructive: the merge checkpoint is a Spark job and may
        # fail — build the merged tier FIRST, splice only on success, so
        # a compaction failure leaves every committed tier intact (the
        # pending merge simply retries on the next batch's loop).
        while (
            len(self._postings) >= 2
            and self._postings[-1][0] == self._postings[-2][0]
        ):
            lvl, a = self._postings[-1]
            _, b = self._postings[-2]
            merged = a.unionByName(b).localCheckpoint(eager=True)
            self._postings[-2:] = [(lvl + 1, merged)]

    def _union_postings(self) -> DataFrame:
        out = self._postings[0][1]
        for _, p in self._postings[1:]:
            out = out.unionByName(p)
        return out

    def result(self) -> DataFrame:
        if self.state_root is not None:
            from pyspark.sql import SparkSession

            from ..operators import tablefmt as TF

            if not self._done_batch_ids:
                raise RuntimeError("no batches processed yet")
            spark = SparkSession.getActiveSession()
            postings = TF.read_version(spark, self._postings_root)
            # counts derive at read time from the same postings scan the
            # report needs anyway — no separate count state to maintain
            hot = (
                postings.groupBy("g")
                .agg(F.count("*").alias("cnt"))
                .filter(F.col("cnt") >= self.min_repeats)
                .select("g")
            )
            return merge_window_spans(
                postings.join(hot, "g", "left_semi"), self.k
            )
        if not self._postings:
            raise RuntimeError("no batches processed yet")
        hot = (
            self._counts.filter(F.col("cnt") >= self.min_repeats).select("g")
        )
        return merge_window_spans(
            self._union_postings().join(hot, "g", "left_semi"), self.k
        )

    def trim(self, docs: DataFrame, text_col: str = "text") -> DataFrame:
        """Trim-on-read: excise the CURRENT corpus-repeated spans from
        ``docs`` (any doc set — typically the accumulated corpus, or one
        shard of it). Equals the batch ``trim_repeated_spans`` whenever
        the sink has ingested the same corpus (pinned by pytest), and
        strictly monotone as more batches arrive: frequencies only grow,
        so a span once reported never un-reports."""
        return apply_spans(docs, self.result(), text_col)
