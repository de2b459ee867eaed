"""Streaming-incremental heavy hitters (E4, streaming form).

Corpus-level frequent-token tracking over a document stream: the batch
operator (``operators/text.frequent_tokens``) sketches then verifies in
two corpus passes; this sink keeps the Misra-Gries summary ACROSS
micro-batches so per-batch work is O(batch), and runs the exact verify
only when a result is requested.

- Per batch: the batch's per-partition MG summaries are computed with
  the same vectorized kernel as the batch operator, collected (bounded:
  <= capacity x partitions candidate rows — config-sized), and merged
  into the driver-held global summary with the standard mergeable-
  summaries trim (combine counters, subtract the (capacity+1)-th
  largest, drop non-positives). Merging MG summaries preserves the
  guarantee: any token with global frequency > N/capacity stays
  positive in the merged summary (Agarwal et al., "Mergeable
  Summaries"). Documents are also accumulated append-only
  (localCheckpoint'ed linear plans — in deployment this is simply the
  corpus table the stream is writing anyway).
- On ``result(min_frac)``: exact recount of the merged summary's
  candidates over the accumulated corpus — identical phase-2 shape to
  the batch operator, so the output EQUALS the batch answer on the same
  data regardless of how the stream was batched (pinned by
  tests/test_streaming.py).

The driver-held summary is O(capacity) entries — the same "config-sized
driver state" budget as the IVF/PQ codebooks; nothing corpus-sized ever
reaches the driver.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.text import exact_token_counts, mg_summary, mg_trim, tokens


class IncrementalHeavyHittersSink:
    """foreachBatch sink: feed micro-batches of (doc_id, text) rows via
    ``process_batch``; ask for the exact heavy-hitter set any time via
    ``result``."""

    def __init__(
        self,
        capacity: int = 1000,
        text_col: str = "text",
        state_root: str | None = None,
        auto_compact: int | None = 64,
    ):
        self.capacity = capacity
        self.text_col = text_col
        self.state_root = state_root
        self.auto_compact = auto_compact
        self.sketch: Counter = Counter()
        self.docs: DataFrame | None = None
        self.batches_seen = 0
        self._done_batch_ids: set[int] = set()
        if state_root is not None:
            import os

            from pyspark.sql import SparkSession

            from ..operators import tablefmt as TF

            # durable mode: docs are an append-structured table, the
            # O(capacity) sketch its own (tiny) rewrite table. Restart
            # reloads both plus the committed batch ids; a batch is
            # fully durable only when BOTH sub-commits landed (docs
            # FIRST, sketch LAST — on a crash between them the retry
            # re-merges the batch counts into the OLD persisted sketch,
            # which is the correct base, and skips the docs append).
            self._docs_root = os.path.join(state_root, "docs")
            self._sketch_root = os.path.join(state_root, "sketch")
            self._docs_done = {
                m["app"]["batch_id"]
                for m in TF.history(self._docs_root)
                if "batch_id" in m.get("app", {})
            }
            self._sketch_done = {
                m["app"]["batch_id"]
                for m in TF.history(self._sketch_root)
                if "batch_id" in m.get("app", {})
            }
            self._done_batch_ids = self._docs_done & self._sketch_done
            self.batches_seen = len(self._done_batch_ids)
            spark = SparkSession.getActiveSession()
            if TF.latest_version(self._docs_root) is not None:
                self.docs = TF.read_version(spark, self._docs_root)
            if TF.latest_version(self._sketch_root) is not None:
                self.sketch = Counter({
                    r["token"]: r["cnt"]
                    for r in TF.read_version(
                        spark, self._sketch_root
                    ).collect()
                })

    def process_batch(self, batch_docs: DataFrame, batch_id: int) -> None:
        # at-least-once redelivery guard: re-merging a committed batch
        # would double-count the sketch AND double-append the corpus
        # (same discipline as the near-dup and rollup sinks)
        if batch_id in self._done_batch_ids:
            return
        cap = self.capacity
        text_col = self.text_col

        def mg_partition(batches):
            sk = mg_summary(batches, cap, "_toks")
            yield pd.DataFrame(
                {"token": list(sk.keys()), "cnt": list(sk.values())}
            )

        part_rows = (
            batch_docs.select(tokens(F.col(text_col)).alias("_toks"))
            .mapInPandas(mg_partition, "token string, cnt long")
            .collect()  # bounded: <= capacity x partitions rows
        )
        merged = Counter(self.sketch)
        for r in part_rows:
            merged[r["token"]] += r["cnt"]

        batch_state = batch_docs.select("doc_id", text_col)

        if self.state_root is not None:
            from ..operators import tablefmt as TF

            spark = batch_docs.sparkSession
            if batch_id not in self._docs_done:
                TF.commit_append(
                    batch_state, self._docs_root, app={"batch_id": batch_id}
                )
                self._docs_done.add(batch_id)
            # sketch LAST: its commit is the batch's durability point —
            # a crash between the two retries by re-merging the batch
            # counts into the OLD persisted sketch (the correct base)
            # and skipping the already-landed docs append.
            # commit_merge, NOT commit_version: a CAS loss must rebase
            # the BATCH's counts onto the racing writer's committed
            # sketch — re-committing this writer's in-memory merge
            # would silently erase the racer's counts (MG summaries
            # merge by count addition + trim, Agarwal et al., so the
            # superset guarantee survives the rebase)
            if batch_id not in self._sketch_done:
                batch_counts: Counter = Counter()
                for r in part_rows:
                    batch_counts[r["token"]] += r["cnt"]
                cap_ = self.capacity

                def merge_sketch(current: DataFrame | None) -> DataFrame:
                    base: Counter = (
                        Counter()
                        if current is None
                        else Counter(
                            {
                                r["token"]: r["cnt"]
                                for r in current.collect()  # O(capacity)
                            }
                        )
                    )
                    base.update(batch_counts)
                    return spark.createDataFrame(
                        sorted(mg_trim(base, cap_).items()),
                        "token string, cnt long",
                    )

                TF.commit_merge(
                    spark, self._sketch_root, merge_sketch,
                    app={"batch_id": batch_id},
                )
                self._sketch_done.add(batch_id)
            # serve from the COMMITTED sketch (under concurrency the
            # table may carry a racer's counts this writer never saw)
            self.sketch = Counter({
                r["token"]: r["cnt"]
                for r in TF.read_version(spark, self._sketch_root).collect()
            })
            self.batches_seen += 1
            self._done_batch_ids.add(batch_id)
            # maintenance after the durability point (docs only — the
            # sketch table is a rewrite, always one dir); never vacuums,
            # so the manifests' batch_id ledger survives for recovery
            TF.maybe_compact(spark, self._docs_root, self.auto_compact)
            self.docs = TF.read_version(spark, self._docs_root)
            return

        # all Spark jobs BEFORE any state mutation: if the corpus-state
        # checkpoint failed after the sketch were already assigned, the
        # foreachBatch retry would re-merge the batch's counts into the
        # updated sketch and double-count (same retry-atomicity
        # discipline as the spans and corpus-build sinks)
        new_docs = (
            batch_state
            if self.docs is None
            else self.docs.unionByName(batch_state)
        ).localCheckpoint(eager=True)

        # commit — plain attribute writes; no Spark failure possible here
        self.sketch = mg_trim(merged, self.capacity)
        self.docs = new_docs
        self.batches_seen += 1
        self._done_batch_ids.add(batch_id)

    def result(self, min_frac: float) -> DataFrame:
        """Exact (token, cnt) for every token above ``min_frac`` of all
        tokens seen so far. Requires capacity >= 1/min_frac for the
        superset guarantee (same bound as the batch operator)."""
        if self.docs is None:
            raise RuntimeError("no batches processed yet")
        if self.capacity < 1.0 / min_frac:
            raise ValueError(
                f"capacity {self.capacity} below 1/min_frac "
                f"({1.0 / min_frac:.0f}) — superset guarantee would not hold"
            )
        spark = self.docs.sparkSession
        cands = spark.createDataFrame(
            [(t,) for t in self.sketch], "token string"
        )
        return exact_token_counts(self.docs, cands, min_frac, self.text_col)
