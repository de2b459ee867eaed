"""Streaming-incremental corpus build (E8 capstone, streaming form).

The batch capstone (``plans/datapipe_ops.q_e8_corpus_build``) runs
exact dedup -> quality gates -> benchmark decontamination -> split over
the whole corpus in one plan; this sink maintains the SAME training
manifest across micro-batches — the shape a continuously-ingesting
pretraining pipeline actually runs:

- The benchmark gram set is built ONCE at construction from the static
  eval suite. Decontaminating against a moving benchmark would force
  retroactive retraction of already-admitted documents; real pipelines
  pin the eval suites, so the sink does too.
- Per batch: within-batch exact dedup keeps the min doc_id per sha256
  digest; cross-batch dedup anti-joins the digest STATE (32-byte
  digests only — the content-addressed manifest a deployment keeps
  anyway, never document text); then the identical quality gates, gram
  semi-join against the pinned benchmark grams, and split filter as the
  batch operator. Per-batch work is O(batch).
- Digest state and the manifest grow append-only through
  ``localCheckpoint`` (linear plans, no lineage blowup — same
  discipline as the incremental heavy-hitters sink).

Dedup keeps the FIRST-SEEN copy across batches. When batches arrive in
doc_id order (deployment: monotonically increasing ids), first-seen ==
min-id and the final manifest EQUALS the batch answer row for row —
pinned by the shared DuckDB oracle on the registered query and by
tests/test_streaming.py under different batchings.

Durable mode (``state_root`` set): both state frames are append-only by
construction, so each lands as an append-structured versioned table
(``tablefmt.commit_append`` — O(batch) write amplification): the
training ``manifest`` (doc_id, source, n_tokens) and the content
``digests`` (the 32-byte sha256 manifest a deployment keeps anyway).
Each sub-commit carries the batch_id in its manifest and is
independently skipped on retry; the digest commit goes LAST because the
digest table is the cross-batch dedup GUARD — until it lands, a retry's
anti-join recomputes the IDENTICAL fresh set (admission is a pure
function of the batch text), skips the already-landed manifest append,
and completes only the missing digest commit. Exact-once per table,
restart-recoverable from the manifests alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..operators.datapipe import _bucket_hex, frac_hex
from ..operators.text import quality_filter, word_ngrams


class IncrementalCorpusBuildSink:
    """foreachBatch sink: feed micro-batches of (doc_id, text, source)
    rows via ``process_batch``; read the accumulated training manifest
    via ``result``."""

    def __init__(
        self,
        bench_docs: DataFrame,
        n: int = 8,
        bench_mod: int = 97,
        train: float = 0.8,
        salt: str = "split-v1",
        state_root: str | None = None,
        auto_compact: int | None = 64,
    ):
        self.auto_compact = auto_compact
        self.bench_mod = bench_mod
        self.train_thresh = frac_hex(train)
        self.salt = salt
        self.state_root = state_root
        self.grams = F.array_distinct(word_ngrams(F.col("text"), n))
        self.bench = (
            bench_docs.select(F.explode(self.grams).alias("g"))
            .distinct()
            .withColumn("_hit", F.lit(True))
            .localCheckpoint(eager=True)
        )
        self.digests: DataFrame | None = None
        self.manifest: DataFrame | None = None
        self._done_batch_ids: set[int] = set()
        self.batches_seen = 0
        if state_root is not None:
            import os

            from ..operators import tablefmt as TF

            self._roots = {
                k: os.path.join(state_root, k)
                for k in ("manifest", "digests")
            }
            self._sub_done = {
                k: {
                    m["app"]["batch_id"]
                    for m in TF.history(r)
                    if "batch_id" in m.get("app", {})
                }
                for k, r in self._roots.items()
            }
            # a batch is fully durable only when BOTH sub-commits landed
            self._done_batch_ids = (
                self._sub_done["manifest"] & self._sub_done["digests"]
            )
            self.batches_seen = len(self._done_batch_ids)

    def _admit(self, fresh: DataFrame) -> DataFrame:
        """The per-batch admission plan on the cross-batch-deduped docs:
        quality gates -> benchmark-gram decontamination -> split filter.
        A pure function of the batch text, so a durable-mode retry that
        recomputes ``fresh`` identically also recomputes the identical
        manifest increment."""
        cand = quality_filter(
            fresh.drop("_dig"), extra=("text", "source")
        ).filter(F.col("doc_id") % self.bench_mod != 0)
        flags = (
            cand.select(
                "doc_id", "source", "n_tokens",
                F.explode(self.grams).alias("g"),
            )
            .join(self.bench, "g", "left")
            .groupBy("doc_id", "source", "n_tokens")
            .agg(
                F.coalesce(F.bool_or("_hit"), F.lit(False)).alias("_contam")
            )
        )
        return (
            flags.filter(~F.col("_contam"))
            .filter(_bucket_hex(F.col("doc_id"), self.salt)
                    < F.lit(self.train_thresh))
            .select("doc_id", "source", "n_tokens")
        )

    def _process_batch_durable(self, dd: DataFrame, batch_id: int) -> None:
        from ..operators import tablefmt as TF

        spark = dd.sparkSession
        # the dedup guard is the digest TABLE, not this process's memory:
        # a retry after a crash between the two sub-commits reads a table
        # that does not yet contain the batch, so ``fresh`` recomputes
        # identically and the already-landed manifest append is skipped
        # by its batch_id guard
        if TF.latest_version(self._roots["digests"]) is not None:
            digs = TF.read_version(spark, self._roots["digests"])
            fresh = dd.join(digs, "_dig", "left_anti")
        else:
            fresh = dd
        fresh = fresh.localCheckpoint(eager=True)
        if batch_id not in self._sub_done["manifest"]:
            TF.commit_append(
                self._admit(fresh),
                self._roots["manifest"],
                app={"batch_id": batch_id},
            )
            self._sub_done["manifest"].add(batch_id)
        # digests LAST: until the guard admits the batch, a retry
        # recomputes the identical increments from the table state alone
        if batch_id not in self._sub_done["digests"]:
            TF.commit_append(
                fresh.select("_dig"),
                self._roots["digests"],
                app={"batch_id": batch_id},
            )
            self._sub_done["digests"].add(batch_id)
        self._done_batch_ids.add(batch_id)
        self.batches_seen += 1
        # maintenance after the durability point; never vacuums, so the
        # manifests' batch_id ledger survives for restart recovery
        for r in self._roots.values():
            TF.maybe_compact(spark, r, self.auto_compact)

    def process_batch(self, batch_docs: DataFrame, batch_id: int) -> None:
        # at-least-once redelivery guard: the digest state already makes a
        # replayed batch admit nothing new, but the append-only manifest
        # would still duplicate its rows — skip committed batch_ids like
        # the sibling sinks
        if batch_id in self._done_batch_ids:
            return
        hashed = batch_docs.withColumn("_dig", F.sha2(F.col("text"), 256))
        w = W.partitionBy("_dig").orderBy("doc_id")
        dd = (
            hashed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        if self.state_root is not None:
            self._process_batch_durable(dd, batch_id)
            return
        # ONE evaluation of the dedup window for both downstream uses,
        # and — critically — NO sink state is touched until every Spark
        # job for the batch has succeeded: if the digest state were
        # assigned before the manifest job and that job failed, the
        # foreachBatch retry's anti-join would see the batch's digests
        # already present and permanently drop its documents from the
        # manifest (same retry-atomicity discipline as streaming/spans.py)
        fresh = (
            dd.join(self.digests, "_dig", "left_anti")
            if self.digests is not None
            else dd
        ).localCheckpoint(eager=True)
        # digest state includes BENCHMARK docs too (batch semantics: a
        # non-bench copy of a benchmark text is an exact dup and drops)
        new_digs = fresh.select("_dig")
        new_digests = (
            new_digs
            if self.digests is None
            else self.digests.unionByName(new_digs)
        ).localCheckpoint(eager=True)

        clean = self._admit(fresh)
        new_manifest = (
            clean
            if self.manifest is None
            else self.manifest.unionByName(clean)
        ).localCheckpoint(eager=True)

        # commit — plain attribute writes; no Spark failure possible here
        self.digests = new_digests
        self.manifest = new_manifest
        self._done_batch_ids.add(batch_id)
        self.batches_seen += 1

    def result(self) -> DataFrame:
        if self.state_root is not None:
            from pyspark.sql import SparkSession

            from ..operators import tablefmt as TF

            if TF.latest_version(self._roots["manifest"]) is None:
                raise RuntimeError("no batches processed yet")
            spark = SparkSession.getActiveSession()
            return TF.read_version(spark, self._roots["manifest"])
        assert self.manifest is not None, "no batches processed"
        return self.manifest
