"""Streaming continuous aggregate (incremental multi-resolution rollup).

The batch cascade (``operators/timeseries.multires_rollup``) recomputes
minute->hour->day from raw events; a telemetry deployment instead
maintains the MINUTE level incrementally as micro-batches arrive and
derives the coarser levels from it — TimescaleDB's continuous
aggregates, as a foreachBatch sink.

Per batch: the batch's rows are aggregated to partial minute buckets
(one map-side-combined shuffle over batch rows only), then merged into
the maintained minute state by re-aggregating on the same keys —
count/DECIMAL-sum/min/max are associative and commutative, so
merge(state, partial) == recompute-from-raw EXACTLY (no float drift),
for any batch split, including late events that reopen an old bucket.
State is localCheckpoint'ed per batch (linear plans); a deployment
persists it as a table bucketed on (key, bucket_ts) so the per-batch
merge join is exchange-free on the stored side — the same layout
argument as the modvalues state (operators/sink.write_bucketed_state).

``result()`` returns the identical (resolution, key, bucket, stats)
frame as the batch operator — equality for any batching is pinned by
tests/test_streaming.py, and the driver-checked
``q_t_incremental_rollup`` shares the batch entry's recompute-from-raw
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators import timeseries as TS


class IncrementalRollupSink:
    """foreachBatch sink: feed micro-batches of (key, ts, value) events
    via ``process_batch``; read the full multi-resolution rollup any
    time via ``result``.

    Durable mode (``state_root`` set): the minute state commits per
    micro-batch through ``tablefmt.commit_merge`` — one manifest-CAS
    commit per batch carrying the batch_id. The rollup merge is
    ADDITIVE (unlike the modvalues LWW reducer), so the
    manifest-recorded batch-id skip is load-bearing: re-merging a
    replayed batch would double every n_points/val_sum it touched. A
    restart reloads both the snapshot and the committed batch ids from
    the manifests alone; a crash mid-commit leaves no manifest, so the
    retry merges cleanly (single-commit atomicity)."""

    def __init__(
        self,
        key_col: str = "user_id",
        ts_col: str = "ts",
        val_col: str = "value",
        state_root: str | None = None,
    ):
        self.key_col = key_col
        self.ts_col = ts_col
        self.val_col = val_col
        self.state_root = state_root
        self.minute: DataFrame | None = None
        self.batches_seen = 0
        self._done_batch_ids: set[int] = set()
        if state_root is not None:
            from pyspark.sql import SparkSession

            from ..operators import tablefmt as TF

            if TF.latest_version(state_root) is not None:
                self.minute = TF.read_version(
                    SparkSession.getActiveSession(), state_root
                )
                self._done_batch_ids = {
                    m["app"]["batch_id"]
                    for m in TF.history(state_root)
                    if "batch_id" in m.get("app", {})
                }
                self.batches_seen = len(self._done_batch_ids)

    def process_batch(self, batch_events: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once: a committed batch can re-execute
        # with the same batch_id after a failure — merging it twice would
        # double every n_points/val_sum it touched (same guard as the
        # near-dup sink, pinned in tests/test_streaming.py)
        if batch_id in self._done_batch_ids:
            if self.state_root is not None:
                from ..operators import tablefmt as TF

                # the previous attempt may have crashed between its
                # commit and its snapshot refresh — re-read so result()
                # reflects the committed state (plan-only, no job)
                self.minute = TF.read_version(
                    batch_events.sparkSession, self.state_root
                )
            return
        partial = TS.rollup_minute(
            batch_events, self.key_col, self.ts_col, self.val_col
        )
        if self.state_root is not None:
            from ..operators import tablefmt as TF

            # eager: commit_merge may re-run the merge on a CAS rebase —
            # the batch's partial buckets must not be re-derived there
            partial = partial.localCheckpoint(eager=True)

            def merge(current: DataFrame | None) -> DataFrame:
                if current is None:
                    return partial
                return TS.rollup_up(
                    current.unionByName(partial), "minute", self.key_col
                )

            spark = batch_events.sparkSession
            try:
                TF.commit_merge(
                    spark, self.state_root, merge, app={"batch_id": batch_id}
                )
            except Exception:
                # the CAS may have landed before the raise (e.g. an OSError
                # on the advisory-pointer write) — consult the MANIFEST
                # ledger before letting an in-process foreachBatch retry
                # re-merge an already-committed additive batch, which
                # would double every n_points/val_sum it touched
                if not any(
                    m.get("app", {}).get("batch_id") == batch_id
                    for m in TF.history(self.state_root)
                ):
                    raise
            # record the commit BEFORE any post-commit work can raise:
            # the redelivery guard must survive a read_version failure
            self._done_batch_ids.add(batch_id)
            self.batches_seen += 1
            self.minute = TF.read_version(spark, self.state_root)
            return
        if self.minute is None:
            merged = partial
        else:
            # merge partial buckets into state: same-key re-aggregation
            # (rollup_up at minute grain IS the merge — associative stats)
            merged = TS.rollup_up(
                self.minute.unionByName(partial), "minute", self.key_col
            )
        self.minute = merged.localCheckpoint(eager=True)
        self.batches_seen += 1
        self._done_batch_ids.add(batch_id)

    def result(self) -> DataFrame:
        """The same (resolution, key, bucket_ts, n_points, val_sum,
        val_min, val_max) frame as ``multires_rollup`` over everything
        seen so far."""
        if self.minute is None:
            raise RuntimeError("no batches processed yet")
        return TS.rollup_cascade(self.minute, self.key_col)
