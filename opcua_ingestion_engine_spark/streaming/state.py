"""Stateful liveness, heartbeat and watchdog (SURVEY.md §2.8 T3/T4, §2.4 A3).

Reference behaviors reproduced:

- **T4 server/device watchdog**: a device with no update for the timeout
  window flips offline. Reference: per-server one-shot 3-minute timers
  (``OpcSubscribeService.cs:42,809-847``). Spark: ``applyInPandasWithState``
  keyed by device with a processing-time timeout — the state holds the
  last event (ts, event_id, status); a timeout firing emits online=0.
- **T3 heartbeat**: every 60 s, refresh ``last_updated`` for every measure
  of currently-online devices (``:293-393``; one bulk UPDATE ``:352-363``).
  Spark: a bulk conditional projection against the state snapshot —
  set-based, no per-row loop, no shuffle.

The deterministic parts (update-driven online/offline transitions,
heartbeat rewrite) are pinned by tests; the wall-clock timeout path is
exercised as a smoke test only (timeouts can't fire deterministically in
an availableNow replay — SURVEY.md §7 risk 5's weaker-check caveat).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LIVENESS_OUTPUT_SCHEMA = (
    "daq_name string, online double, last_ts_us bigint, last_status bigint, "
    "reason string"
)
LIVENESS_STATE_SCHEMA = "last_ts_us bigint, last_eid bigint, last_status bigint"

WATCHDOG_TIMEOUT_MS = 3 * 60 * 1000  # OpcSubscribeService.cs:42 (3 min)


def _make_liveness_fn(timeout_ms: int):
    """Per-device last-write-wins state transition. Good latest event ->
    online 1.0; bad latest event or watchdog timeout -> 0.0
    (OpcSubscribeService.cs:578-589, 980-997). Factory so the watchdog
    window ships to the workers as a plain closure constant."""

    def _liveness_fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (daq_name,) = key
        if state.hasTimedOut:
            last_ts, last_eid, last_status = (
                state.get if state.exists else (0, 0, 0)
            )
            # one-shot like the reference watchdog (AutoReset=false): no
            # new timeout is armed, so a silent device emits 0 exactly
            # once — and the state is REMOVED: its useful work is done,
            # and keeping it would grow the state store without bound
            # under device churn (a returning device simply rebuilds from
            # its next update)
            state.remove()
            yield pd.DataFrame(
                {
                    "daq_name": [daq_name],
                    "online": [0.0],
                    "last_ts_us": [last_ts],
                    "last_status": [last_status],
                    "reason": ["timeout"],
                }
            )
            return

        best = state.get if state.exists else None
        for pdf in pdfs:
            # unit/tz-safe: Arrow may hand back datetime64[ns] or [us],
            # naive (session-tz wall clock) or tz-aware
            ser = pdf["received_ts"]
            if getattr(ser.dtype, "tz", None) is not None:
                ser = ser.dt.tz_convert("UTC").dt.tz_localize(None)
            ts_us = ser.astype("datetime64[us]").astype("int64").to_numpy()
            for t, eid, status in zip(
                ts_us, pdf["event_id"].to_numpy(), pdf["status_code"].to_numpy()
            ):
                cand = (int(t), int(eid), int(status))
                if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                    best = cand
        if best is not None:
            state.update(best)
            state.setTimeoutDuration(timeout_ms)
            yield pd.DataFrame(
                {
                    "daq_name": [daq_name],
                    "online": [1.0 if best[2] == 0 else 0.0],
                    "last_ts_us": [best[0]],
                    "last_status": [best[2]],
                    "reason": ["update"],
                }
            )

    return _liveness_fn


def liveness_stream(
    updates_stream: DataFrame, timeout_ms: int = WATCHDOG_TIMEOUT_MS
) -> DataFrame:
    """T4/A3 — stateful per-device liveness over a streaming updates frame.

    ``applyInPandasWithState`` keyed by device: state = last (ts, eid,
    status); each micro-batch emits the device's current online flag;
    a processing-time timeout (default 3 min, OpcSubscribeService.cs:42)
    emits the offline mark when a device goes silent (the server watchdog
    analogue).

    Output rows carry ``reason`` = 'update' (data-driven transition) or
    'timeout' (watchdog firing).

    NOTE: run the sink with ``outputMode("update")`` and stop the query
    explicitly after polling its output. With ProcessingTimeTimeout the
    engine always schedules another state-cleanup batch
    (``shouldRunAnotherBatch`` is unconditionally true), so an
    ``availableNow`` query never terminates AND ``processAllAvailable``
    never observes quiescence — both block forever.
    """
    return updates_stream.groupBy("daq_name").applyInPandasWithState(
        _make_liveness_fn(timeout_ms),
        LIVENESS_OUTPUT_SCHEMA,
        LIVENESS_STATE_SCHEMA,
        "update",
        GroupStateTimeout.ProcessingTimeTimeout,
    )


def heartbeat_refresh(
    snapshot: DataFrame, online_devices: DataFrame, now_text: str
) -> DataFrame:
    """T3 — the 60 s heartbeat: one bulk conditional rewrite stamping
    ``last_updated = now`` on EVERY measure row of currently-online
    devices (OpcSubscribeService.cs:301-383; heartbeat batches all devices
    in one UPDATE ... ANY(@devices), :352-363).

    ``online_devices``: single-column (device) frame — broadcast semi-join
    (J7's lock set), then a projection; no shuffle of the snapshot.
    """
    # distinct: the natural input (liveness output accumulated across
    # micro-batches) can list a device more than once, and a non-unique
    # broadcast side would fan out every snapshot row of that device
    marked = snapshot.join(
        F.broadcast(
            online_devices.select("device").distinct().withColumn("_hb", F.lit(1))
        ),
        "device",
        "left",
    )
    return marked.withColumn(
        "last_updated",
        F.when(F.col("_hb").isNotNull(), F.lit(now_text)).otherwise(
            F.col("last_updated")
        ),
    ).drop("_hb")


# ---------------------------------------------------------------------------
# transformWithState variant (Spark 4 forward API) — same semantics as
# liveness_stream, expressed with explicit value state + one-shot timers.
# ---------------------------------------------------------------------------

def _ts_us_series(ser: pd.Series) -> pd.Series:
    """unit/tz-safe received_ts -> int64 µs (Arrow may hand back
    datetime64[ns] or [us], naive or tz-aware)."""
    if getattr(ser.dtype, "tz", None) is not None:
        ser = ser.dt.tz_convert("UTC").dt.tz_localize(None)
    return ser.astype("datetime64[us]").astype("int64")


def make_liveness_processor(timeout_ms: int = WATCHDOG_TIMEOUT_MS):
    """Factory for the TransformWithState liveness processor. Semantics
    identical to ``liveness_stream`` (LWW last-event state; watchdog
    timer emits the one-shot offline mark); the forward API adds explicit
    state variables and timer management (registerTimer/deleteTimer) in
    place of GroupState's single timeout slot."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class LivenessProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._best = handle.getValueState("best", LIVENESS_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (daq_name,) = key
            best = tuple(self._best.get()) if self._best.exists() else None
            for pdf in rows:
                ts_us = _ts_us_series(pdf["received_ts"]).to_numpy()
                for t, eid, status in zip(
                    ts_us,
                    pdf["event_id"].to_numpy(),
                    pdf["status_code"].to_numpy(),
                ):
                    cand = (int(t), int(eid), int(status))
                    if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                        best = cand
            if best is None:
                return
            self._best.update(best)
            # re-arm the one-shot watchdog: exactly one pending timer
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + timeout_ms
            )
            yield pd.DataFrame(
                {
                    "daq_name": [daq_name],
                    "online": [1.0 if best[2] == 0 else 0.0],
                    "last_ts_us": [best[0]],
                    "last_status": [best[2]],
                    "reason": ["update"],
                }
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            (daq_name,) = key
            last = tuple(self._best.get()) if self._best.exists() else (0, 0, 0)
            # same one-shot + reclaim semantics as the applyInPandas form
            self._best.clear()
            yield pd.DataFrame(
                {
                    "daq_name": [daq_name],
                    "online": [0.0],
                    "last_ts_us": [last[0]],
                    "last_status": [last[2]],
                    "reason": ["timeout"],
                }
            )

        def close(self) -> None:
            pass

    return LivenessProcessor()


def liveness_stream_tws(
    updates_stream: DataFrame, timeout_ms: int = WATCHDOG_TIMEOUT_MS
) -> DataFrame:
    """T4/A3 on the Spark 4 ``transformWithStateInPandas`` API — drop-in
    alternative to ``liveness_stream`` (same output schema and semantics);
    parity pinned by test_liveness_tws_matches_applyinpandas.

    Runtime requirements beyond ``liveness_stream``: the RocksDB state
    store provider (``spark.sql.streaming.stateStore.providerClass``)
    and the ``protobuf`` Python package (the TWS state-server protocol —
    absent in some minimal images, in which case the query fails at plan
    time with STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE and callers
    should stay on ``liveness_stream``)."""
    return updates_stream.groupBy("daq_name").transformWithStateInPandas(
        statefulProcessor=make_liveness_processor(timeout_ms),
        outputStructType=LIVENESS_OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="ProcessingTime",
    )
