"""Streaming rolling z-score anomaly detection (stateful form of
``operators/timeseries.rolling_zscore_anomalies``).

``applyInPandasWithState`` keyed by entity: state = the last
``lookback`` values in arrival order (O(lookback) doubles per key —
bounded, like every state table here). Each row is scored against the
preceding window exactly as the batch operator scores it: the mean and
sample variance come from DECIMAL-exact sums of the quantized values
(quantize = the HALF_UP 6-decimal rounding Spark's ``cast(double as
decimal(38,6))`` performs, reproduced with ``decimal.Decimal`` so the
streaming scores match the batch plan bit-for-bit), and the z
arithmetic runs in ordinary doubles over those exact sums.

Ordering contract: rows are sorted by (ts, tiebreak) WITHIN each
micro-batch, and batch boundaries must not reorder the batch window's
(ts, tiebreak) total order across batches — strictly increasing ts
between consecutive batches of one key, or equivalently equal-ts ties
never straddling a batch boundary (true for replay split by time and
for any watermarked, sorted feed). Non-decreasing ts alone is NOT
enough: a tie split across batches would be scored before its
lower-tiebreak sibling is seen, diverging from the batch window.
Batch-split parity is pinned by tests/test_streaming.py.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_Q6 = Decimal("0.000001")

ZSCORE_OUTPUT_SCHEMA = (
    "user_id long, event_id long, ts_us long, value double, z double"
)
ZSCORE_STATE_SCHEMA = "vals array<double>"


def _q(v: float) -> Decimal:
    """Spark's cast(double AS decimal(38,6)): Java's BigDecimal.valueOf
    goes through Double.toString — the SHORTEST round-trip decimal
    representation — then HALF_UP to 6 decimals. Python's repr(float)
    is the same shortest-round-trip algorithm, so Decimal(repr(v))
    reproduces it; Decimal(v) (the exact binary expansion) would round
    values like 1.0000005 (stored as 1.00000049999...) the other way."""
    return Decimal(repr(v)).quantize(_Q6, rounding=ROUND_HALF_UP)


def _score(v: float, window: list[float]) -> float | None:
    """Batch-identical z: DECIMAL-exact s1/s2 over the window, double
    arithmetic after. Returns None when the window can't estimate
    spread (fewer than 2 points). Zero-spread windows branch on the
    window's quantized min/max ENVELOPE, exactly like the batch
    operator: values outside it are +/-Infinity, sub-quantum noise
    inside it is not an anomaly (NaN -> unflagged)."""
    n = len(window)
    if n < 2:
        return None
    qs = [_q(x) for x in window]
    s1 = float(sum(qs))
    s2 = float(sum((q * q).quantize(_Q6, rounding=ROUND_HALF_UP) for q in qs))
    nd = float(n)
    mean = s1 / nd
    var = (s2 - s1 * s1 / nd) / (nd - 1.0)
    s = math.sqrt(var) if var > 0 else 0.0
    if s == 0.0:
        qv = _q(v)
        if qv > max(qs):
            return math.inf
        if qv < min(qs):
            return -math.inf
        return float("nan")
    return (v - mean) / s


def _make_zscore_fn(lookback: int, z_thresh: float):
    def _fn(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        window: list[float] = list(state.get[0]) if state.exists else []
        rows: list[tuple[int, int, float]] = []
        for pdf in pdfs:
            ser = pdf["ts"]
            if getattr(ser.dtype, "tz", None) is not None:
                ser = ser.dt.tz_convert("UTC").dt.tz_localize(None)
            ts_us = ser.astype("datetime64[us]").astype("int64").to_numpy()
            rows.extend(
                zip(ts_us.tolist(),
                    pdf["event_id"].to_numpy().tolist(),
                    pdf["value"].to_numpy().tolist())
            )
        rows.sort()  # (ts_us, event_id) — the batch window's ORDER BY
        out = {"user_id": [], "event_id": [], "ts_us": [], "value": [], "z": []}
        for t, eid, v in rows:
            z = _score(v, window)
            if z is not None and not math.isnan(z) and abs(z) > z_thresh:
                out["user_id"].append(uid)
                out["event_id"].append(eid)
                out["ts_us"].append(t)
                out["value"].append(v)
                out["z"].append(z)
            window.append(v)
            if len(window) > lookback:
                window.pop(0)
        state.update((window,))
        yield pd.DataFrame(out)

    return _fn


def zscore_stream(
    events_stream: DataFrame,
    lookback: int = 20,
    z_thresh: float = 3.0,
) -> DataFrame:
    """Stateful streaming form of the rolling z-score detector over a
    (user_id, event_id, ts, value) stream. No timeout semantics — the
    state is a pure sliding window, evicted by count."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _make_zscore_fn(lookback, z_thresh),
        ZSCORE_OUTPUT_SCHEMA,
        ZSCORE_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
