"""Edge-semantics tests for operators/timeseries.py: as-of tie/ordering
rules, sessionize gap boundary, range-join interval boundaries across
bucket edges."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from opcua_ingestion_engine_spark.operators import timeseries as TS


def _ts(s: float):
    return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def test_asof_join_tie_and_ordering(spark):
    left = _frame(spark, [(10, 1, _ts(100.0), 1.0), (11, 1, _ts(50.0), 2.0)])
    right = _frame(
        spark,
        [
            # two right rows at exactly left ts=100: larger event_id wins
            (1, 1, _ts(100.0), 10.0),
            (2, 1, _ts(100.0), 20.0),
            # earlier row is the only candidate for left ts=50
            (3, 1, _ts(40.0), 30.0),
            # future row must never match
            (4, 1, _ts(101.0), 40.0),
        ],
    )
    out = {
        r["event_id"]: r["view_value"]
        for r in TS.asof_join(
            left, right, key="user_id", left_ts="ts", right_ts="ts",
            payload={"view_value": "value"}, tiebreak="event_id",
        ).collect()
    }
    assert out[10] == 20.0  # inclusive <=, max tiebreak at equal ts
    assert out[11] == 30.0


def test_asof_join_no_prior_match_is_null(spark):
    left = _frame(spark, [(1, 1, _ts(10.0), 1.0)])
    right = _frame(spark, [(2, 1, _ts(11.0), 9.0), (3, 2, _ts(5.0), 8.0)])
    rows = TS.asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="ts",
        payload={"v": "value"}, tiebreak="event_id",
    ).collect()
    assert len(rows) == 1 and rows[0]["v"] is None


def test_asof_join_null_payload_field_is_atomic(spark):
    """The matched right row's payload is taken whole: a NULL field in the
    newest right row must be carried as NULL, not 'seen through' to an
    older row's non-NULL value (mixed-row output)."""
    left = _frame(spark, [(1, 1, _ts(100.0), 0.0)])
    right = spark.createDataFrame(
        [
            (11, 1, _ts(90.0), 7.0, "old"),     # older, fully populated
            (12, 1, _ts(95.0), None, "new"),    # newest match, NULL value
        ],
        "event_id long, user_id long, ts timestamp, value double, tag string",
    )
    rows = TS.asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="ts",
        payload={"v": "value", "tag": "tag"}, tiebreak="event_id",
    ).collect()
    assert len(rows) == 1
    # Both fields come from row 12: v is NULL (carried), tag is "new".
    assert rows[0]["v"] is None and rows[0]["tag"] == "new"


def test_range_join_degenerate_window_raises(spark):
    import pytest

    left = _frame(spark, [(1, 1, _ts(100.0), 0.0)])
    with pytest.raises(ValueError, match="non-degenerate"):
        TS.range_join_buckets(
            left, left, key="user_id", left_ts="ts", right_ts="ts",
            lower_s=0, upper_s=0,
        )


def test_connected_components_nonconvergence_raises(spark):
    import pytest

    from opcua_ingestion_engine_spark.operators.graph import connected_components

    # a 5-chain needs ~3 propagation rounds; max_iter=1 must fail loudly
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=1)


def test_sessionize_gap_boundary(spark):
    # gap exactly == gap_s stays in-session; one microsecond more splits
    df = _frame(
        spark,
        [
            (1, 1, _ts(0.0), 0.0),
            (2, 1, _ts(60.0), 0.0),        # +60s == gap -> same session
            (3, 1, _ts(120.000001), 0.0),  # +60.000001s -> new session
        ],
    )
    out = {
        r["event_id"]: r["session_id"]
        for r in TS.sessionize(df, "user_id", "ts", "event_id", gap_s=60).collect()
    }
    assert out == {1: 0, 2: 0, 3: 1}


def test_range_join_boundaries_span_buckets(spark):
    # window [-10s, 0): left at t=100 matches right in [90, 100)
    left = _frame(spark, [(1, 1, _ts(100.0), 0.0)])
    right = spark.createDataFrame(
        [
            (21, 1, _ts(89.999999), 1.0),  # below -> excluded
            (22, 1, _ts(90.0), 2.0),       # lower bound inclusive
            (23, 1, _ts(95.0), 3.0),       # bucket boundary interior
            (24, 1, _ts(99.999999), 4.0),  # just inside
            (25, 1, _ts(100.0), 5.0),      # upper bound exclusive
            (26, 2, _ts(95.0), 6.0),       # other key
        ],
        "event_id long, user_id long, err_ts timestamp, err_value double",
    )
    out = TS.range_join_buckets(
        left, right, key="user_id", left_ts="ts", right_ts="err_ts",
        lower_s=-10, upper_s=0,
    )
    got = sorted(r["err_value"] for r in out.collect())
    assert got == [2.0, 3.0, 4.0]


def test_connected_components_chain_and_islands(spark):
    from opcua_ingestion_engine_spark.operators.graph import connected_components

    pairs = spark.createDataFrame(
        [
            # chain 1-2-3-4 (diameter 3: exercises multiple rounds)
            (1, 2), (2, 3), (3, 4),
            # separate pair
            (10, 11),
            # triangle merging two labels
            (20, 21), (21, 22), (20, 22),
        ],
        "doc_a long, doc_b long",
    )
    out = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_approx_percentile_error_bound(spark):
    """approx_percentile(accuracy=10000) must land within 1/10000 rank
    error of the exact median — on l_quantity's 50 distinct values that
    means within one neighboring value."""
    from opcua_ingestion_engine_spark import catalog as C
    from tests.conftest import SF_CORRECT
    from pyspark.sql import functions as F

    l = C.load_table(spark, SF_CORRECT, "lineitem")
    got = {
        r["l_returnflag"]: (r["approx_median"], r["exact_median"])
        for r in l.groupBy("l_returnflag")
        .agg(
            F.approx_percentile("l_quantity", 0.5, 10000).alias("approx_median"),
            F.percentile("l_quantity", 0.5).alias("exact_median"),
        )
        .collect()
    }
    assert len(got) == 3
    for flag, (approx, exact) in got.items():
        assert abs(approx - exact) <= 1.0, (flag, approx, exact)


def test_connected_components_empty_input(spark):
    from opcua_ingestion_engine_spark.operators.graph import connected_components

    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(empty).count() == 0


def test_zscore_flat_line_then_spike_flagged(spark):
    """Zero-spread windows must flag a diverging value with z = +/-inf in
    BOTH the batch operator and the streaming state function — the
    engine-dependent silent miss (Spark NULL-on-div-by-zero vs IEEE inf)
    is exactly what the explicit branch removes."""
    import math

    from opcua_ingestion_engine_spark.operators import timeseries as TS
    from opcua_ingestion_engine_spark.streaming.anomaly import _score

    rows = [
        (i, 7, f"2024-01-01 00:0{i}:00", 5.0) for i in range(5)
    ] + [(5, 7, "2024-01-01 00:05:30", 100.0),
         (6, 7, "2024-01-01 00:06:00", -100.0)]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))

    out = {r["event_id"]: r["z"]
           for r in TS.rolling_zscore_anomalies(ev).collect()}
    assert out[5] == math.inf
    # event 6's window [5.0 x4, 100.0] has spread, finite z
    assert 5 in out and math.isfinite(out.get(6, 0.0))
    # constant rows themselves are never flagged
    assert all(eid not in out for eid in range(5))

    # streaming scorer: same branch
    assert _score(100.0, [5.0, 5.0, 5.0]) == math.inf
    assert _score(-100.0, [5.0, 5.0, 5.0]) == -math.inf
    assert math.isnan(_score(5.0, [5.0, 5.0, 5.0]))


def test_zscore_zero_spread_uses_quantized_envelope(spark):
    """Zero-spread semantics: (1) sub-quantum noise (inside the window's
    DECIMAL(38,6) min/max envelope) after a flat history is NOT an
    anomaly; (2) a real departure from a flat history flags +/-inf;
    (3) a large-offset near-flat history (var cancels to <= 0 in
    doubles) still flags a genuine spike outside the envelope."""
    from datetime import datetime

    from opcua_ingestion_engine_spark.operators import timeseries as TS

    def mk(rows):
        return spark.createDataFrame(
            [(1, i, datetime(2024, 1, 1, 0, 0, i), v)
             for i, v in enumerate(rows)],
            "user_id long, event_id long, ts timestamp, value double",
        )

    # flat 0.1s then noise at 1e-9 (quantizes to the same 0.100000)
    noisy = mk([0.1, 0.1, 0.1, 0.100000001])
    assert TS.rolling_zscore_anomalies(noisy).count() == 0

    # flat 0.1s then a real spike
    spike = mk([0.1, 0.1, 0.1, 9.0])
    out = TS.rolling_zscore_anomalies(spike).collect()
    assert len(out) == 1 and out[0]["z"] == float("inf")
    drop = mk([0.1, 0.1, 0.1, -9.0])
    out = TS.rolling_zscore_anomalies(drop).collect()
    assert len(out) == 1 and out[0]["z"] == float("-inf")

    # large offset, quantum-distinct values: var cancels to <= 0 in
    # doubles (ulp(1e12) ~ 1e-4 >> the 1e-6 spread) but the envelope
    # still classifies correctly: inside -> quiet, outside -> flagged
    base = 1_000_000_000_000.0
    inside = mk([base, base + 0.000002, base, base + 0.000001])
    assert TS.rolling_zscore_anomalies(inside).count() == 0
    outside = mk([base, base + 0.000002, base, base + 5.0])
    out = TS.rolling_zscore_anomalies(outside).collect()
    assert len(out) == 1 and out[0]["z"] == float("inf")
