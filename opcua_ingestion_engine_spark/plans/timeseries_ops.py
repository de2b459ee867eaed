"""[EXT] time-series relational queries over the ``events`` fixture:
as-of join, gap sessionization, bucketed range join, plus the remaining
window-function inventory (ntile/percent_rank/cume_dist/first_value) and
pivot / grouping-sets aggregates.

These are the temporal operators a telemetry engine needs beyond the
reference's staleness filter + LWW state (SURVEY.md §2.5/§2.11); the
implementations live in ``operators/timeseries.py`` and are all
single-shuffle, pair-free plans (see that module's docstring for the
100 TB rationale).

Float-parity rule as elsewhere: sums go through DECIMAL(38,6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .. import catalog as C
from ..operators import timeseries as TS
from .registry import register

DEC = "decimal(38,6)"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.load_table(spark, sf_dir, "events")


@register(
    "q_asof_join_purchase_view",
    """
    WITH v AS (
        SELECT user_id, ts, value, event_id,
               row_number() OVER (PARTITION BY user_id, ts
                                  ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'view'
    ),
    vd AS (SELECT user_id, ts, value FROM v WHERE rn = 1),
    p AS (SELECT event_id, user_id, ts, value FROM events
          WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, p.value,
           strftime(vd.ts, '%Y-%m-%d %H:%M:%S.%f') AS view_ts, vd.value AS view_value
    FROM p ASOF LEFT JOIN vd
      ON p.user_id = vd.user_id AND vd.ts <= p.ts
    """,
    "[EXT] backward as-of join: each purchase paired with the user's most "
    "recent prior view (inclusive); union+window, one shuffle, no pair "
    "materialization (operators/timeseries.asof_join)",
)
def q_asof_join_purchase_view(spark, sf_dir):
    ev = _events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", "value"
    )
    out = TS.asof_join(
        p,
        v,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        payload={"view_ts": "ts", "view_value": "value"},
        tiebreak="event_id",
    )
    # timestamps formatted to strings: Spark's pandas bridge yields
    # ns-resolution, DuckDB µs — identical instants, unequal dtypes
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", fmt).alias("ts"),
        "value",
        F.date_format("view_ts", fmt).alias("view_ts"),
        "view_value",
    )


@register(
    "q_w_sessionize",
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            > 1800 * 1000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id, ts,
               CAST(sum(new_sess) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) - 1
                    AS BIGINT) AS session_id
        FROM flagged
    )
    SELECT user_id, session_id, count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
           CAST((epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0
                AS DOUBLE) AS duration_s
    FROM sess GROUP BY user_id, session_id
    """,
    "[EXT] gap sessionization (30 min) + per-session rollup; lag + running "
    "sum fused into one per-key sort (operators/timeseries.sessionize)",
)
def q_w_sessionize(spark, sf_dir):
    ev = _events(spark, sf_dir).select("user_id", "ts", "event_id")
    sess = TS.sessionize(ev, key="user_id", ts="ts", tiebreak="event_id", gap_s=1800)
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.date_format(F.min("ts"), fmt).alias("session_start"),
        F.date_format(F.max("ts"), fmt).alias("session_end"),
        (
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))) / 1_000_000.0
        ).alias("duration_s"),
    )


@register(
    "q_range_join_purchase_errors",
    """
    SELECT p.event_id, p.user_id,
           count(*) AS n_errors,
           CAST(sum(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE) AS err_value_sum
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON e.user_id = p.user_id
     AND epoch_us(e.ts) >= epoch_us(p.ts) - 300 * 1000000
     AND epoch_us(e.ts) <  epoch_us(p.ts)
    GROUP BY p.event_id, p.user_id
    """,
    "[EXT] range join: errors in the 5 minutes before each purchase "
    "(same user), bucketed equi-join + exact refinement "
    "(operators/timeseries.range_join_buckets) — never a nested loop",
)
def q_range_join_purchase_errors(spark, sf_dir):
    ev = _events(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id"),
        F.col("ts").alias("err_ts"),
        F.col("value").alias("err_value"),
    )
    paired = TS.range_join_buckets(
        p, e, key="user_id", left_ts="ts", right_ts="err_ts",
        lower_s=-300, upper_s=0,
    )
    return paired.groupBy("event_id", "user_id").agg(
        F.count("*").alias("n_errors"),
        F.sum(F.col("err_value").cast(DEC)).cast("double").alias("err_value_sum"),
    )


@register(
    "q_w_ntile_dist",
    """
    SELECT c_custkey,
           ntile(4) OVER w AS quartile,
           CAST(percent_rank() OVER w AS DOUBLE) AS pct_rank,
           CAST(cume_dist() OVER w AS DOUBLE) AS cum_dist,
           first_value(c_custkey) OVER (PARTITION BY c_mktsegment
                                        ORDER BY c_acctbal DESC, c_custkey
                                        ROWS UNBOUNDED PRECEDING) AS richest_in_segment
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    "[EXT] remaining ranking/analytic window functions: ntile, "
    "percent_rank, cume_dist, first_value over a deterministic order",
)
def q_w_ntile_dist(spark, sf_dir):
    c = C.load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    w_first = (
        W.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return c.select(
        "c_custkey",
        # long cast: Spark ntile is int32, DuckDB int64
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).cast("double").alias("pct_rank"),
        F.cume_dist().over(w).cast("double").alias("cum_dist"),
        F.first("c_custkey").over(w_first).alias("richest_in_segment"),
    )


@register(
    "q_agg_pivot_event_types",
    """
    SELECT user_id,
           count(*) FILTER (event_type = 'click')    AS click,
           count(*) FILTER (event_type = 'error')    AS error,
           count(*) FILTER (event_type = 'purchase') AS purchase,
           count(*) FILTER (event_type = 'signup')   AS signup,
           count(*) FILTER (event_type = 'view')     AS view
    FROM events GROUP BY user_id
    """,
    "[EXT] pivot: per-user event-type counts; fixed pivot values so the "
    "plan is a single hash aggregate (no distinct-value pre-pass)",
)
def q_agg_pivot_event_types(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
    )


@register(
    "q_agg_grouping_sets",
    """
    SELECT n_nationkey, c_mktsegment, count(*) AS n,
           CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS acctbal_sum
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY GROUPING SETS ((n_nationkey), (c_mktsegment), ())
    """,
    "[EXT] grouping sets beyond rollup/cube: two independent groupings + "
    "grand total in one pass",
)
def q_agg_grouping_sets(spark, sf_dir):
    # native DataFrame groupingSets — no temp-view mutation of the shared
    # session (the previous createOrReplaceTempView form left a session-
    # global view behind on every invocation)
    c = C.load_table(spark, sf_dir, "customer")
    n = C.load_table(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    return j.groupingSets(
        [["n_nationkey"], ["c_mktsegment"], []], "n_nationkey", "c_mktsegment"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("c_acctbal").cast("decimal(38,6)"))
        .cast("double")
        .alias("acctbal_sum"),
    )


@register(
    "q_t_downsample_ohlc",
    """
    SELECT user_id,
           strftime(date_trunc('hour', ts), '%Y-%m-%dT%H:%M:%S.%f') AS bucket_ts,
           first(value ORDER BY ts, event_id) AS open,
           max(value) AS high,
           min(value) AS low,
           last(value ORDER BY ts, event_id) AS close,
           CAST(count(*) AS BIGINT) AS n_points
    FROM events
    GROUP BY user_id, date_trunc('hour', ts)
    """,
    "Telemetry downsample — OHLC per (user, hour): open/close via "
    "min_by/max_by on a (ts, event_id) struct (deterministic ties), "
    "high/low/count as plain aggregates; ONE map-side-combined shuffle, "
    "output shrinks by the bucket/sample-rate ratio",
)
def q_t_downsample_ohlc(spark, sf_dir):
    out = TS.downsample_ohlc(_events(spark, sf_dir))
    return out.withColumn(
        "bucket_ts", F.date_format("bucket_ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    )


@register(
    "q_t_anomaly_zscore",
    """
    WITH f AS (
        SELECT user_id, event_id, ts, value,
               count(value) OVER w AS n,
               CAST(sum(CAST(value AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s1,
               CAST(sum(CAST(CAST(value AS DECIMAL(38,6))
                             * CAST(value AS DECIMAL(38,6)) AS DECIMAL(38,6)))
                    OVER w AS DOUBLE) AS s2,
               max(CAST(value AS DECIMAL(38,6))) OVER w AS mx,
               min(CAST(value AS DECIMAL(38,6))) OVER w AS mn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') AS ts, value,
           CASE WHEN (s2 - s1 * s1 / n) / (n - 1.0) > 0
                THEN (value - s1 / n)
                     / sqrt((s2 - s1 * s1 / n) / (n - 1.0))
                WHEN CAST(value AS DECIMAL(38,6)) > mx
                THEN CAST('infinity' AS DOUBLE)
                ELSE CAST('-infinity' AS DOUBLE)
           END AS z
    FROM f
    WHERE n >= 2
      AND (((s2 - s1 * s1 / n) / (n - 1.0) > 0
            AND abs((value - s1 / n)
                    / sqrt((s2 - s1 * s1 / n) / (n - 1.0))) > 3.0)
           OR ((s2 - s1 * s1 / n) / (n - 1.0) <= 0
               AND (CAST(value AS DECIMAL(38,6)) > mx
                    OR CAST(value AS DECIMAL(38,6)) < mn)))
    """,
    "Rolling z-score anomaly flags: |value - mean| > 3 sample stddevs "
    "over the preceding 20 same-key points. One shuffle by key, one "
    "shared per-key sort; mean/var from DECIMAL-exact frame sums (float "
    "sliding-frame aggregation rounds engine-dependently), z arithmetic "
    "in double over those exact sums; zero-spread windows branch "
    "explicitly via the window's DECIMAL min/max envelope (values "
    "outside it flag as +/-Infinity in BOTH engines; sub-quantum noise "
    "inside it never flags — comparing against the double mean would "
    "misfire both ways)",
)
def q_t_anomaly_zscore(spark, sf_dir):
    out = TS.rolling_zscore_anomalies(_events(spark, sf_dir))
    return out.withColumn(
        "ts", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    )


@register(
    "q_t_multires_rollup",
    """
    WITH lv AS (
        SELECT 'minute' AS resolution, user_id,
               date_trunc('minute', ts) AS bucket_ts, ts, value
        FROM events
        UNION ALL
        SELECT 'hour', user_id, date_trunc('hour', ts), ts, value FROM events
        UNION ALL
        SELECT 'day', user_id, date_trunc('day', ts), ts, value FROM events
    )
    SELECT resolution, user_id,
           strftime(bucket_ts, '%Y-%m-%dT%H:%M:%S.%f') AS bucket_ts,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS val_sum,
           min(value) AS val_min,
           max(value) AS val_max
    FROM lv
    GROUP BY resolution, user_id, bucket_ts
    """,
    "Hypertable-style continuous-aggregate cascade: minute rolled up "
    "from raw, hour FROM minute, day FROM hour (count/DECIMAL-sum/min/"
    "max are re-aggregable, so no drift — the oracle recomputes every "
    "level from raw and must match exactly). Raw scanned once; coarser "
    "levels aggregate the tiny finer-level frames",
)
def q_t_multires_rollup(spark, sf_dir):
    out = TS.multires_rollup(_events(spark, sf_dir))
    return out.withColumn(
        "bucket_ts", F.date_format("bucket_ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    )


@register(
    "q_t_funnel_conversion",
    """
    WITH s0 AS (
        SELECT user_id, ts, event_type,
               min(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t0
        FROM events
    ),
    s1 AS (
        SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t0 THEN ts END)
                      OVER (PARTITION BY user_id) AS t1
        FROM s0
    ),
    s2 AS (
        SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t1 THEN ts END)
                      OVER (PARTITION BY user_id) AS t2
        FROM s1
    ),
    per AS (SELECT DISTINCT user_id, t0, t1, t2 FROM s2)
    SELECT CAST(1 AS INTEGER) AS step, 'view' AS step_name,
           CAST(count(t0) AS BIGINT) AS n_users FROM per
    UNION ALL
    SELECT CAST(2 AS INTEGER), 'click', CAST(count(t1) AS BIGINT) FROM per
    UNION ALL
    SELECT CAST(3 AS INTEGER), 'purchase', CAST(count(t2) AS BIGINT) FROM per
    """,
    "Ordered funnel (view -> click -> purchase): users reaching each "
    "step after their first hit of the previous one. Cascading "
    "conditional window-mins over ONE per-user partitioning — no "
    "self-joins, no per-user event lists; insensitive to per-key event "
    "counts",
)
def q_t_funnel_conversion(spark, sf_dir):
    return TS.funnel_counts(_events(spark, sf_dir))


@register(
    "q_t_cohort_retention",
    """
    WITH c AS (
        SELECT user_id, date_trunc('day', ts) AS d,
               date_trunc('day', min(ts) OVER (PARTITION BY user_id)) AS cohort
        FROM events
    ),
    dd AS (SELECT DISTINCT user_id, d, cohort FROM c)
    SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', cohort, d) AS INTEGER) AS day_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM dd
    GROUP BY cohort_day, day_offset
    """,
    "Cohort retention matrix: users grouped by first-activity day, "
    "distinct-active counts per (cohort, day offset). One window-min "
    "per key + a map-side-combinable distinct + the tiny matrix agg",
)
def q_t_cohort_retention(spark, sf_dir):
    return TS.cohort_retention(_events(spark, sf_dir))


@register(
    "q_t_incremental_rollup",
    """
    WITH lv AS (
        SELECT 'minute' AS resolution, user_id,
               date_trunc('minute', ts) AS bucket_ts, ts, value
        FROM events
        UNION ALL
        SELECT 'hour', user_id, date_trunc('hour', ts), ts, value FROM events
        UNION ALL
        SELECT 'day', user_id, date_trunc('day', ts), ts, value FROM events
    )
    SELECT resolution, user_id,
           strftime(bucket_ts, '%Y-%m-%dT%H:%M:%S.%f') AS bucket_ts,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS val_sum,
           min(value) AS val_min,
           max(value) AS val_max
    FROM lv
    GROUP BY resolution, user_id, bucket_ts
    """,
    "Continuous-aggregate maintenance (streaming form, batch-driven "
    "here): events fed through the incremental rollup sink in 3 "
    "interleaved micro-batches — minute state merged per batch "
    "(associative count/DECIMAL-sum/min/max, so merge == recompute "
    "exactly), hour/day derived from it; shares the recompute-from-raw "
    "oracle with q_t_multires_rollup",
)
def q_t_incremental_rollup(spark, sf_dir):
    from ..streaming.rollup import IncrementalRollupSink

    ev = _events(spark, sf_dir).select("user_id", "ts", "value", "event_id")
    sink = IncrementalRollupSink()
    for i in range(3):
        sink.process_batch(ev.filter(F.col("event_id") % 3 == i), i)
    return sink.result().withColumn(
        "bucket_ts", F.date_format("bucket_ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
    )
