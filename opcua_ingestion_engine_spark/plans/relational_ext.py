"""[EXT] generic relational surface (SURVEY.md §2.3-§2.6, §2.8 T10).

The reference's joins/aggs are all degenerate broadcast-lookup cases; this
module exposes the full Spark-native relational inventory the driver's
correctness harness expects — join variants, groupBy aggregates,
rollup/cube, window functions, sort/limit/top-k, set ops, and
tumbling/session time windows — each as a small query on the TPC-H-ish
fixture tables with a DuckDB oracle.

Float-parity rule: NEVER sum raw doubles (summation order differs between
engines). Every SUM/AVG first casts addends to DECIMAL(38,6) — exact and
order-independent — and converts back to double only after aggregation
(`CAST(sum AS DOUBLE)`, division done in double on both sides).

Scale notes: these are plain declarative plans — Catalyst handles pushdown
and join selection; AQE picks broadcast vs shuffle at runtime. Window
functions partition by their key (full sort per partition is inherent to
the operator); top-k uses orderBy+limit, which Spark executes as a
per-partition TakeOrdered (no global sort materialization).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .. import catalog as C
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return C.load_table(spark, sf_dir, name)


DEC = "decimal(38,6)"


# ---------------------------------------------------------------------------
# Joins — the Spark-native variants J1-J7 degenerate from (SURVEY.md §2.3)
# ---------------------------------------------------------------------------

@register(
    "q_join_inner_orders_customer",
    """
    SELECT o.o_orderkey, c.c_custkey, c.c_nationkey, o.o_orderstatus
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "[EXT] inner equi-join fact->dim; broadcast-able dimension",
)
def q_join_inner(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey, "inner"
    ).select("o_orderkey", "c_custkey", "c_nationkey", "o_orderstatus")


@register(
    "q_join_left_customer_orders",
    """
    SELECT c.c_custkey, o.o_orderkey
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    """,
    "[EXT] left outer join preserving customers with no orders",
)
def q_join_left(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return c.join(o, o.o_custkey == c.c_custkey, "left").select(
        "c_custkey", "o_orderkey"
    )


@register(
    "q_join_right_orders_customer",
    """
    SELECT c.c_custkey, o.o_orderkey
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "[EXT] right outer join. Planning constraint worth stating honestly: "
    "the PRESERVED side of an outer hash join cannot be the broadcast "
    "build side, so 'keep every dim row' right-outers cannot broadcast "
    "the dim — Spark builds the LEFT (fact) side when it fits and falls "
    "back to a shuffle join at scale (a broadcast(dim) hint here is "
    "unsatisfiable and silently ignored, which is why none is given).",
)
def q_join_right(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "c_custkey", "o_orderkey"
    )


@register(
    "q_join_full_nation_supplier",
    """
    SELECT n.n_nationkey, n.n_name, s.s_suppkey
    FROM nation n FULL OUTER JOIN supplier s ON s.s_nationkey = n.n_nationkey
    """,
    "[EXT] full outer join (nations with no suppliers and vice versa)",
)
def q_join_full(spark, sf_dir):
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    return n.join(s, s.s_nationkey == n.n_nationkey, "full_outer").select(
        "n_nationkey", "n_name", "s_suppkey"
    )


@register(
    "q_join_semi_customers_with_orders",
    """
    SELECT c.c_custkey, c.c_nationkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "[EXT] left-semi join (F9/J7's generic form)",
)
def q_join_semi(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return c.join(o, o.o_custkey == c.c_custkey, "left_semi").select(
        "c_custkey", "c_nationkey"
    )


@register(
    "q_join_anti_customers_without_orders",
    """
    SELECT c.c_custkey, c.c_nationkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "[EXT] left-anti join (S10/F6's generic form)",
)
def q_join_anti(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return c.join(o, o.o_custkey == c.c_custkey, "left_anti").select(
        "c_custkey", "c_nationkey"
    )


@register(
    "q_join_three_way",
    """
    SELECT l.l_orderkey, l.l_linenumber,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           c.c_nationkey
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "[EXT] multi-join chain: fact -> dim -> dim; Catalyst reorders + "
    "broadcasts, one shuffle-free pipeline when dims fit",
)
def q_join_three_way(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    # date formatted to string: Spark's pandas bridge yields ns-resolution
    # timestamps, DuckDB µs — identical instants, unequal dtypes
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "c_nationkey",
        )
    )


# ---------------------------------------------------------------------------
# Aggregations (§2.4 [EXT])
# ---------------------------------------------------------------------------

@register(
    "q_agg_groupby_lineitem",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS avg_qty,
           min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "[EXT] TPC-H Q1-shaped groupBy aggregate (sum/avg/min/max/count); "
    "decimal-exact sums",
)
def q_agg_groupby(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    sum_qty = F.sum(F.col("l_quantity").cast(DEC)).cast("double")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        sum_qty.alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast(DEC)).cast("double").alias("sum_price"),
        (sum_qty / F.count("*").cast("double")).alias("avg_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.count("*").alias("n"),
    )


@register(
    "q_agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "[EXT] ROLLUP grouping sets (subtotals + grand total)",
)
def q_agg_rollup(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
        F.count("*").alias("n"),
    )


@register(
    "q_agg_cube",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "[EXT] CUBE grouping sets (all dimension combinations)",
)
def q_agg_cube(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("sum_qty"),
        F.count("*").alias("n"),
    )


@register(
    "q_agg_count_distinct",
    """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part
    FROM lineitem GROUP BY l_returnflag
    """,
    "[EXT] exact distinct-count aggregate (expand + two-phase agg in Spark)",
)
def q_agg_count_distinct(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct("l_partkey").alias("n_part"),
    )


@register(
    "q_agg_approx_distinct",
    None,  # HLL sketches differ between engines — rows-only; error bound
    # vs exact count_distinct pinned in tests/test_units.py
    "[EXT] approx_count_distinct (HyperLogLog++, rsd=0.02) — the 100 TB "
    "cardinality path: constant-size sketch per group, no expand/two-phase "
    "distinct shuffle like the exact form",
)
def q_agg_approx_distinct(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("n_supp_approx"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("n_part_approx"),
    )


@register(
    "q_agg_having",
    """
    SELECT o_custkey, count(*) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM orders GROUP BY o_custkey HAVING count(*) >= 10
    """,
    "[EXT] post-aggregation filter (HAVING)",
)
def q_agg_having(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"),
        )
        .filter(F.col("n_orders") >= 10)
    )


# ---------------------------------------------------------------------------
# Window functions (§2.5 [EXT])
# ---------------------------------------------------------------------------

@register(
    "q_w_row_number_rank",
    """
    SELECT event_id, user_id,
           row_number() OVER uw AS rn,
           rank() OVER vw AS rk,
           dense_rank() OVER vw AS drk
    FROM events
    WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id),
           vw AS (PARTITION BY user_id ORDER BY event_type)
    """,
    "[EXT] row_number/rank/dense_rank over per-user windows",
)
def q_w_row_number_rank(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    uw = W.partitionBy("user_id").orderBy("ts", "event_id")
    vw = W.partitionBy("user_id").orderBy("event_type")
    # ranks cast to long: Spark emits int32, DuckDB int64 — align the
    # result schema so the driver's dtype/schema comparison can't diverge
    return ev.select(
        "event_id",
        "user_id",
        F.row_number().over(uw).cast("long").alias("rn"),
        F.rank().over(vw).cast("long").alias("rk"),
        F.dense_rank().over(vw).cast("long").alias("drk"),
    )


@register(
    "q_w_lag_lead",
    """
    SELECT event_id, user_id, value,
           lag(value) OVER uw AS prev_value,
           lead(value) OVER uw AS next_value
    FROM events
    WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "[EXT] lag/lead (the F2 change-filter primitive) on the events stream",
)
def q_w_lag_lead(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    uw = W.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(uw).alias("prev_value"),
        F.lead("value").over(uw).alias("next_value"),
    )


@register(
    "q_w_running_sum",
    """
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(38,6)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_sum
    FROM events
    """,
    "[EXT] running sum over rowsBetween frame; decimal-exact accumulation",
)
def q_w_running_sum(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    uw = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast(DEC)).over(uw).cast("double").alias("running_sum"),
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k / set ops (§2.6 [EXT])
# ---------------------------------------------------------------------------

@register(
    "q_sort_topk_orders",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
    """,
    "[EXT] top-k = orderBy + limit; Spark executes TakeOrdered "
    "(per-partition heap, no global sort). Unique tiebreak keeps the "
    "result set deterministic.",
)
def q_sort_topk(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .limit(100)
    )


@register(
    "q_set_union_all",
    """
    SELECT o_custkey AS custkey FROM orders
    UNION ALL
    SELECT c_custkey AS custkey FROM customer
    """,
    "[EXT] UNION ALL (bag union, no dedup shuffle)",
)
def q_set_union_all(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    return o.unionByName(c)


@register(
    "q_set_intersect",
    """
    SELECT c_custkey AS custkey FROM customer
    INTERSECT
    SELECT o_custkey AS custkey FROM orders
    """,
    "[EXT] INTERSECT (distinct semantics)",
)
def q_set_intersect(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.intersect(o)


@register(
    "q_set_except",
    """
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
    "[EXT] EXCEPT (distinct semantics; J5's one-sided half)",
)
def q_set_except(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    return c.subtract(o)


# ---------------------------------------------------------------------------
# Time windows (§2.8 T10 [EXT])
# ---------------------------------------------------------------------------

@register(
    "q_t10_tumbling_window",
    """
    SELECT strftime(to_timestamp(floor(epoch(ts) / 3600) * 3600),
                    '%Y-%m-%dT%H:%M:%S.%f') AS window_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    "[EXT] T10 — tumbling 1h event-time window aggregate "
    "(window(); streaming-equivalent batch form)",
)
def q_t10_tumbling(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("window.start", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "q_t10_session_window",
    """
    WITH marked AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER uw IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER uw)
                            >= 30 * 60 * 1000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW uw AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, ts,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%dT%H:%M:%S.%f') AS session_start,
           count(*) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
    "[EXT] T10 — session window (30 min gap). Spark session_window vs "
    "gaps-and-islands oracle. Session closes when the next event is >= gap "
    "after the previous (Spark windows are half-open [start, last+gap)).",
)
def q_t10_session(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("session_window.start", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            "n_events",
        )
    )
