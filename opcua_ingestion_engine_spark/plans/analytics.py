"""[EXT] TPC-H-shaped analytics suite over the driver's fixture tables.

The reference engine answers one perpetual query (the modvalues snapshot);
a general PySpark analytics engine must also run the standard warehouse
query shapes — multi-way star joins, filtered aggregates, top-k reports,
and having-subquery semi joins. These six queries are the classic TPC-H
patterns (Q1/Q3/Q5/Q6/Q10/Q18) adapted to the fixture schemas
(TESTDATA.md), each oracle-checked against DuckDB.

Float-parity rule (same as relational_ext): products are evaluated in
double (IEEE multiply is bit-identical across engines, left-associative
in both SQL dialects), then each addend is cast to DECIMAL(38,6) before
SUM so accumulation is exact and order-independent; the total converts
back to double only at the end. Every ORDER BY ... LIMIT carries a unique
tiebreak column so the selected row SET is deterministic.

Scale notes: all six are single declarative plans — Catalyst pushes the
date/flag filters into the parquet scans and prunes columns; dimension
sides (nation/region/supplier) are broadcast explicitly, customer/orders
are left to AQE (dimension-sized here, shuffle-joined at 100 TB). The
Q18 inner aggregate is a groupBy on the join key itself, so the
having-filtered result joins lineitem/orders co-partitioned without an
extra exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog as C
from .registry import register

DEC = "decimal(38,6)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return C.load_table(spark, sf_dir, name)


def _dsum(expr) -> F.Column:
    """Order-independent sum: cast each double addend to DECIMAL(38,6),
    sum exactly, return double."""
    return F.sum(expr.cast(DEC)).cast("double")


_REVENUE = "CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)"


def _revenue() -> F.Column:
    return _dsum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))


@register(
    "q_tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
           CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
           CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01'
    GROUP BY l_returnflag, l_linestatus
    """,
    "[EXT] TPC-H Q1 — pricing summary report: one scan, filter pushed to "
    "parquet, 8 decimal-exact aggregates in a single hash aggregate",
)
def q_tpch_q1(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("2001-09-01"))
    )
    n = F.count("*")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum(F.col("l_quantity")).alias("sum_qty"),
        _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
        _revenue().alias("sum_disc_price"),
        _dsum(
            F.col("l_extendedprice")
            * (F.lit(1.0) - F.col("l_discount"))
            * (F.lit(1.0) + F.col("l_tax"))
        ).alias("sum_charge"),
        (_dsum(F.col("l_quantity")) / n.cast("double")).alias("avg_qty"),
        (_dsum(F.col("l_extendedprice")) / n.cast("double")).alias("avg_price"),
        (_dsum(F.col("l_discount")) / n.cast("double")).alias("avg_disc"),
        n.alias("count_order"),
    )


@register(
    "q_tpch_q3_shipping_priority",
    f"""
    SELECT l.l_orderkey,
           {_REVENUE} AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1997-06-30'
      AND l.l_shipdate > TIMESTAMP '1997-06-30'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
    "[EXT] TPC-H Q3 — shipping priority: star join with both filters "
    "pushed below the join, grouped revenue, top-10 TakeOrdered",
)
def q_tpch_q3(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1997-06-30"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1997-06-30"))
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .select(
            "l_orderkey",
            "revenue",
            # string-formatted: aligns result dtype with the DuckDB oracle
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_orderpriority",
        )
        .limit(10)
    )


@register(
    "q_tpch_q5_local_supplier_volume",
    f"""
    SELECT n.n_name, {_REVENUE} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
    "[EXT] TPC-H Q5 — local supplier volume: 6-way join incl. the "
    "supplier-customer same-nation condition; nation/region/supplier "
    "broadcast, region filter prunes before the fact join",
)
def q_tpch_q5(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_revenue().alias("revenue"))
    )


@register(
    "q_tpch_q6_forecast_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    "[EXT] TPC-H Q6 — forecast revenue change: pure scan-filter-aggregate; "
    "every predicate reaches the parquet reader (PushedFilters)",
)
def q_tpch_q6(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count("*").alias("n"),
        )
    )


@register(
    "q_tpch_q10_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name, {_REVENUE} AS revenue, c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
    "[EXT] TPC-H Q10 — returned-item reporting: quarter + returnflag "
    "filters below a 4-way join, top-20 customers by lost revenue",
)
def q_tpch_q10(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-04-01")))
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_revenue().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .limit(20)
    )


@register(
    "q_tpch_q18_large_volume_customer",
    """
    WITH big AS (
        SELECT l_orderkey,
               CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING sum(CAST(l_quantity AS DECIMAL(38,6))) > 300
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate,
           o.o_totalprice, b.total_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
    "[EXT] TPC-H Q18 — large-volume customers: the having-subquery is an "
    "aggregate on the join key itself, so the filtered result joins orders "
    "without re-shuffling the fact side",
)
def q_tpch_q18(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("qty"))
        .filter(F.col("qty") > 300)
        .select("l_orderkey", F.col("qty").cast("double").alias("total_qty"))
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
    )
