"""[EXT] advanced aggregate / scalar coverage: exact percentiles,
higher-order array functions, and the salted two-stage aggregation
pattern for skewed keys.

Percentile parity note: Spark ``percentile`` and DuckDB
``quantile_cont`` implement the same definition (linear interpolation at
rank ``(n-1)*p``); with integral data values and dyadic p
(0.25/0.5/0.75) the interpolation arithmetic is exact in double on both
engines, so the comparison is bit-identical. Higher-order folds run
left-to-right in declared element order on both engines, so
double-precision accumulation orders agree.

The salted aggregation is the canonical skew treatment at 100 TB: stage
1 groups by (key, salt) so one hot key spreads over ``salt_buckets``
reducers; stage 2 merges the bounded partials. Decimal partial sums make
the two-stage result bit-identical to the direct group-by (associative,
order-independent) — which is exactly what the plain-SQL oracle checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog as C
from .registry import register

DEC = "decimal(38,6)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return C.load_table(spark, sf_dir, name)


@register(
    "q_agg_percentiles",
    """
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.25) AS q25,
           quantile_cont(l_quantity, 0.50) AS q50,
           quantile_cont(l_quantity, 0.75) AS q75,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    "[EXT] exact percentiles (linear interpolation) per group; the "
    "approx_percentile sketch is the scale path, this is the exact "
    "verify form",
)
def q_agg_percentiles(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("q25"),
        F.percentile("l_quantity", 0.50).alias("q50"),
        F.percentile("l_quantity", 0.75).alias("q75"),
        F.count("*").alias("n"),
    )


@register(
    "q_x_array_hof",
    """
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           sqrt(list_reduce(
               list_transform(embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               (a, b) -> a + b)) AS l2_norm,
           list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                       (a, b) -> CASE WHEN b > a THEN b ELSE a END) AS max_val,
           CAST(len(list_filter(embedding, x -> x > 0.0)) AS BIGINT)
               AS n_positive
    FROM embeddings
    """,
    "[EXT] higher-order array functions (transform/aggregate/filter) on "
    "the embedding column — JVM-side lambda evaluation, no UDF; "
    "left-to-right folds match DuckDB list_reduce exactly",
)
def q_x_array_hof(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    sq = F.transform("embedding", lambda x: x.cast("double") * x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.sqrt(F.aggregate(sq, F.lit(0.0), lambda a, x: a + x)).alias("l2_norm"),
        F.aggregate(
            dbl,
            F.lit(None).cast("double"),
            lambda a, x: F.when(a.isNull() | (x > a), x).otherwise(a),
        ).alias("max_val"),
        F.size(F.filter("embedding", lambda x: x > 0.0)).cast("long").alias(
            "n_positive"
        ),
    )


@register(
    "q_agg_salted_skew",
    """
    SELECT l_returnflag,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
               AS revenue,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
    "[EXT] salted two-stage aggregation: 3 hot keys spread over 8 salt "
    "buckets in stage 1, merged in stage 2 — bit-identical to the direct "
    "groupBy (decimal partials are order-independent), which is what the "
    "plain-SQL oracle asserts",
)
def q_agg_salted_skew(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    stage1 = (
        l.withColumn("_salt", F.pmod(F.col("l_orderkey"), F.lit(8)))
        .groupBy("l_returnflag", "_salt")
        .agg(
            F.sum(F.col("l_extendedprice").cast(DEC)).alias("_rev"),
            F.count("*").alias("_n"),
        )
    )
    return stage1.groupBy("l_returnflag").agg(
        F.sum("_rev").cast("double").alias("revenue"),
        F.sum("_n").alias("n"),
    )


@register(
    "q_x_unpivot",
    """
    SELECT p_partkey, attr, val FROM (
        SELECT p_partkey, 'retailprice' AS attr,
               CAST(p_retailprice AS DOUBLE) AS val FROM part
        UNION ALL
        SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
    )
    """,
    "[EXT] unpivot/melt: wide part attributes to long (attr, val) rows — "
    "Spark's native unpivot vs the equivalent UNION ALL oracle",
)
def q_x_unpivot(spark, sf_dir):
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    )
    return p.unpivot("p_partkey", ["retailprice", "size"], "attr", "val")


@register(
    "q_sort_nulls_ordering",
    """
    SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_np
    FROM orders
    ORDER BY status_np NULLS FIRST, o_orderkey
    LIMIT 50
    """,
    "[EXT] explicit null-ordering sort: NULLS FIRST with a unique "
    "tiebreak — engines default null order differently (Spark first, "
    "DuckDB last), so the query pins it explicitly on both",
)
def q_sort_nulls_ordering(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.nullif("o_orderstatus", F.lit("P")).alias("status_np"),
        )
        .orderBy(F.col("status_np").asc_nulls_first(), F.col("o_orderkey"))
        .limit(50)
    )


@register(
    "q_agg_approx_percentile",
    None,  # sketch output is engine-specific; error bound pinned in pytest
    "[EXT] approx_percentile sketch — the scale path pairing "
    "q_agg_percentiles' exact verify form; |approx - exact| accuracy is "
    "pinned by tests/test_timeseries.py::test_approx_percentile_error_bound",
)
def q_agg_approx_percentile(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_percentile("l_quantity", 0.5, 10000).alias("approx_median"),
        F.count("*").alias("n"),
    )


@register(
    "q_e4_pattern_extract",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[0-9]+(\.[0-9]+)?')) AS BIGINT)
               AS n_numbers,
           CAST(len(regexp_extract_all(text, '[A-Z][a-z]+')) AS BIGINT)
               AS n_capitalized,
           CAST(len(regexp_extract_all(text, '\b(the|and|of)\b')) AS BIGINT)
               AS n_function_words
    FROM documents
    """,
    "[EXT] E4 pattern extraction: per-doc counts of numeric literals, "
    "capitalized words and selected function words via regexp_extract_all "
    "— pure codegen'd JVM regex, one scan",
)
def q_e4_pattern_extract(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    def n(pat):
        # idx=0 (whole match): the default group index 1 CRASHES on
        # group-less patterns like [A-Z][a-z]+ and would count the
        # decimal-part group for the numeric pattern
        return F.size(F.regexp_extract_all("text", F.lit(pat), 0)).cast("long")
    return d.select(
        "doc_id",
        n(r"[0-9]+(\.[0-9]+)?").alias("n_numbers"),
        n(r"[A-Z][a-z]+").alias("n_capitalized"),
        n(r"\b(the|and|of)\b").alias("n_function_words"),
    )


@register(
    "q_profile_lineitem",
    """
    SELECT 'l_quantity' AS col, count(*) AS n_rows,
           count(l_quantity) AS n_nonnull,
           count(DISTINCT l_quantity) AS n_distinct,
           CAST(min(l_quantity) AS DOUBLE) AS min_val,
           CAST(max(l_quantity) AS DOUBLE) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', count(*), count(l_discount),
           count(DISTINCT l_discount),
           CAST(min(l_discount) AS DOUBLE), CAST(max(l_discount) AS DOUBLE)
    FROM lineitem
    """,
    "[EXT] table profiling utility: per-column null/distinct/min/max in "
    "one pass per column set — the first query any engine user runs "
    "against an unknown table",
)
def q_profile_lineitem(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    def profile(col):
        return l.agg(
            F.lit(col).alias("col"),
            F.count("*").alias("n_rows"),
            F.count(col).alias("n_nonnull"),
            F.count_distinct(F.col(col)).alias("n_distinct"),
            F.min(col).cast("double").alias("min_val"),
            F.max(col).cast("double").alias("max_val"),
        )
    return profile("l_quantity").unionByName(profile("l_discount"))


@register(
    "q_agg_corr_moments",
    """
    WITH m AS (
        SELECT count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sx,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sy,
               CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(38,6)))
                    AS DOUBLE) AS sxx,
               CAST(sum(CAST(l_extendedprice * l_extendedprice
                             AS DECIMAL(38,6))) AS DOUBLE) AS syy,
               CAST(sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6)))
                    AS DOUBLE) AS sxy
        FROM lineitem
    )
    SELECT n,
           (sxy - sx * sy / n) / (n - 1) AS covar_samp,
           (sxx - sx * sx / n) / (n - 1) AS var_x,
           (sxy - sx * sy / n)
               / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n)) AS corr_xy
    FROM m
    """,
    "[EXT] correlation/covariance/variance derived from decimal-exact "
    "moments: the built-in corr()/covar_samp() accumulate in double with "
    "engine-specific order (not cross-engine comparable); exact moments "
    "then identical double arithmetic are — and the moment form is also "
    "the single-pass map-side-combinable shape you want at 100 TB",
)
def q_agg_corr_moments(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    def dsum(c):
        return F.sum(c.cast(DEC)).cast("double")
    m = l.agg(
        F.count("*").alias("n"),
        dsum(F.col("l_quantity")).alias("sx"),
        dsum(F.col("l_extendedprice")).alias("sy"),
        dsum(F.col("l_quantity") * F.col("l_quantity")).alias("sxx"),
        dsum(F.col("l_extendedprice") * F.col("l_extendedprice")).alias("syy"),
        dsum(F.col("l_quantity") * F.col("l_extendedprice")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return m.select(
        "n",
        ((sxy - sx * sy / n) / (n - 1)).alias("covar_samp"),
        ((sxx - sx * sx / n) / (n - 1)).alias("var_x"),
        (
            (sxy - sx * sy / n)
            / F.sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))
        ).alias("corr_xy"),
    )


@register(
    "q_agg_histogram",
    """
    SELECT CAST(floor(o_totalprice / 50000.0) + 1 AS BIGINT) AS bucket,
           count(*) AS n,
           CAST(min(o_totalprice) AS DOUBLE) AS lo,
           CAST(max(o_totalprice) AS DOUBLE) AS hi
    FROM orders GROUP BY bucket
    """,
    "[EXT] fixed-width histogram via width_bucket (DuckDB 1.0 lacks the "
    "function — the oracle uses the equivalent floor formula; the data "
    "domain has no values on bucket boundaries, checked, so the two "
    "formulas agree) — single hash aggregate, the standard "
    "distribution-profiling query",
)
def q_agg_histogram(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "bucket", F.width_bucket("o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(12))
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
    )


@register(
    "q_agg_mode_per_group",
    """
    WITH c AS (
        SELECT user_id, event_type, count(*) AS cnt
        FROM events GROUP BY user_id, event_type
    ),
    r AS (
        SELECT user_id, event_type, cnt,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY cnt DESC, event_type ASC) AS rn
        FROM c
    )
    SELECT user_id, event_type AS mode_event_type,
           CAST(cnt AS BIGINT) AS mode_count
    FROM r WHERE rn = 1
    """,
    "Per-group mode: most frequent event_type per user, deterministic "
    "tie-break (count desc, then lexicographic). Two map-side-combined "
    "aggregations — the count shuffle carries (user, type) partials and "
    "the mode pick runs over the tiny per-user count frame; never a "
    "collect_list of raw events",
)
def q_agg_mode_per_group(spark, sf_dir):
    from pyspark.sql.window import Window as W

    ev = C.load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("cnt"))
    w = W.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_event_type"),
            F.col("cnt").cast("long").alias("mode_count"),
        )
    )


@register(
    "q_w_range_frame",
    """
    SELECT event_id,
           CAST(sum(CAST(value AS DECIMAL(38,6)))
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS trailing_hour_sum,
           CAST(count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
                AS BIGINT) AS trailing_hour_n
    FROM events
    """,
    "Value-based window frame (RANGE, not ROWS): per event, the DECIMAL-"
    "exact sum and count of the same user's values in the trailing hour "
    "— the frame follows the TIME AXIS, so dense bursts and sparse "
    "stretches get the correct window regardless of row counts. Ordering "
    "key is unix microseconds (numeric range frames); one shuffle by "
    "user, one per-key sort",
)
def q_w_range_frame(spark, sf_dir):
    from pyspark.sql.window import Window as W

    ev = C.load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        F.sum(F.col("value").cast(DEC)).over(w).cast("double").alias(
            "trailing_hour_sum"
        ),
        F.count("*").over(w).cast("long").alias("trailing_hour_n"),
    )


@register(
    "q_validate_orders",
    """
    WITH a AS (
        SELECT
          CAST(sum(CASE WHEN o_custkey IS NOT NULL THEN 0 ELSE 1 END)
               AS BIGINT) AS r0,
          CAST(sum(CASE WHEN o_totalprice >= 0 AND o_totalprice <= 100000
                        THEN 0 ELSE 1 END) AS BIGINT) AS r1,
          CAST(sum(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END)
               AS BIGINT) AS r2,
          CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS u
        FROM orders
    )
    SELECT 'not_null(o_custkey)' AS rule, r0 AS n_violations, r0 = 0 AS passed FROM a
    UNION ALL
    SELECT 'in_range(o_totalprice,0,100000)', r1, r1 = 0 FROM a
    UNION ALL
    SELECT 'is_in(o_orderstatus,[O,F,P])', r2, r2 = 0 FROM a
    UNION ALL
    SELECT 'unique(o_orderkey)', u, u = 0 FROM a
    """,
    "Data-quality constraint validation (Deequ-style): completeness, "
    "range, set-membership, and key-uniqueness expectations over orders "
    "evaluated in ONE aggregation pass (each predicate folds to a "
    "sum(CASE) in the same aggregate; uniqueness rides the same job as "
    "count - count_distinct). Per-rule violation counts, never "
    "fail-on-first — the gate a pipeline runs on every ingested table. "
    "The range rule is deliberately tight so a nonzero count is "
    "exercised.",
)
def q_validate_orders(spark, sf_dir):
    from ..operators import validate as V

    orders = C.load_table(spark, sf_dir, "orders")
    return V.check_constraints(
        orders,
        [
            V.not_null("o_custkey"),
            V.in_range("o_totalprice", 0, 100000),
            V.is_in("o_orderstatus", ["O", "F", "P"]),
        ],
        unique_cols=["o_orderkey"],
    )
