"""[EXT] Time-series relational operators Spark lacks natively: as-of
join, gap sessionization, and a bucketed range join.

The reference's only temporal logic is staleness filtering and
last-write-wins state (``Services/OpcSubscribeService.cs:558-559,
600-654``); an analytics engine over the same telemetry additionally
needs the classic time-series joins. Each operator here is built from
shuffle-minimal DataFrame primitives — no crossJoin, no Python UDFs —
so the plans survive a 100 TB events table:

- ``asof_join``: ONE shuffle (the union is partitioned by key once; the
  window sort is per-key). The naive formulation — join + filter +
  row_number — shuffles both sides AND materializes every candidate
  pair; this one never forms pairs at all.
- ``sessionize``: one shuffle by key; both windows (lag, running sum)
  share the same partitioning+ordering, so Catalyst plans a single
  sort per partition.
- ``range_join_buckets``: equi-join on (key, coarse time bucket) with a
  bounded 2x fan-out on the smaller side, then an exact refinement
  filter. A plain theta join degenerates to nested-loop; bucketing
  turns it into a hash join whose per-bucket fan-in is bounded by the
  window width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

DEC = "decimal(38,6)"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: dict[str, Column | str],
    tiebreak: str,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the payload of the
    most recent right row with ``right.ts <= left.ts`` and the same key.

    ``payload`` maps output column name -> right-side column. ``tiebreak``
    orders right rows that share a timestamp (largest wins), keeping the
    result deterministic — the precondition the DuckDB ASOF oracle needs
    too, so callers should pass a unique id.

    Implementation: tag sides, union, and compute ``last(payload,
    ignorenulls=True)`` over ``partitionBy(key).orderBy(ts, side,
    tiebreak)`` — right rows sort before left rows at equal timestamps,
    giving inclusive (<=) semantics. One shuffle total; state per key is
    the running last payload, never a pair set.

    All payload columns are packed into ONE struct before the window so
    the whole payload is taken atomically from the same right row. (With
    one ``last(..., ignorenulls=True)`` per column, a NULL field in the
    newest right row would fall back to an older row for that column only
    — mixed-row output, and NULLs "seen through" instead of carried,
    diverging from true ASOF semantics.) A right row always contributes a
    non-null struct, so NULL payload *fields* are carried verbatim.
    """
    payload = {k: F.col(v) if isinstance(v, str) else v for k, v in payload.items()}
    rhs_struct = F.struct(*[c.alias(n) for n, c in payload.items()])
    struct_type = right.select(rhs_struct.alias("_p")).schema[0].dataType
    lhs = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.col(tiebreak).alias("_tb"),
        F.struct(*left.columns).alias("_row"),
        F.lit(None).cast(struct_type).alias("_p"),
    )
    rhs = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.col(tiebreak).alias("_tb"),
        F.lit(None).cast(lhs.select("_row").schema[0].dataType).alias("_row"),
        rhs_struct.alias("_p"),
    )
    w = (
        W.partitionBy("_k")
        .orderBy("_ts", "_side", "_tb")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = lhs.unionByName(rhs).select(
        "_side",
        "_row",
        F.last("_p", ignorenulls=True).over(w).alias("_p"),
    )
    return matched.filter(F.col("_side") == 1).select(
        "_row.*", *[F.col(f"_p.{n}").alias(n) for n in payload]
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    gap_s: int,
) -> DataFrame:
    """Gap-based sessionization: rows of one key belong to the same
    session while consecutive gaps stay ``<= gap_s`` seconds. Adds
    ``session_id`` (0-based per key, arrival order).

    lag + running-sum of session-start flags over one (key, ts) sort —
    the standard single-shuffle formulation; session state never
    materializes beyond the two window passes Catalyst fuses into one
    sort.
    """
    order = [F.col(ts), F.col(tiebreak)]
    w_lag = W.partitionBy(key).orderBy(*order)
    w_run = w_lag.rowsBetween(W.unboundedPreceding, W.currentRow)
    prev = F.lag(ts).over(w_lag)
    new_sess = (
        prev.isNull()
        | (F.unix_micros(F.col(ts)) - F.unix_micros(prev) > gap_s * 1_000_000)
    ).cast("long")
    return df.withColumn("session_id", F.sum(new_sess).over(w_run) - F.lit(1))


def range_join_buckets(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
) -> DataFrame:
    """Range join: pair each left row with every right row of the same key
    whose timestamp falls in ``[left.ts + lower_s, left.ts + upper_s)``.

    The equi-join key is (key, coarse bucket): bucket width =
    ``upper_s - lower_s``, so a left row's window overlaps at most 2
    buckets — the left side is exploded to those (bounded 2x fan-out,
    on the side that is usually the smaller "query" stream) and refined
    with the exact predicate after the hash join. Returns the paired
    rows with both timestamps; callers aggregate as needed. When the
    two timestamp columns share a name, the right one comes back as
    ``<name>_right`` (and the refine predicate is built side-qualified,
    so same-name inputs never hit AMBIGUOUS_REFERENCE).
    """
    if upper_s <= lower_s:
        raise ValueError(
            f"range_join_buckets needs a non-degenerate window: "
            f"lower_s={lower_s} upper_s={upper_s}"
        )
    if right_ts == left_ts:
        out_right_ts = right_ts + "_right"
        right = right.withColumnRenamed(right_ts, out_right_ts)
        right_ts = out_right_ts
    width_us = (upper_s - lower_s) * 1_000_000
    lo = F.unix_micros(F.col(left_ts)) + lower_s * 1_000_000
    lhs = left.withColumn("_lo_us", lo).withColumn(
        "_bucket", F.explode(F.array(
            F.floor(lo / width_us), F.floor(lo / width_us) + 1
        ))
    )
    rhs = right.withColumn(
        "_bucket", F.floor(F.unix_micros(F.col(right_ts)) / width_us)
    )
    r_us = F.unix_micros(rhs[right_ts])
    cond = (
        (lhs[key] == rhs[key])
        & (lhs["_bucket"] == rhs["_bucket"])
        & (r_us >= lhs["_lo_us"])
        & (r_us < lhs["_lo_us"] + F.lit(width_us))
    )
    return (
        lhs.join(rhs, cond, "inner")
        .drop(rhs[key])
        .drop("_bucket", "_lo_us")
    )


def downsample_ohlc(
    events: DataFrame,
    bucket: str = "hour",
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    tie_col: str = "event_id",
) -> DataFrame:
    """OHLC/Gorilla-style downsample: per (key, time bucket) keep
    open/high/low/close + count — the rollup a telemetry store serves
    dashboards from instead of raw points.

    One groupBy on (key, bucket): min/max are plain codegen'd aggregates;
    open/close are ``min_by``/``max_by`` with a (ts, tie) struct ordering
    key, so ties at identical timestamps resolve deterministically. The
    shuffle carries one row per (key, bucket) per map partition
    (map-side partial combine) — at 100 TB this is the canonical
    pre-aggregation whose output is smaller than its input by the
    bucket/sample-rate ratio."""
    ord_key = F.struct(F.col(ts_col), F.col(tie_col))
    return (
        events.groupBy(
            F.col(key_col),
            F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts"),
        )
        .agg(
            F.min_by(F.col(val_col), ord_key).alias("open"),
            F.max(val_col).alias("high"),
            F.min(val_col).alias("low"),
            F.max_by(F.col(val_col), ord_key).alias("close"),
            F.count("*").alias("n_points"),
        )
    )


def rolling_zscore_anomalies(
    events: DataFrame,
    lookback: int = 20,
    z_thresh: float = 3.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    tie_col: str = "event_id",
) -> DataFrame:
    """Rolling z-score outlier detection: flag points whose value is more
    than ``z_thresh`` sample standard deviations from the mean of the
    preceding ``lookback`` points of the same key.

    One shuffle by key, one per-key sort shared by both frame aggregates.
    The mean/variance come from DECIMAL-exact running sums (sum and
    sum-of-squares over the frame), not floating stddev aggregates:
    sliding-frame float aggregation is engine-dependent (incremental
    add/remove vs segment trees round differently), while exact decimal
    sums make Spark and any SQL oracle agree bit-for-bit; the final
    variance/z arithmetic is a fixed double expression over those exact
    sums. Frames shorter than 2 preceding points can't estimate spread
    and are never flagged.

    Zero-spread windows get an EXPLICIT branch: a flat-line history
    followed by a different value is infinitely many "standard
    deviations" away and is flagged with z = +/-Infinity (the
    flat-line-then-spike case a telemetry monitor most needs). Leaving
    it to the division would silently drop those rows in Spark
    (double/0 is NULL in non-ANSI mode; sqrt of the tiny-negative var
    float rounding can produce is NaN) while IEEE engines like DuckDB
    return Infinity — an engine-dependent miss, not a semantics choice.

    The zero-spread test itself runs on the QUANTIZED values via the
    window's decimal min/max ENVELOPE, never against the double mean:
    ``s1/n`` is generally not bit-equal to the flat value even for a
    perfectly flat window (``(3 * 0.1) / 3 != 0.1`` in doubles), and a
    var that cancels to <= 0 under large offsets (ulp(1e12) ~ 1e-4)
    does not mean the history was flat. Rule: var <= 0 flags exactly
    the values OUTSIDE the observed [min, max] decimal envelope —
    sub-quantum noise inside the envelope is never an anomaly, a real
    departure always is. The streaming twin (streaming/anomaly.py)
    implements the same branch."""
    v_dec = F.col(val_col).cast(DEC)
    w = (
        W.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(tie_col).asc())
        .rowsBetween(-lookback, -1)
    )
    n = F.count(val_col).over(w)
    s1 = F.sum(v_dec).over(w).cast("double")
    s2 = F.sum((v_dec * v_dec).cast(DEC)).over(w).cast("double")
    mx = F.max(v_dec).over(w)
    mn = F.min(v_dec).over(w)
    nd = n.cast("double")
    # Total arithmetic: clamp divisors so short-window rows (n < 2, which
    # the filter below removes) never divide by zero — ANSI mode raises
    # DIVIDE_BY_ZERO even for doubles, and whether the n >= 2 conjunct
    # short-circuits the evaluation depends on predicate inlining, which
    # is an optimizer choice, not a contract. For n >= 2 the clamps are
    # identities, so flagged rows match the oracle exactly.
    mean = s1 / F.greatest(nd, F.lit(1.0))
    var = (s2 - s1 * s1 / F.greatest(nd, F.lit(1.0))) / F.greatest(
        nd - F.lit(1.0), F.lit(1.0)
    )
    z = (
        F.when(var > 0, (F.col(val_col) - mean) / F.sqrt(var))
        .when(v_dec > mx, F.lit(float("inf")))
        .when(v_dec < mn, F.lit(float("-inf")))
    )
    flagged = (F.col("_n") >= 2) & (
        ((F.col("_var") > 0) & (F.abs(F.col("z")) > z_thresh))
        | ((F.col("_var") <= 0) & ((v_dec > F.col("_mx")) | (v_dec < F.col("_mn"))))
    )
    return (
        events.withColumn("_n", n)
        .withColumn("_mx", mx)
        .withColumn("_mn", mn)
        .withColumn("_var", var)
        .withColumn("z", z)
        .filter(flagged)
        .select(key_col, tie_col, ts_col, val_col, "z")
    )


def multires_rollup(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Hypertable-style multi-resolution rollup: minute, hour, and day
    aggregates where each coarser level is computed FROM the next finer
    one, never from raw data — the continuous-aggregate cascade.

    Correctness rests on re-aggregability: count and DECIMAL sum are
    associative, so hour-from-minute equals hour-from-raw exactly (the
    oracle recomputes every level from raw; equality proves the cascade
    introduces no drift — the property that lets a deployment maintain
    the minute level incrementally and derive the rest for free). Raw
    data is scanned ONCE; each subsequent level aggregates the
    level-sized (already tiny) frame above it. avg is derived at read
    time from (sum, count) — never rolled up itself, since avg is not
    re-aggregable."""
    minute = rollup_minute(events, key_col, ts_col, val_col)
    return rollup_cascade(minute, key_col)


def rollup_cascade(minute: DataFrame, key_col: str = "user_id") -> DataFrame:
    """minute-level state -> the three-level (resolution, key, bucket_ts,
    n_points, val_sum, val_min, val_max) frame. ONE definition of the
    cascade and its output schema, shared by the batch operator and the
    incremental sink (streaming/rollup.py) so their contract of
    identical output cannot drift."""
    hour = rollup_up(minute, "hour", key_col)
    day = rollup_up(hour, "day", key_col)

    def out(df: DataFrame, res: str) -> DataFrame:
        return df.select(
            F.lit(res).alias("resolution"),
            key_col,
            "bucket_ts",
            "n_points",
            F.col("val_sum").cast("double").alias("val_sum"),
            "val_min",
            "val_max",
        )

    return out(minute, "minute").unionByName(out(hour, "hour")).unionByName(
        out(day, "day")
    )


def rollup_minute(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Finest rollup level: (key, minute bucket) -> count / DECIMAL sum /
    min / max. The base state a continuous aggregate maintains."""
    return (
        events.groupBy(
            F.col(key_col),
            F.date_trunc("minute", F.col(ts_col)).alias("bucket_ts"),
        )
        .agg(
            F.count("*").alias("n_points"),
            F.sum(F.col(val_col).cast(DEC)).alias("val_sum"),
            F.min(val_col).alias("val_min"),
            F.max(val_col).alias("val_max"),
        )
    )


def rollup_up(df: DataFrame, unit: str, key_col: str = "user_id") -> DataFrame:
    """Re-aggregate a rollup level to a coarser unit — also the MERGE
    that folds a new batch's partial buckets into maintained state
    (count/sum/min/max are associative + commutative, so merging partials
    equals recomputing from raw)."""
    return (
        df.groupBy(
            F.col(key_col),
            F.date_trunc(unit, F.col("bucket_ts")).alias("bucket_ts"),
        )
        .agg(
            F.sum("n_points").alias("n_points"),
            F.sum("val_sum").cast(DEC).alias("val_sum"),
            F.min("val_min").alias("val_min"),
            F.max("val_max").alias("val_max"),
        )
    )


def funnel_counts(
    events: DataFrame,
    steps: tuple[str, ...] = ("view", "click", "purchase"),
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel conversion: how many keys reached step 1, step 2
    after step 1, step 3 after step 2 (ts >= previous step's first hit).

    No join, no pair materialization: all step timestamps are cascading
    conditional window-mins over ONE per-key partitioning — Catalyst
    plans a single shuffle and the window aggregates share the
    partition; the final step-count aggregation runs over one row per
    key. The classic formulations (k-1 self-joins, or a sequence-match
    UDF over collected arrays) shuffle k times or materialize per-key
    event lists; this shape does neither and is insensitive to per-key
    event counts — the 100 TB funnel."""
    w = W.partitionBy(key_col)
    prev = None
    cols = []
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) >= prev)
        t = F.min(F.when(cond, F.col(ts_col))).over(w)
        cols.append(t.alias(f"_t{i}"))
        prev = F.col(f"_t{i}")
        # reference the aliased column in the NEXT select stage; build
        # iteratively so each step's window sees the previous alias
        events = events.select("*", cols[-1])
    per_key = events.select(
        key_col, *[f"_t{i}" for i in range(len(steps))]
    ).dropDuplicates([key_col])
    aggs = [
        F.count(F.col(f"_t{i}")).alias(f"n_{i}") for i in range(len(steps))
    ]
    wide = per_key.agg(*aggs)
    # unpivot the single wide row with stack() — one consumption, so the
    # per-key subtree is never duplicated in the plan (a 3-way union of
    # selects from `wide` would re-expand it per branch)
    stack_args = ", ".join(
        f"CAST({i + 1} AS INT), '{s}', n_{i}" for i, s in enumerate(steps)
    )
    return wide.selectExpr(
        f"stack({len(steps)}, {stack_args}) AS (step, step_name, n_users)"
    )


def cohort_retention(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: keys grouped by first-activity day, and
    for each (cohort_day, day_offset) the count of distinct keys active
    that day. One window-min per key (shared shuffle with nothing else),
    a distinct on (key, day) — both map-side combinable — and the final
    small matrix aggregation."""
    w = W.partitionBy(key_col)
    return (
        events.select(
            F.col(key_col),
            F.date_trunc("day", F.col(ts_col)).alias("_day"),
            F.date_trunc("day", F.min(F.col(ts_col)).over(w)).alias("_cohort"),
        )
        .distinct()
        .groupBy(
            F.date_format("_cohort", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("_day"), F.col("_cohort")).cast("int").alias(
                "day_offset"
            ),
        )
        .agg(F.count("*").alias("n_users"))
    )
