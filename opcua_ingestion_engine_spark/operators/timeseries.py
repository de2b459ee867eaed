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
    rows with both timestamps; callers aggregate as needed.
    """
    if upper_s <= lower_s:
        raise ValueError(
            f"range_join_buckets needs a non-degenerate window: "
            f"lower_s={lower_s} upper_s={upper_s}"
        )
    width_us = (upper_s - lower_s) * 1_000_000
    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(right_ts))
    lo = l_us + lower_s * 1_000_000
    lhs = left.withColumn("_lo_us", lo).withColumn(
        "_bucket", F.explode(F.array(
            F.floor(lo / width_us), F.floor(lo / width_us) + 1
        ))
    )
    rhs = right.withColumn("_bucket", F.floor(r_us / width_us))
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
