"""[EXT] Data-quality constraint validation (Deequ-style checks).

A training-data pipeline gates every ingested table on declarative
expectations — completeness (no nulls), uniqueness of keys, value
ranges, set membership — and records per-rule violation counts rather
than failing on first error. This module evaluates a rule set in ONE
aggregation pass over the table (each predicate folds to a
``sum(CASE WHEN violated)`` in the same aggregate — no per-rule scans),
plus one count-distinct term per uniqueness rule riding the same job.

Scale shape: a single scan + a single global aggregate (map-side
partial sums, one 1-row result); uniqueness adds one exact
count_distinct whose partial aggregation shuffles only the key column.
The violation report is rule-cardinality-sized (config-sized), emitted
as rows via an unpivot of the 1-row aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    """Completeness: ``col`` must never be NULL."""
    return (f"not_null({col})", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    """Range: lo <= col <= hi (NULL fails — range implies presence)."""
    return (
        f"in_range({col},{lo},{hi})",
        (F.col(col) >= lo) & (F.col(col) <= hi),
    )


def is_in(col: str, values: list) -> tuple[str, Column]:
    """Set membership: col must be one of ``values`` (NULL fails)."""
    vals = ",".join(str(v) for v in values)
    return (f"is_in({col},[{vals}])", F.col(col).isin(values))


def check_constraints(
    df: DataFrame,
    rules: list[tuple[str, Column]],
    unique_cols: list[str] | None = None,
) -> DataFrame:
    """Evaluate predicate rules + optional key-uniqueness in one pass.

    Returns (rule STRING, n_violations BIGINT, passed BOOLEAN) — one row
    per rule, deterministic order-independent counts. A predicate rule's
    violations are rows where the condition is not TRUE (so NULL
    predicates count as violations — absent data fails an expectation).
    A uniqueness rule's violations are ``count(*) - count_distinct``
    over the key columns: the number of surplus duplicate rows.
    """
    # coalesce(..., 0): over an EMPTY batch sum() yields NULL, which would
    # NULL-propagate into n_violations/passed — an empty ingest must pass
    # every predicate rule cleanly (0 rows -> 0 violations).
    aggs = [
        F.coalesce(
            F.sum(F.when(cond, F.lit(0)).otherwise(F.lit(1))), F.lit(0)
        ).cast("long").alias(f"_r{i}")
        for i, (_name, cond) in enumerate(rules)
    ]
    names = [name for name, _ in rules]
    if unique_cols:
        aggs.append(
            (F.count(F.lit(1)) - F.count_distinct(*[F.col(c) for c in unique_cols]))
            .cast("long")
            .alias("_uniq")
        )
        names = names + [f"unique({','.join(unique_cols)})"]
    row = df.agg(*aggs)
    # explode over an array of structs, not create_map: two rules sharing a
    # name would crash create_map under spark.sql.mapKeyDedupPolicy=EXCEPTION
    # (or silently drop a row under LAST_WIN); structs keep every rule row.
    structs = []
    for i, name in enumerate(names):
        col = "_uniq" if unique_cols and i == len(names) - 1 else f"_r{i}"
        structs.append(
            F.struct(
                F.lit(name).alias("rule"), F.col(col).alias("n_violations")
            )
        )
    return (
        row.select(F.explode(F.array(*structs)).alias("kv"))
        .select("kv.rule", "kv.n_violations")
        .withColumn("passed", F.col("n_violations") == 0)
    )
