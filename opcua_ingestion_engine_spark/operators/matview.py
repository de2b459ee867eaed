"""Incremental materialized views over versioned tables — the consumer
side of the table layer's change feed.

The reference keeps its derived state (liveness flags, latest values)
fresh by re-running upsert queries against the mutable PostgreSQL table
on every batch (``Services/OpcSubscribeService.cs`` re-reads what it
needs); the Spark-shaped equivalent of "keep an aggregate fresh" is a
materialized view maintained from CDC, not a rescan. This module keeps
an additive aggregate (``GROUP BY keys → COUNT(*), SUM(measures)``)
synchronized with a source table committed through
``operators/tablefmt.py``:

- **O(changes) refresh.** Each ``refresh`` reads ONLY the source's
  change feed since the view's cursor (``tablefmt.table_changes`` —
  tail directories for append ranges, one keyed endpoint diff
  otherwise), reduces it to per-group deltas (inserts and update
  postimages count +1, deletes and update preimages count −1), and
  folds the deltas into the stored aggregate with one union+groupBy.
  The source table is never rescanned; at 100 TB the refresh cost is
  proportional to what changed, which is the entire point of CDC.
- **Exactly-once cursor.** The view is itself a versioned table; the
  consumed source version rides in the view manifest's ``app``
  metadata, so the cursor and the state it explains commit in the SAME
  manifest CAS. A crash between computing the delta and committing
  re-serves the identical change range on restart; a racing refresher
  loses the CAS, re-reads the advanced cursor, and finds nothing left
  to do. No side-channel offsets file to drift out of sync.
- **Exact arithmetic.** Measure addends are cast to DECIMAL(38,6)
  before summing (the repo-wide convention from ``plans/analytics.py``)
  so that applying +post −pre deltas in any order reproduces the full
  recompute bit-for-bit — incremental-equals-recompute is a hash-level
  test invariant, not an approximation. Groups whose live row count
  reaches zero are dropped from the view.

Scale shape: one shuffle over the CHANGES on the group keys, then one
union+groupBy of (stored aggregate ∪ deltas) — the stored aggregate has
group-cardinality rows, not source-cardinality. No collect, no Python
row loop; everything is codegen'd aggregate arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import tablefmt as TF

_DEC = "decimal(38,6)"


def changes_to_deltas(
    changes: DataFrame, group_keys: list[str], sum_cols: list[str],
    count_col: str = "n",
) -> DataFrame:
    """Reduce a CDF-shaped change frame (``_change_type`` per
    ``tablefmt.snapshot_diff``) to per-group additive deltas: rows and
    measure sums gained (+) or lost (−) by each group. Update pre/post
    images decompose into a −1 on the old group and a +1 on the new, so
    rows MOVING between groups (a changed group-key value) are handled
    with no special case."""
    gained = F.col(TF.CHANGE_TYPE_COL).isin("insert", "update_postimage")
    sign = F.when(gained, F.lit(1)).otherwise(F.lit(-1))

    def _signed(c: str) -> F.Column:
        # negate the DECIMAL(38,6) addend rather than multiply by a
        # signed decimal: negation preserves the exact type, while a
        # decimal×decimal multiply goes through Spark's precision-loss
        # adjustment
        addend = F.col(c).cast(_DEC)
        return F.when(gained, addend).otherwise(-addend)

    aggs = [F.sum(sign).cast("bigint").alias(count_col)] + [
        F.sum(_signed(c)).cast(_DEC).alias(f"sum_{c}") for c in sum_cols
    ]
    return changes.groupBy(*group_keys).agg(*aggs)


def _fold(
    state: DataFrame | None, deltas: DataFrame, group_keys: list[str],
    sum_cols: list[str], count_col: str,
) -> DataFrame:
    """state ∪ deltas → one groupBy — NULL group keys fold naturally
    (groupBy treats NULL as a value; a keyed join would need null-safe
    equality and a coalesce per key)."""
    both = deltas if state is None else state.unionByName(deltas)
    folded = both.groupBy(*group_keys).agg(
        F.sum(count_col).cast("bigint").alias(count_col),
        *[F.sum(f"sum_{c}").cast(_DEC).alias(f"sum_{c}") for c in sum_cols],
    )
    return folded.filter(F.col(count_col) != 0)


class MaterializedAggView:
    """An additive GROUP-BY view of a versioned source table, stored as
    a versioned table of its own and advanced by ``refresh()``.

    ``row_keys`` are the SOURCE table's unique row keys — needed only
    when a refresh range includes rewrite/upsert commits (the keyed-diff
    path of ``table_changes``); pure-append sources may pass None.
    View columns: ``group_keys + [count_col] + [f"sum_{c}" ...]``.
    """

    def __init__(
        self,
        source_root: str,
        view_root: str,
        group_keys: list[str],
        sum_cols: list[str] | None = None,
        row_keys: list[str] | None = None,
        count_col: str = "n",
    ):
        if not group_keys:
            raise ValueError("group_keys must be non-empty")
        self.source_root = source_root
        self.view_root = view_root
        self.group_keys = list(group_keys)
        self.sum_cols = list(sum_cols or [])
        self.row_keys = list(row_keys) if row_keys else None
        self.count_col = count_col

    def cursor(self) -> int | None:
        """Last source version folded into the committed view (None =
        nothing consumed) — read from the view's live manifest, the one
        place it cannot disagree with the state it describes."""
        live = TF.latest_version(self.view_root)
        if live is None:
            return None
        return TF.history(self.view_root)[-1].get("app", {}).get("cursor")

    def result(self, spark: SparkSession) -> DataFrame:
        return TF.read_version(spark, self.view_root)

    def refresh(self, spark: SparkSession, max_retries: int = 20) -> int | None:
        """Advance the view to the source's latest committed version.
        Returns the new view version, or None when already current (a
        no-op poll commits nothing). Concurrency-safe: the manifest CAS
        elects one winner per view version; losers re-read the cursor
        and retry on whatever range remains."""
        for _ in range(max_retries):
            target = TF.latest_version(self.source_root)
            parent = TF.latest_version(self.view_root)
            cur = self.cursor()
            if target is None or (cur is not None and cur >= target):
                return None  # nothing new committed upstream
            changes = TF.table_changes(
                spark, self.source_root, cur, target, keys=self.row_keys
            )
            deltas = changes_to_deltas(
                changes, self.group_keys, self.sum_cols, self.count_col
            )
            state = (
                TF.read_version(spark, self.view_root, parent)
                if parent is not None
                else None
            )
            folded = _fold(
                state, deltas, self.group_keys, self.sum_cols, self.count_col
            )
            v = TF._try_commit(
                folded, self.view_root, parent, app={"cursor": target}
            )
            if v is not None:
                return v
            # lost the CAS — someone else advanced the view; rebase
        raise RuntimeError(
            f"matview refresh lost the manifest CAS {max_retries} times at "
            f"{self.view_root} — refresher contention is pathological"
        )
