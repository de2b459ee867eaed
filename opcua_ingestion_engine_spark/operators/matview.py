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
- **Non-additive MIN/MAX via affected-group recompute.** ``min_cols``
  / ``max_cols`` maintain extrema. Inserts fold monotonically
  (``least``/``greatest`` with the stored value); a delete or update
  that removes a value TYING the stored extremum makes the group
  *dirty* — only dirty groups are re-aggregated, by a semi join of the
  source snapshot against the (broadcast-sized) dirty-key set. Refresh
  cost is O(changes) + O(rows of affected groups), never O(table)
  arithmetic for clean groups; an append-only source never dirties.

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
    """A GROUP-BY view of a versioned source table, stored as a
    versioned table of its own and advanced by ``refresh()``.

    ``row_keys`` are the SOURCE table's unique row keys — needed only
    when a refresh range includes rewrite/upsert commits (the keyed-diff
    path of ``table_changes``); pure-append sources may pass None.
    View columns: ``group_keys + [count_col] + [f"sum_{c}" ...] +
    [f"min_{c}" ...] + [f"max_{c}" ...]``.

    COUNT/SUM are additive and fold from the change feed alone. MIN/MAX
    (``min_cols``/``max_cols``) are not: an insert folds monotonically,
    but a removal that ties the stored extremum leaves the survivor
    unknown without re-looking at the group — those groups (and ONLY
    those) are re-aggregated against the source snapshot via a
    broadcast semi join on the dirty keys.

    ``avg_cols`` maintain SQL AVG (NULL-skipping): the state carries the
    column's DECIMAL(38,6) sum (``sum_c``, shared with ``sum_cols``)
    plus a NON-NULL row count (``cnt_c`` — the group row count ``n``
    would mis-average a column with NULLs), both purely additive;
    ``result()`` derives ``avg_c = sum_c / cnt_c`` at read time, so the
    stored state stays exact decimals and no extra non-additive
    machinery is needed.

    ``approx_distinct_cols`` maintain APPROX_COUNT_DISTINCT as a
    Datasketches HLL sketch column (``hll_c``, binary): inserts fold
    monotonically — the change batch is sketched with
    ``hll_sketch_agg`` and merged into the stored sketch with
    ``hll_union`` (a sketch is a lossy monotone set union, the same
    trick as MIN/MAX) — but sketches cannot subtract, so ANY removal of
    a non-NULL value dirties the group and it is re-sketched from the
    source snapshot through the same broadcast-semi-join recompute the
    extrema use. Append-only sources never dirty; ``result()`` derives
    ``approx_distinct_c = hll_sketch_estimate(hll_c)``. (Exact
    COUNT(DISTINCT) under deletes would need a support relation keyed
    by (group, value) — deliberately out of scope; the sketch is the
    100 TB-shaped answer.)
    """

    def __init__(
        self,
        source_root: str,
        view_root: str,
        group_keys: list[str],
        sum_cols: list[str] | None = None,
        row_keys: list[str] | None = None,
        count_col: str = "n",
        min_cols: list[str] | None = None,
        max_cols: list[str] | None = None,
        avg_cols: list[str] | None = None,
        approx_distinct_cols: list[str] | None = None,
    ):
        if not group_keys:
            raise ValueError("group_keys must be non-empty")
        self.source_root = source_root
        self.view_root = view_root
        self.group_keys = list(group_keys)
        self.sum_cols = list(sum_cols or [])
        self.row_keys = list(row_keys) if row_keys else None
        self.count_col = count_col
        self.min_cols = list(min_cols or [])
        self.max_cols = list(max_cols or [])
        self.avg_cols = list(avg_cols or [])
        self.distinct_cols = list(approx_distinct_cols or [])
        # avg state = shared decimal sum + non-null count; dedup so a
        # column in both sum_cols and avg_cols stores ONE sum_<c>
        self._all_sum = list(dict.fromkeys(self.sum_cols + self.avg_cols))

    def cursor(self) -> int | None:
        """Last source version folded into the committed view (None =
        nothing consumed) — read from the view's live manifest, the one
        place it cannot disagree with the state it describes."""
        live = TF.latest_version(self.view_root)
        if live is None:
            return None
        return TF.history(self.view_root)[-1].get("app", {}).get("cursor")

    def result(self, spark: SparkSession) -> DataFrame:
        """The committed view, with the READ-TIME derived columns: for
        each avg column ``avg_c = sum_c / cnt_c`` (double; NULL when the
        group holds no non-NULL value, matching SQL AVG) and for each
        approx-distinct column ``approx_distinct_c`` (bigint, 0 for an
        all-NULL group, matching APPROX_COUNT_DISTINCT). Deriving at
        read keeps the stored state exact decimals and raw sketches."""
        out = TF.read_version(spark, self.view_root)
        for c in self.avg_cols:
            out = out.withColumn(
                f"avg_{c}",
                F.when(
                    F.col(f"cnt_{c}") > 0,
                    F.col(f"sum_{c}").cast("double")
                    / F.col(f"cnt_{c}").cast("double"),
                ),
            )
        for c in self.distinct_cols:
            out = out.withColumn(
                f"approx_distinct_{c}",
                F.when(
                    F.col(f"hll_{c}").isNotNull(),
                    F.hll_sketch_estimate(F.col(f"hll_{c}")),
                ).otherwise(F.lit(0)).cast("bigint"),
            )
        return out

    def _fold_with_extrema(
        self,
        spark: SparkSession,
        state: DataFrame | None,
        changes: DataFrame,
        target: int,
    ) -> DataFrame:
        """One refresh fold when MIN/MAX columns are maintained.

        Shape: (1) per-group deltas over the CHANGES — count/sum signed
        addends plus the gained-side and removed-side extrema; (2) pair
        each group's stored row with its delta row via union+groupBy
        (NULL group keys fold naturally — no null-safe join needed);
        (3) clean groups take ``least``/``greatest`` of (stored, gained)
        in pure column arithmetic; (4) groups whose REMOVED extremum ties
        the stored one (and no gained value re-covers it) are *dirty* —
        re-aggregated from the source snapshot through a broadcast semi
        join on the dirty keys, O(affected groups' rows), and stitched
        back with one broadcast left join. The paired frame is
        group-cardinality and is localCheckpointed so the dirty test and
        the final plan don't recompute the fold."""
        keys = self.group_keys
        n, dec = self.count_col, _DEC
        gained = F.col(TF.CHANGE_TYPE_COL).isin("insert", "update_postimage")

        aggs = [
            F.sum(F.when(gained, F.lit(1)).otherwise(F.lit(-1)))
            .cast("bigint").alias("_dn")
        ]
        for c in self._all_sum:
            addend = F.col(c).cast(dec)
            aggs.append(
                F.sum(F.when(gained, addend).otherwise(-addend))
                .cast(dec).alias(f"_dsum_{c}")
            )
        for c in self.avg_cols:
            # signed NON-NULL count — SQL AVG skips NULLs, so the group
            # row count n is the wrong denominator for a nullable column
            nn = F.col(c).isNotNull()
            aggs.append(
                F.sum(
                    F.when(gained & nn, F.lit(1))
                    .when(~gained & nn, F.lit(-1))
                    .otherwise(F.lit(0))
                ).cast("bigint").alias(f"_dcnt_{c}")
            )
        for c in self.min_cols:
            aggs.append(F.min(F.when(gained, F.col(c))).alias(f"_gmin_{c}"))
            aggs.append(F.min(F.when(~gained, F.col(c))).alias(f"_rmin_{c}"))
        for c in self.max_cols:
            aggs.append(F.max(F.when(gained, F.col(c))).alias(f"_gmax_{c}"))
            aggs.append(F.max(F.when(~gained, F.col(c))).alias(f"_rmax_{c}"))
        for c in self.distinct_cols:
            aggs.append(
                F.hll_sketch_agg(F.when(gained, F.col(c)))
                .alias(f"_ghll_{c}")
            )
            # sketches cannot subtract: any removed non-NULL value
            # dirties the group (re-sketched from the source snapshot)
            aggs.append(
                F.max(F.when(~gained & F.col(c).isNotNull(), F.lit(True)))
                .alias(f"_rdel_{c}")
            )
        deltas = changes.groupBy(*keys).agg(*aggs)

        # pair state and delta rows per group: tag columns, union, and
        # take the single non-null value per side (each side contributes
        # at most one row per group, so first(ignorenulls) is exact)
        src_schema = changes.drop(
            TF.CHANGE_TYPE_COL, TF.COMMIT_VERSION_COL
        ).schema
        svals = (
            [F.col(n).alias("_sn")]
            + [F.col(f"sum_{c}").alias(f"_ssum_{c}") for c in self._all_sum]
            + [F.col(f"cnt_{c}").alias(f"_scnt_{c}") for c in self.avg_cols]
            + [F.col(f"min_{c}").alias(f"_smin_{c}") for c in self.min_cols]
            + [F.col(f"max_{c}").alias(f"_smax_{c}") for c in self.max_cols]
            + [
                F.col(f"hll_{c}").alias(f"_shll_{c}")
                for c in self.distinct_cols
            ]
        )
        dnames = [f.name for f in deltas.schema.fields if f.name not in keys]
        if state is None:
            state_side = None
        else:
            state_side = state.select(*keys, *svals).select(
                "*", *[F.lit(None).cast(
                    deltas.schema[c].dataType
                ).alias(c) for c in dnames]
            )
        snames = [
            ("_sn", "bigint"),
            *[(f"_ssum_{c}", dec) for c in self._all_sum],
            *[(f"_scnt_{c}", "bigint") for c in self.avg_cols],
            *[(f"_smin_{c}", src_schema[c].dataType) for c in self.min_cols],
            *[(f"_smax_{c}", src_schema[c].dataType) for c in self.max_cols],
            *[(f"_shll_{c}", "binary") for c in self.distinct_cols],
        ]
        delta_side = deltas.select(
            *keys,
            *[F.lit(None).cast(t).alias(c) for c, t in snames],
            *dnames,
        )
        both = (
            delta_side if state_side is None
            else state_side.unionByName(delta_side)
        )
        paired = both.groupBy(*keys).agg(
            *[
                F.first(c, ignorenulls=True).alias(c)
                for c in [cn for cn, _ in snames] + dnames
            ]
        )

        def _coal(c):
            return F.coalesce(F.col(c), F.lit(0))

        live = paired.withColumn(
            n, (_coal("_sn") + _coal("_dn")).cast("bigint")
        ).filter(F.col(n) != 0)
        for c in self._all_sum:
            live = live.withColumn(
                "sum_" + c,
                (
                    F.coalesce(F.col(f"_ssum_{c}"), F.lit(0).cast(dec))
                    + F.coalesce(F.col(f"_dsum_{c}"), F.lit(0).cast(dec))
                ).cast(dec),
            )
        for c in self.avg_cols:
            live = live.withColumn(
                "cnt_" + c,
                (_coal(f"_scnt_{c}") + _coal(f"_dcnt_{c}")).cast("bigint"),
            )

        # dirty: a removed value ties-or-beats the stored extremum (or
        # the state never knew one) AND no gained value re-covers it —
        # for min, "covers" means gained <= stored (the new extremum is
        # the gained value no matter what the removal took away)
        dirty_flags = []
        for c in self.min_cols:
            s, g, r = (
                F.col(f"_smin_{c}"), F.col(f"_gmin_{c}"), F.col(f"_rmin_{c}")
            )
            flag = (
                r.isNotNull()
                & (s.isNull() | (r <= s))
                & ~(g.isNotNull() & s.isNotNull() & (g <= s))
            )
            live = live.withColumn(f"_dirty_min_{c}", flag).withColumn(
                f"min_{c}", F.least(s, g)
            )
            dirty_flags.append(F.col(f"_dirty_min_{c}"))
        for c in self.max_cols:
            s, g, r = (
                F.col(f"_smax_{c}"), F.col(f"_gmax_{c}"), F.col(f"_rmax_{c}")
            )
            flag = (
                r.isNotNull()
                & (s.isNull() | (r >= s))
                & ~(g.isNotNull() & s.isNotNull() & (g >= s))
            )
            live = live.withColumn(f"_dirty_max_{c}", flag).withColumn(
                f"max_{c}", F.greatest(s, g)
            )
            dirty_flags.append(F.col(f"_dirty_max_{c}"))
        for c in self.distinct_cols:
            s, g = F.col(f"_shll_{c}"), F.col(f"_ghll_{c}")
            live = live.withColumn(
                f"_dirty_hll_{c}", F.coalesce(F.col(f"_rdel_{c}"), F.lit(False))
            ).withColumn(
                f"hll_{c}",
                F.when(s.isNull(), g)
                .when(g.isNull(), s)
                .otherwise(F.hll_union(s, g)),
            )
            dirty_flags.append(F.col(f"_dirty_hll_{c}"))

        out_cols = (
            keys + [n]
            + [f"sum_{c}" for c in self._all_sum]
            + [f"cnt_{c}" for c in self.avg_cols]
            + [f"min_{c}" for c in self.min_cols]
            + [f"max_{c}" for c in self.max_cols]
            + [f"hll_{c}" for c in self.distinct_cols]
        )
        import functools
        import operator

        if not dirty_flags:
            # pure additive state (avg-only view): nothing can dirty
            return live.select(*out_cols)

        any_dirty = functools.reduce(operator.or_, dirty_flags)
        # group-cardinality frame; checkpoint so the dirty probe and the
        # committed plan don't re-run the fold (and the commit's plan
        # doesn't re-read the change feed)
        live = live.withColumn("_dirty", any_dirty).localCheckpoint(eager=True)

        dirty_keys = live.filter(F.col("_dirty")).select(*keys)
        if dirty_keys.limit(1).count() == 0:
            return live.select(*out_cols)

        source = TF.read_version(spark, self.source_root, target)
        sem = functools.reduce(
            operator.and_,
            [source[k].eqNullSafe(dirty_keys[k]) for k in keys],
        )
        raggs = (
            [F.min(c).alias(f"_rcmin_{c}") for c in self.min_cols]
            + [F.max(c).alias(f"_rcmax_{c}") for c in self.max_cols]
            + [
                F.hll_sketch_agg(c).alias(f"_rchll_{c}")
                for c in self.distinct_cols
            ]
        )
        recomputed = (
            source.join(F.broadcast(dirty_keys), sem, "left_semi")
            .groupBy(*keys).agg(*raggs)
        )
        cond = functools.reduce(
            operator.and_,
            [live[k].eqNullSafe(recomputed[k]) for k in keys],
        )
        joined = live.join(F.broadcast(recomputed), cond, "left")
        fixed = [
            F.when(
                F.col(f"_dirty_min_{c}"), F.col(f"_rcmin_{c}")
            ).otherwise(F.col(f"min_{c}")).alias(f"min_{c}")
            for c in self.min_cols
        ] + [
            F.when(
                F.col(f"_dirty_max_{c}"), F.col(f"_rcmax_{c}")
            ).otherwise(F.col(f"max_{c}")).alias(f"max_{c}")
            for c in self.max_cols
        ] + [
            F.when(
                F.col(f"_dirty_hll_{c}"), F.col(f"_rchll_{c}")
            ).otherwise(F.col(f"hll_{c}")).alias(f"hll_{c}")
            for c in self.distinct_cols
        ]
        plain = [
            live[c]
            for c in (
                keys + [n]
                + [f"sum_{c}" for c in self._all_sum]
                + [f"cnt_{c}" for c in self.avg_cols]
            )
        ]
        out = joined.select(*plain, *fixed)
        return out.select(*out_cols)

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
            state = (
                TF.read_version(spark, self.view_root, parent)
                if parent is not None
                else None
            )
            if (
                self.min_cols or self.max_cols
                or self.avg_cols or self.distinct_cols
            ):
                folded = self._fold_with_extrema(spark, state, changes, target)
            else:
                deltas = changes_to_deltas(
                    changes, self.group_keys, self.sum_cols, self.count_col
                )
                folded = _fold(
                    state, deltas, self.group_keys, self.sum_cols,
                    self.count_col,
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

    def streaming_maintainer(self, max_retries: int = 20):
        """A ``foreachBatch`` callable that maintains this view from a
        ``table_changes`` STREAMING query over the source table
        (``streaming/tablestream.py``) — the continuously-maintained
        materialized view: the engine plans each micro-batch O(changes)
        from the manifest log and this fold applies it O(changes), so
        the view tracks the table with no polling loop and no rescans.

        Exactly-once from either side's replay: the streaming engine
        replays version RANGES (offsets are commit versions, rows carry
        ``_commit_version``), and the view's manifest-CAS cursor trims
        any rows at or below what a previous attempt — or a concurrent
        batch-side ``refresh`` — already folded. A fully-applied replay
        commits nothing."""

        def _apply(batch_df: DataFrame, batch_id: int) -> None:
            spark = batch_df.sparkSession
            # the batch is bounded (one version range): its max version
            # is the cursor this fold will claim
            row = batch_df.agg(
                F.max(TF.COMMIT_VERSION_COL).alias("v")
            ).collect()[0]
            target = row["v"]
            if target is None:
                return  # empty micro-batch
            batch_df = batch_df.localCheckpoint(eager=True)
            for _ in range(max_retries):
                parent = TF.latest_version(self.view_root)
                cur = self.cursor()
                if cur is not None and cur >= target:
                    return  # replayed range already folded
                changes = (
                    batch_df.filter(F.col(TF.COMMIT_VERSION_COL) > cur)
                    if cur is not None
                    else batch_df
                )
                state = (
                    TF.read_version(spark, self.view_root, parent)
                    if parent is not None
                    else None
                )
                if (
                    self.min_cols or self.max_cols
                    or self.avg_cols or self.distinct_cols
                ):
                    folded = self._fold_with_extrema(
                        spark, state, changes, target
                    )
                else:
                    deltas = changes_to_deltas(
                        changes, self.group_keys, self.sum_cols,
                        self.count_col,
                    )
                    folded = _fold(
                        state, deltas, self.group_keys, self.sum_cols,
                        self.count_col,
                    )
                v = TF._try_commit(
                    folded, self.view_root, parent, app={"cursor": target}
                )
                if v is not None:
                    return
                # lost the CAS — a concurrent refresher advanced the
                # view; re-read the cursor and fold what remains
            raise RuntimeError(
                f"streaming matview fold lost the manifest CAS "
                f"{max_retries} times at {self.view_root}"
            )

        return _apply
