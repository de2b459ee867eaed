from .registry import QUERIES, oracle_sql, queries

# Importing these modules registers their queries as a side effect.
from . import reference_ops  # noqa: E402,F401
from . import relational_ext  # noqa: E402,F401
from . import llm_ops  # noqa: E402,F401
from . import config_ops  # noqa: E402,F401
from . import analytics  # noqa: E402,F401
from . import timeseries_ops  # noqa: E402,F401
from . import analytics_full  # noqa: E402,F401
from . import advanced_ops  # noqa: E402,F401
from . import telemetry_reports  # noqa: E402,F401
from . import datapipe_ops  # noqa: E402,F401

# ---------------------------------------------------------------------------
# Driver correctness window (first 50 registered queries).
#
# The external driver oracle-checks only the first 50 entries of queries(),
# in registration order. Module import order above groups queries by theme,
# which left the LLM-pipeline (E1-E7), TPC-H, and time-series-join queries
# outside the checked window in round 2. This explicit ordering puts one
# oracle-checked representative of every operator family inside the window
# and pushes all rows-only (no-oracle) entries to the very end so the window
# never burns a slot on a guaranteed "no_oracle" row.
#
# Every name listed here must exist and carry an oracle; a pytest gate
# (tests/test_registry_window.py) pins both properties.
# ---------------------------------------------------------------------------

DRIVER_WINDOW: tuple[str, ...] = (
    # Flagship first — unchanged since round 1.
    "q_flagship_modvalues",
    # Round-7 rotation (round-6 verdict item 1): the window takes ALL 34
    # oracle queries that have never held a driver slot (union of
    # CORRECTNESS_r01–r06 keys vs the registry), finishing the set in one
    # rotation instead of the two the verdict budgeted. Multi-round-green
    # round-6 members step out; every family keeps one green
    # representative as a canary (tests/test_registry_window.py pins one
    # member per family; all rotated-out members remain oracle-checked in
    # pytest via verify_contract / test_parity).
    #
    # Reference-core canaries.
    "q_s3_template_scan",
    "q_x1_slope_intercept",
    # Versioned-table layer: the seven round-6 additions registered after
    # the r6 window froze, plus the two new round-7 views (avg /
    # approx-count-distinct maintenance).
    "q_tf_delete_where",
    "q_tf_update_where",
    "q_tf_restore",
    "q_tf_schema_evolution",
    "q_tf_upsert_partial",
    "q_tf_pruned_read",
    "q_tf_minmax_view",
    "q_tf_avg_view",
    "q_tf_distinct_view",
    # Round-6 LLM-pipeline additions that never held a slot.
    "q_e2_cross_corpus_neardup",
    "q_e2_semantic_dedup",
    "q_e3_filtered_ann",
    "q_e8_leakage_free_split",
    # TPC-H body members never driver-checked (q10 first — earlier
    # verdicts wrongly assumed it covered).
    "q_tpch_q10_returned_items",
    "q_tpch_q2_min_cost_supplier",
    "q_tpch_q4_order_priority",
    "q_tpch_q11_important_stock",
    "q_tpch_q13_customer_distribution",
    "q_tpch_q15_top_supplier",
    "q_tpch_q16_supplier_cnt",
    "q_tpch_q17_small_qty_revenue",
    "q_tpch_q20_potential_promotion",
    "q_tpch_q22_sales_opportunity",
    # Relational long tail never driver-checked.
    "q_agg_pivot_event_types",
    "q_agg_grouping_sets",
    "q_agg_percentiles",
    "q_agg_salted_skew",
    "q_agg_histogram",
    "q_agg_corr_moments",
    "q_set_union_all",
    "q_set_except",
    "q_sort_nulls_ordering",
    "q_x_array_hof",
    "q_x_unpivot",
    "q_profile_lineitem",
    "q_validate_orders",
    # Family representatives (green in r6 or earlier; keep one per family
    # so a regression in a family's shared machinery still surfaces).
    "q_e1_exact_dedup",
    "q_e4_heavy_hitters",
    "q_e5_multimodal_meta",
    "q_e6_timeseries_similarity",
    "q_e7_curation_quality_rep",
    "q_tpch_q1_pricing_summary",
    "q_asof_join_purchase_view",
    "q_range_join_purchase_errors",
    "q_w_sessionize",
    "q_t_incremental_rollup",
    "q_e8_corpus_build",
    # (q_a2_latest_per_key / q_s9_upsert_matched / q_b1_browse_tree
    # rotate out this round — two-plus consecutive driver-green rounds;
    # still pytest-oracle-checked.)
)


def _reorder_for_driver_window() -> None:
    missing = [n for n in DRIVER_WINDOW if n not in QUERIES]
    if missing:
        raise RuntimeError(f"DRIVER_WINDOW names not registered: {missing}")
    no_oracle_in_window = [n for n in DRIVER_WINDOW if QUERIES[n].oracle is None]
    if no_oracle_in_window:
        raise RuntimeError(
            f"DRIVER_WINDOW entries without oracle SQL: {no_oracle_in_window}"
        )
    window = set(DRIVER_WINDOW)
    oracle_rest = [n for n, q in QUERIES.items() if n not in window and q.oracle is not None]
    rows_only = [n for n, q in QUERIES.items() if n not in window and q.oracle is None]
    ordered = {n: QUERIES[n] for n in (*DRIVER_WINDOW, *oracle_rest, *rows_only)}
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder_for_driver_window()

__all__ = ["QUERIES", "queries", "oracle_sql", "DRIVER_WINDOW"]
