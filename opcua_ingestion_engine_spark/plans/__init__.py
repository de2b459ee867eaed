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
    # Round-11 rotation (round-10 verdict item 2). New oracle queries
    # take slots first per the standing rule:
    "q_tf_column_rename",
    "q_tf_column_drop",
    "q_s14_legacy_config_migration",
    # ...then the 13 remaining round-6 rows — the least-recently-
    # checked cohort after round 10 closed lifetime coverage at 100%:
    "q_tpch_q12_priority_classes",
    "q_tpch_q14_promo_effect",
    "q_tpch_q19_disjunctive_revenue",
    "q_agg_mode_per_group",
    "q_w_range_frame",
    "q_t_downtime_report",
    "q_t4_server_watchdog_batch",
    "q_e4_unigram_logprob",
    "q_e4_incremental_heavy_hitters",
    "q_e8_split_leakage",
    "q_e8_domain_mix",
    "q_e8_incremental_corpus_build",
    "q_e8_durable_corpus_build",
    # Family canaries (least-recently-checked member of each family
    # not already covered above; sole members stay by necessity):
    "q_e1_exact_dedup",
    "q_e5_multimodal_meta",  # r9 (oldest e5)
    "q_e6_timeseries_similarity",
    "q_e7_curation_clustered",  # r8 (oldest e7)
    "q_asof_join_purchase_view",
    "q_range_join_purchase_errors",
    "q_w_sessionize",
    # The round-7 cohort (first 26 of its 41 rows, registry order; the
    # remaining 15 — q_tf_upsert_partial, q_tpch_q10/q11/q13/q15/q16/
    # q17/q1/q20/q22/q2/q4, q_validate_orders, q_x1_slope_intercept,
    # q_x_array_hof, q_x_unpivot — lead round 12's rotation):
    "q_agg_corr_moments",
    "q_agg_grouping_sets",
    "q_agg_histogram",
    "q_agg_percentiles",
    "q_agg_pivot_event_types",
    "q_agg_salted_skew",
    "q_e2_cross_corpus_neardup",
    "q_e2_semantic_dedup",
    "q_e3_filtered_ann",
    "q_e4_heavy_hitters",
    "q_e8_corpus_build",
    "q_e8_leakage_free_split",
    "q_profile_lineitem",
    "q_s3_template_scan",
    "q_set_except",
    "q_set_union_all",
    "q_sort_nulls_ordering",
    "q_t_incremental_rollup",
    "q_tf_avg_view",
    "q_tf_delete_where",
    "q_tf_distinct_view",
    "q_tf_minmax_view",
    "q_tf_pruned_read",
    "q_tf_restore",
    "q_tf_schema_evolution",
    "q_tf_update_where",
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
