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
    # Round-13 rotation (round-12 verdict item 9). No new oracle queries
    # this round (optimization-only), so the least-recently-checked
    # cohort leads: ALL 19 remaining round-8 rows (last oracle-checked
    # in round 8), in their round-8 window order:
    "q_e8_sliding_chunks",
    "q_e8_softdedup_weights",
    "q_e8_token_budget",
    "q_tf_zorder_pruned_read",
    "q_tf_stats_agg",
    "q_e8_dsir_weights",
    "q_e8_dsir_sample",
    "q_e8_dsir_bigram_weights",
    "q_tf_snapshots",
    "q_e4_incremental_model_quality",
    "q_e4_bm25_topk",
    "q_e3_hybrid_rrf",
    "q_e2_jaccard_neardup",
    "q_e4_fingerprint",
    "q_tpch_q18_large_volume_customer",
    "q_agg_count_distinct",
    "q_agg_groupby_lineitem",
    "q_join_anti_customers_without_orders",
    "q_join_three_way",
    # Family canaries (least-recently-checked oracle member of each
    # family not already covered above; sole members stay by
    # necessity — q_w_sessionize covers both the sessionize and
    # window-function families):
    "q_e1_exact_dedup",
    "q_e5_multimodal_meta",  # r9 (oldest e5)
    "q_e6_timeseries_similarity",
    "q_e7_curation_quality_rep",  # r9 (oldest e7)
    "q_asof_join_purchase_view",
    "q_range_join_purchase_errors",
    "q_w_sessionize",
    # ...then the head of the round-9 cohort (42 rows last checked in
    # round 9; the first 23 in round-9 window order fill the window —
    # the rest, from q_e4_lang_id onward, lead round 14's rotation):
    "q_tf_deletion_vectors",
    "q_tf_point_lookup",
    "q_e4_incremental_bm25",
    "q_tf_merge_full_sync",
    "q_e3_ann_cosine_topk",
    "q_agg_cube",
    "q_agg_having",
    "q_agg_rollup",
    "q_join_right_orders_customer",
    "q_join_semi_customers_with_orders",
    "q_w_lag_lead",
    "q_w_row_number_rank",
    "q_w_running_sum",
    "q_x10_json_parse",
    "q_x11_url_parse",
    "q_x12_null_coalesce",
    "q_x13_trim",
    "q_x4_try_cast_skip",
    "q_x5_timestamp_text",
    "q_x6_node_id_concat",
    "q_x7_lowercase",
    "q_x8_aes_roundtrip",
    "q_x9_utf8_encode",
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
