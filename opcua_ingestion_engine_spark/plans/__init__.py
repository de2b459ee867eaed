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
    # New round-9 oracle queries (registered this round, checked this
    # round): deletion vectors, bloom point lookup, the maintained
    # inverted index, and the three-clause full-sync MERGE.
    "q_tf_deletion_vectors",
    "q_tf_point_lookup",
    "q_e4_incremental_bm25",
    "q_tf_merge_full_sync",
    # Family canaries: the LEAST-recently-checked oracle member of each
    # operator family (tests/test_registry_window.py pins one per
    # family), so a regression in shared family machinery surfaces in
    # the driver artifact, not just pytest. (e2/e4/e7/tpch/windows/
    # reference_core are covered by the backfill cohort below.)
    "q_e1_exact_dedup",  # r8 (sole e1 member)
    "q_e3_ann_cosine_topk",  # r6
    "q_e5_multimodal_meta",  # r7
    "q_e6_timeseries_similarity",  # r8 (sole e6 member)
    "q_asof_join_purchase_view",  # r8 (oldest asof)
    "q_range_join_purchase_errors",  # r8 (oldest range)
    "q_w_sessionize",  # r8 (sole sessionize)
    # Round-9 rotation (round-8 verdict item 2): the LEAST-recently-
    # checked oracle rows, oldest first — the round-2 cohort (scalar
    # functions, extended joins/aggs/windows, three testdata
    # regenerations old), then round-4, then the three oldest round-5
    # members (q_e7_curation_pipeline keeps e7 family coverage). All
    # rotated-out members keep their lifetime green rows and stay
    # oracle-checked every round via verify_contract / test_parity.
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
    "q_e4_lang_id",
    "q_e4_pattern_extract",
    "q_e4_quality_filter",
    "q_e4_sentiment",
    "q_e4_text_stats",
    "q_e4_token_count",
    "q_e4_winnowing",
    "q_e8_pack_chunks",
    "q_s4_device_scan",
    "q_t10_tumbling_window",
    "q_t3_heartbeat_refresh",
    "q_tpch_q21_waiting_suppliers",
    "q_tpch_q3_shipping_priority",
    "q_tpch_q6_forecast_revenue",
    "q_w_ntile_dist",
    "q_x2_point_slope_general",
    "q_x3_scale_dispatch",
    "q_e2_dedup_clusters",
    "q_e7_curation_pipeline",
    "q_e2_embedding_neardup",
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
