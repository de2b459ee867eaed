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
    # Round-12 rotation (round-11 verdict item 1). New oracle queries
    # take slots first per the standing rule:
    "q_tf_stream_ratelimited",
    "q_e2_semdedup_serve",
    "q_tf_compact_small",
    # ...then ALL 16 round-7 rows — the least-recently-checked cohort
    # (the round-11 verdict recounted the recorded 15 to 16):
    "q_tf_upsert_partial",
    "q_tpch_q10_returned_items",
    "q_tpch_q11_important_stock",
    "q_tpch_q13_customer_distribution",
    "q_tpch_q15_top_supplier",
    "q_tpch_q16_supplier_cnt",
    "q_tpch_q17_small_qty_revenue",
    "q_tpch_q1_pricing_summary",
    "q_tpch_q20_potential_promotion",
    "q_tpch_q22_sales_opportunity",
    "q_tpch_q2_min_cost_supplier",
    "q_tpch_q4_order_priority",
    "q_validate_orders",
    "q_x1_slope_intercept",
    "q_x_array_hof",
    "q_x_unpivot",
    # Family canaries (least-recently-checked oracle member of each
    # family not already covered above; sole members stay by
    # necessity — q_w_sessionize covers both the sessionize and
    # window-function families):
    "q_e1_exact_dedup",
    "q_e3_embedding_profile",  # r8 (oldest e3)
    "q_e4_model_quality",  # r8 (oldest e4)
    "q_e5_frame_sample",  # r10 (oldest e5)
    "q_e6_timeseries_similarity",
    "q_e7_curation_pipeline",  # r9 (oldest e7)
    "q_asof_join_purchase_view",
    "q_range_join_purchase_errors",
    "q_w_sessionize",
    # ...then the head of the round-8 cohort (42 rows last checked in
    # round 8; the first 21 in registry order fill the window — the
    # rest, from q_join_anti_customers_without_orders onward in
    # registry order, lead round 13's rotation):
    "q_f2_change_only",
    "q_f4_quality_split",
    "q_f5_self_measure_exclusion",
    "q_f6_browse_exclusion",
    "q_f7_node_class",
    "q_f8_online_probe",
    "q_f9_row_existence",
    "q_f10_projection",
    "q_j1_device_points",
    "q_j2_device_server_urls",
    "q_j4_connection_exclusions",
    "q_j5_venn_reconcile",
    "q_j7_heartbeat_lockset",
    "q_a1_distinct_devices",
    "q_a3_device_liveness",
    "q_a4_rowcount_effects",
    "q_s10_insert_if_missing",
    "q_s11_bulk_reset",
    "q_join_inner_orders_customer",
    "q_join_left_customer_orders",
    "q_join_full_nation_supplier",
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
