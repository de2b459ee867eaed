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
    # Round-8 rotation (round-7 verdict item 1): the five oracle queries
    # registered AFTER the round-7 window froze take slots first — after
    # this rotation every oracle-checkable query in the registry has a
    # lifetime driver-green row. All rotated-out members remain
    # oracle-checked every round via verify_contract / test_parity.
    "q_e3_embedding_profile",
    "q_e8_sliding_chunks",
    "q_e8_softdedup_weights",
    "q_e8_token_budget",
    "q_tf_zorder_pruned_read",
    # New round-8 oracle queries (registered this round, checked this
    # round).
    "q_e4_model_quality",
    "q_tf_stats_agg",
    "q_e8_dsir_weights",
    "q_e8_dsir_sample",
    "q_e8_dsir_bigram_weights",
    "q_tf_snapshots",
    "q_e4_incremental_model_quality",
    "q_e4_bm25_topk",
    "q_e3_hybrid_rrf",
    # Family canaries: the LEAST-recently-checked oracle member of each
    # operator family (tests/test_registry_window.py pins one per
    # family), so a regression in shared family machinery surfaces in
    # the driver artifact, not just pytest.
    "q_e1_exact_dedup",  # r7
    "q_e2_jaccard_neardup",  # r4
    "q_e4_fingerprint",  # r4
    "q_e5_frame_sample",  # r6
    "q_e6_timeseries_similarity",  # r7
    "q_e7_curation_clustered",  # r4
    "q_tpch_q18_large_volume_customer",  # r4
    "q_asof_join_purchase_view",  # r7
    "q_range_join_purchase_errors",  # r7
    "q_w_sessionize",  # r7
    # Freshness backfill: the round-2-era cohort (43 queries whose only
    # driver row is three regenerations of testdata ago) rotates back
    # in oldest-first — re-verifying old greens against the CURRENT
    # parquet fixtures, since the driver regenerates testdata between
    # rounds and physical schema drift has bitten before (TIMESTAMP
    # NANOS -> MICROS in round 2).
    "q_a1_distinct_devices",
    "q_a3_device_liveness",
    "q_a4_rowcount_effects",
    "q_agg_count_distinct",
    "q_agg_groupby_lineitem",
    "q_f10_projection",
    "q_f2_change_only",
    "q_f4_quality_split",
    "q_f5_self_measure_exclusion",
    "q_f6_browse_exclusion",
    "q_f7_node_class",
    "q_f8_online_probe",
    "q_f9_row_existence",
    "q_j1_device_points",
    "q_j2_device_server_urls",
    "q_j4_connection_exclusions",
    "q_j5_venn_reconcile",
    "q_j7_heartbeat_lockset",
    "q_join_anti_customers_without_orders",
    "q_join_full_nation_supplier",
    "q_join_inner_orders_customer",
    "q_join_left_customer_orders",
    "q_join_three_way",
    "q_s10_insert_if_missing",
    "q_s11_bulk_reset",
    # (q_w_lag_lead / q_w_row_number_rank /
    # q_join_semi_customers_with_orders / q_join_right_orders_customer /
    # q_agg_cube / q_agg_rollup / q_agg_having yield their backfill
    # slots to the round-8 DSIR, snapshots, streaming-quality-gate,
    # BM25, and hybrid-RRF queries; all keep their lifetime r2 green
    # rows and stay oracle-checked in pytest via verify_contract.)
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
