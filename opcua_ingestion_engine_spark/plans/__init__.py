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
    # The only oracle queries without a lifetime driver row (registered
    # after the round-9 window froze — first in line per the standing
    # rotation rule), then the four NEW round-10 oracle queries:
    # DV-sidecar consolidation, the keyless mor-upsert change feed, the
    # table-as-streaming-source twin (shares the mor feed's oracle
    # verbatim — streaming == batch IS the check), and CHECK constraints.
    "q_tf_sum_agg",
    "q_tf_upsert_mor",
    "q_tf_consolidate_dv",
    "q_tf_changefeed_mor",
    "q_tf_stream_changefeed",
    "q_tf_check_constraints",
    # Family canaries: the LEAST-recently-checked oracle member of each
    # family not already covered by the backfill cohort below
    # (tests/test_registry_window.py pins one per family).
    "q_e1_exact_dedup",  # r9 (sole e1 member)
    "q_e5_frame_sample",  # r8 (oldest e5)
    "q_e6_timeseries_similarity",  # r9 (sole e6 member)
    "q_e7_curation_quality_rep",  # r7 (oldest e7)
    "q_asof_join_purchase_view",  # r9 (sole-family asof)
    "q_range_join_purchase_errors",  # r9 (sole-family range)
    "q_w_sessionize",  # r9 (covers sessionize + windows patterns)
    # Round-10 rotation (round-9 verdict item 2): the least-recently-
    # checked cohort — every row last driver-checked in round 5, then
    # as much of the round-6 cohort as fits (the q_tf_change_feed*
    # rows jump their cohort order because this round's mor-upsert
    # fast path touches exactly that machinery). All rotated-out
    # members keep their lifetime green rows and stay oracle-checked
    # every round via verify_contract / test_parity.
    "q_f1_monitored_devices",
    "q_f3_staleness_filter",
    "q_t_downsample_ohlc",
    "q_t_multires_rollup",
    "q_t_funnel_conversion",
    "q_t_cohort_retention",
    "q_e8_split_assignment",
    "q_e8_stratified_sample",
    "q_e8_contamination",
    "q_e4_pii_redact",
    "q_e4_repetition",
    "q_e4_token_entropy",
    "q_e8_global_shuffle",
    "q_e8_quality_topk",
    "q_e8_epoch_expand",
    # round-6 cohort (21 of 34; the remaining 13 lead round 11's queue)
    "q_a2_latest_per_key",
    "q_s9_upsert_matched",
    "q_b1_browse_tree",
    "q_sort_topk_orders",
    "q_set_intersect",
    "q_t10_session_window",
    "q_e2_repeated_spans",
    "q_e2_incremental_spans",
    "q_e2_durable_spans",
    "q_e2_span_trim",
    "q_e2_incremental_span_trim",
    "q_e3_domain_diversity",
    "q_s8_default_injection",
    "q_tpch_q5_local_supplier_volume",
    "q_t_anomaly_zscore",
    "q_tpch_q7_volume_shipping",
    "q_tpch_q8_market_share",
    "q_tpch_q9_product_profit",
    "q_tf_change_feed",
    "q_tf_change_feed_append",
    "q_tf_incremental_view",
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
