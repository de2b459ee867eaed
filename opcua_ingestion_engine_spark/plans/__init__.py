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
    # Flagship first — unchanged from rounds 1-4.
    "q_flagship_modvalues",
    # Reference-core IDs (S3/S8/X1 kept as canaries; S4/T3/X2/X3 rotated out
    # in round 5 after two consecutive driver-green rounds — they remain
    # pytest-pinned).
    "q_s3_template_scan",
    "q_s8_default_injection",
    "q_x1_slope_intercept",
    # LLM-pipeline operators E1-E7. Round-6 rotation (per the round-5
    # verdict): multi-round-green members step out (dedup_clusters,
    # embedding_neardup, repetition, pii_redact, token_entropy,
    # contamination, split_assignment, stratified_sample, epoch_expand,
    # curation_pipeline, global_shuffle, quality_topk — all stay
    # oracle-parity-tested in pytest); the never-driver-checked round-5
    # table-layer + durable-sink families step in for their first driver
    # rows. q_e1_exact_dedup stays as the E1 family representative
    # (tests/test_registry_window.py pins one member per family).
    "q_e1_exact_dedup",
    "q_e2_repeated_spans",
    "q_e2_span_trim",
    "q_e2_incremental_spans",
    "q_e2_durable_spans",
    "q_e2_incremental_span_trim",
    "q_e3_ann_cosine_topk",
    "q_e3_domain_diversity",
    "q_e4_unigram_logprob",
    "q_e4_heavy_hitters",
    "q_e4_incremental_heavy_hitters",
    "q_e5_multimodal_meta",
    "q_e5_frame_sample",
    "q_e6_timeseries_similarity",
    # E7 representative: the round-6 quality-rep mode (never checked).
    "q_e7_curation_quality_rep",
    # Versioned-table layer (round-5 code, first driver exposure round 6).
    "q_tf_change_feed",
    "q_tf_change_feed_append",
    "q_tf_incremental_view",
    # Headline TPC-H: q1/q5 stay as the complex-agg and 6-way-join
    # canaries; the join-heaviest never-driver-checked body members
    # (q7/q8/q9/q12/q14/q19) get their first slots per verdict item 5.
    "q_tpch_q1_pricing_summary",
    "q_tpch_q5_local_supplier_volume",
    "q_tpch_q7_volume_shipping",
    "q_tpch_q8_market_share",
    "q_tpch_q9_product_profit",
    "q_tpch_q12_priority_classes",
    "q_tpch_q14_promo_effect",
    "q_tpch_q19_disjunctive_revenue",
    # Time-series joins, window/sort/set extensions — session window,
    # top-k and one set op get their first driver rows (round-6 rotation).
    "q_asof_join_purchase_view",
    "q_range_join_purchase_errors",
    "q_w_sessionize",
    "q_w_range_frame",
    "q_agg_mode_per_group",
    "q_t10_session_window",
    "q_sort_topk_orders",
    "q_set_intersect",
    # Telemetry-analytics family (round 3) — first driver rows for the
    # z-score anomaly envelope, OHLC downsample, cohort retention, and the
    # incremental continuous-aggregate rollup.
    "q_t_anomaly_zscore",
    "q_t_incremental_rollup",
    # Telemetry reports that never held a window slot (round-6 rotation).
    "q_t_downtime_report",
    "q_t4_server_watchdog_batch",
    # E8 dataset-assembly family — round-5 entrants keep their slot for a
    # second green round; the durable corpus build gets its first row.
    "q_e8_corpus_build",
    "q_e8_incremental_corpus_build",
    "q_e8_durable_corpus_build",
    "q_e8_domain_mix",
    "q_e8_split_leakage",
    # Core sample that was driver-green in round 2 (regression canaries).
    "q_a2_latest_per_key",
    "q_s9_upsert_matched",
    "q_b1_browse_tree",
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
