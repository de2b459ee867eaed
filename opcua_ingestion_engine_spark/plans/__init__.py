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
    # Flagship first — unchanged from rounds 1-2.
    "q_flagship_modvalues",
    # Reference-core IDs that had no driver row in round 2 (S3/S4/S8/T3/X1-X3).
    "q_s3_template_scan",
    "q_s4_device_scan",
    "q_s8_default_injection",
    "q_t3_heartbeat_refresh",
    "q_x1_slope_intercept",
    "q_x2_point_slope_general",
    "q_x3_scale_dispatch",
    # LLM-pipeline operators E1-E7 (every oracle-checked entry).
    "q_e1_exact_dedup",
    "q_e2_jaccard_neardup",
    "q_e2_dedup_clusters",
    "q_e2_embedding_neardup",
    "q_e3_ann_cosine_topk",
    "q_e4_text_stats",
    "q_e4_lang_id",
    "q_e4_quality_filter",
    "q_e4_winnowing",
    "q_e4_sentiment",
    "q_e4_token_count",
    "q_e4_fingerprint",
    "q_e4_pattern_extract",
    "q_e5_multimodal_meta",
    "q_e5_frame_sample",
    "q_e6_timeseries_similarity",
    "q_e7_curation_pipeline",
    "q_e7_curation_clustered",
    # Headline TPC-H.
    "q_tpch_q1_pricing_summary",
    "q_tpch_q3_shipping_priority",
    "q_tpch_q5_local_supplier_volume",
    "q_tpch_q6_forecast_revenue",
    "q_tpch_q18_large_volume_customer",
    "q_tpch_q21_waiting_suppliers",
    # Time-series join trio + window/streaming-analogue extensions.
    "q_asof_join_purchase_view",
    "q_range_join_purchase_errors",
    "q_w_sessionize",
    "q_w_ntile_dist",
    "q_t10_tumbling_window",
    # E8 capstone: the composed corpus build (exact dedup -> quality ->
    # decontamination -> split manifest) — displaces the top-k sort rep,
    # which stays pytest- and contract-checked.
    "q_e8_corpus_build",
    # Round-3 operator families, one oracle-checked representative each
    # (displacing the second/third sort/set reps, which stay pytest- and
    # contract-checked): exact heavy hitters (MG sketch + verify), the
    # continuous-aggregate cascade, and the windowed funnel.
    "q_e4_heavy_hitters",
    "q_t_multires_rollup",
    # E8 dataset-assembly family (new in round 3) — driver-checked from
    # its first round.
    "q_e8_split_assignment",
    "q_e8_stratified_sample",
    "q_e8_contamination",
    "q_e8_pack_chunks",
    "q_t_funnel_conversion",
    # Core sample that was driver-green in round 2 (regression canaries).
    "q_f1_monitored_devices",
    "q_f3_staleness_filter",
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
