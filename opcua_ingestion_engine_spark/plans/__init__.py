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
    # LLM-pipeline operators E1-E7. Round-5 rotation: the six long-stable
    # E4 text canaries (lang_id/winnowing/sentiment/token_count/fingerprint/
    # pattern_extract) and jaccard/curation_clustered step out (all were
    # driver-green in rounds 3-4 and stay oracle-parity-tested in pytest);
    # the round-3 families that never had a driver row step in.
    # Round-5 substring-dedup family (new this round): first driver rows
    # for the span report, its apply step, and the incremental twin —
    # displacing q_e4_text_stats / q_e4_quality_filter / q_e8_pack_chunks
    # (driver-green rounds 3-4, still oracle-parity-tested in pytest).
    "q_e1_exact_dedup",
    "q_e2_repeated_spans",
    "q_e2_span_trim",
    "q_e2_incremental_spans",
    "q_e2_dedup_clusters",
    "q_e2_embedding_neardup",
    "q_e3_ann_cosine_topk",
    "q_e3_domain_diversity",
    "q_e4_pii_redact",
    "q_e4_repetition",
    "q_e4_unigram_logprob",
    "q_e4_token_entropy",
    "q_e4_heavy_hitters",
    "q_e4_incremental_heavy_hitters",
    "q_e5_multimodal_meta",
    "q_e5_frame_sample",
    "q_e6_timeseries_similarity",
    "q_e7_curation_pipeline",
    # Headline TPC-H (q3/q6/q18/q21 rotated out after two driver-green
    # rounds; q1/q5 stay as the complex-agg and 6-way-join canaries).
    "q_tpch_q1_pricing_summary",
    "q_tpch_q5_local_supplier_volume",
    # Time-series join trio + window extensions (range_frame gets its first
    # driver row; ntile_dist/tumbling rotate out).
    "q_asof_join_purchase_view",
    "q_range_join_purchase_errors",
    "q_w_sessionize",
    "q_w_range_frame",
    "q_agg_mode_per_group",
    # Telemetry-analytics family (round 3) — first driver rows for the
    # z-score anomaly envelope, OHLC downsample, cohort retention, and the
    # incremental continuous-aggregate rollup.
    "q_t_anomaly_zscore",
    "q_t_downsample_ohlc",
    "q_t_cohort_retention",
    "q_t_incremental_rollup",
    "q_t_multires_rollup",
    "q_t_funnel_conversion",
    # E8 dataset-assembly family — round-3 training-mix completions get
    # their first driver rows alongside the established members.
    "q_e8_corpus_build",
    "q_e8_incremental_corpus_build",
    "q_e8_domain_mix",
    "q_e8_global_shuffle",
    "q_e8_quality_topk",
    "q_e8_epoch_expand",
    "q_e8_split_leakage",
    "q_e8_split_assignment",
    "q_e8_stratified_sample",
    "q_e8_contamination",
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
