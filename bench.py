"""Benchmark harness — the driver's per-round perf feedback loop.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints exactly
ONE JSON line::

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Each query is materialized through the JVM-only ``noop`` sink (no driver
collect, no Python serialization) so the timing reflects the Spark plan, not
pandas conversion. A warm-up pass (flagship only) absorbs JVM/codegen
first-run cost; reported numbers are the timed pass.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the flagship pipeline plus the heaviest representatives of
# each operator family (agg, window, join, dedup/LSH, ANN, text analysis).
# Any name not in the registry is silently skipped so bench.py never breaks
# while coverage is still growing.
HEADLINE = [
    "q_flagship_modvalues",
    "q_agg_groupby_lineitem",
    "q_w_running_sum",
    "q_join_three_way",
    "q_tpch_q5_local_supplier_volume",
    "q_tpch_q21_waiting_suppliers",
    "q_f2_change_only",
    "q_asof_join_purchase_view",
    "q_w_sessionize",
    "q_e2_minhash_neardup",
    "q_e2_simhash_neardup",
    "q_e8_contamination",
    "q_e8_corpus_build",
    "q_e4_heavy_hitters",
    "q_t_multires_rollup",
    "q_e7_curation_pipeline",
    "q_e3_ann_cosine_topk",
    "q_e4_text_stats",
    "q_e6_timeseries_similarity",
    "q_b1_browse_tree",
]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    from opcua_ingestion_engine_spark.session import get_spark
    from opcua_ingestion_engine_spark import plans

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in plans.QUERIES]
    # Warm-up: JVM JIT + codegen + parquet footer caches.
    _materialize(plans.QUERIES["q_flagship_modvalues"].fn(spark, SF_DIR))

    # min of 2 runs per query: the first run pays one-time Janino codegen
    # compilation (~1.5-2s for the widest aggregates), which amortizes away
    # in any long-lived deployment — the min reflects the plan, not the
    # compiler. Same protocol every round, so round-over-round deltas stay
    # comparable.
    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _materialize(plans.QUERIES[name].fn(spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    sf = 0.1
    tail = os.path.basename(SF_DIR.rstrip("/"))
    if tail.startswith("sf"):
        try:
            sf = float(tail[2:])
        except ValueError:
            pass

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
