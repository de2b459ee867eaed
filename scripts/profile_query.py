"""Per-query profiling: where does a bench row's wall time go?

Usage: python scripts/profile_query.py q_name [q_name ...]

Runs each query once (warm session), materializing through the noop sink
exactly like bench.py, under cProfile — the cumulative table splits
driver-side work (pyarrow footer/stat/bloom reads, json manifests) from
Spark job wait (socket recv). Top entries are printed per query.
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    os.environ.setdefault("SPARK_GRAFT_SEMDEDUP_AUDIT", "0")

    from opcua_ingestion_engine_spark import plans
    from opcua_ingestion_engine_spark.session import get_spark

    spark = get_spark("profile-query")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm-up: JVM JIT + codegen, same as bench.py.
    plans.QUERIES["q_flagship_modvalues"].fn(spark, SF_DIR).write.format(
        "noop"
    ).mode("overwrite").save()

    for name in names:
        spark.sparkContext.setJobGroup(f"profile:{name}", name)
        pr = cProfile.Profile()
        t0 = time.perf_counter()
        pr.enable()
        df = plans.QUERIES[name].fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        pr.disable()
        wall = time.perf_counter() - t0
        tracker = spark.sparkContext.statusTracker()
        n_jobs = len(tracker.getJobIdsForGroup(f"profile:{name}"))
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        ps.print_stats(35)
        print(f"\n===== {name}: wall {wall:.3f}s, spark_jobs={n_jobs} =====")
        print(s.getvalue())


if __name__ == "__main__":
    main()
