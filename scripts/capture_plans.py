"""Capture .explain("formatted") for headline queries into plans/r12/.

Usage:
    python scripts/capture_plans.py before [name ...]
    python scripts/capture_plans.py after  [name ...]

With no names, captures every bench HEADLINE query. Each query's plan is
written to plans/r12/<name>_<tag>.txt. Building a query's DataFrame may
execute its setup side effects (table commits, streaming drains) — that is
the same work bench.py pays, so capture is run off the timed path.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def explain_str(spark, df, mode: str = "formatted") -> str:
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]

    import bench
    from opcua_ingestion_engine_spark import plans
    from opcua_ingestion_engine_spark.session import get_spark

    # Match the bench environment exactly (semdedup audit off, etc.).
    os.environ.setdefault("SPARK_GRAFT_SEMDEDUP_AUDIT", "0")

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")

    if not names:
        names = [n for n in bench.HEADLINE if n in plans.QUERIES]

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r12",
    )
    os.makedirs(out_dir, exist_ok=True)

    for name in names:
        spark.sparkContext.setJobDescription(f"capture:{name}")
        df = plans.QUERIES[name].fn(spark, SF_DIR)
        text = explain_str(spark, df)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} bytes)")
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
