#!/usr/bin/env python
"""Hostile-config parity: run the FULL driver contract under perf knobs
chosen to shake out plans that are only accidentally correct — AQE off,
a prime shuffle partition count that matches nothing, and a thread
count far from the tuned local[32]:

    local[5], spark.sql.shuffle.partitions=7,
    spark.sql.adaptive.enabled=false (+ coalesce/skewJoin off)

The SEMANTIC configs (UTC session timezone, nanosAsLong, NTZ inference
off, Arrow on) stay exactly as in ``session.get_spark`` — those encode
data-format facts, not tuning. Every registered query must value-match
its DuckDB oracle just as in the quiet run; a pass proves correctness
is invariant to the perf knobs rather than tuned into them.

Usage::

    python scripts/verify_hostile.py                    # sf0.01
    python scripts/verify_hostile.py /root/testdata/sf0.1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from pyspark.sql import SparkSession

    (
        SparkSession.builder.master("local[5]")
        .appName("verify_hostile")
        .config("spark.sql.shuffle.partitions", "7")
        .config("spark.default.parallelism", "7")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "false")
        # semantic configs — identical to session.get_spark
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    # verify_contract's get_spark call reuses this session via getOrCreate
    import verify_contract

    return verify_contract.main()


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    raise SystemExit(main())
