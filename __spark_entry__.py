"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (SURVEY.md §7 Phase 1) on sf0.001;
``queries()``/``oracle_sql()`` expose the operator inventory from SURVEY.md §2,
registered in ``opcua_ingestion_engine_spark.plans.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opcua_ingestion_engine_spark import plans  # noqa: E402


def _ensure_nanos_conf(spark: SparkSession) -> None:
    # events.parquet stores TIMESTAMP(NANOS); see catalog.load_table.
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception as exc:  # immutable at runtime on some builds
        print(
            "WARNING: could not set spark.sql.legacy.parquet.nanosAsLong "
            f"({exc}); events.parquet TIMESTAMP(NANOS) reads may fail",
            file=sys.stderr,
        )
    try:
        # Naive parquet timestamps must surface as TIMESTAMP (LTZ), not
        # TIMESTAMP_NTZ — operators use LTZ-only functions (unix_micros,
        # window); catalog.load_table also normalizes defensively.
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception as exc:
        print(
            f"WARNING: could not disable parquet TIMESTAMP_NTZ inference ({exc}); "
            "catalog.load_table will cast NTZ columns instead",
            file=sys.stderr,
        )
    try:
        # DuckDB oracle timestamps are naive/UTC; keep date_format and
        # window bucketing UTC-stable under a driver-owned session too.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception as exc:
        print(
            f"WARNING: could not set spark.sql.session.timeZone=UTC ({exc}); "
            "formatted-timestamp oracle comparisons may diverge",
            file=sys.stderr,
        )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: latest scaled value + device liveness per (device, measure)
    — the current-state `modvalues` snapshot the reference perpetually
    maintains (SURVEY.md §3.1)."""
    _ensure_nanos_conf(spark)
    return plans.QUERIES["q_flagship_modvalues"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    base = plans.queries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ensure_nanos_conf(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    return plans.oracle_sql()
