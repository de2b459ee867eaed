"""Query registry — the driver-checked surface.

One entry per implemented operator from SURVEY.md §2. Each entry pairs a
Spark callable ``(spark, sf_dir) -> DataFrame`` with an equivalent DuckDB
oracle SQL string (or ``None`` for non-SQL-expressible ops, which get the
driver's weaker rows-only check).

Column names are aliased identically on both sides — the driver sorts
columns by name before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .. import catalog as C
from ..functions.timefmt import SQL_MODVALUES_TS_FMT  # noqa: F401 (used by oracle strings)
from ..operators import ingest


@dataclass(frozen=True)
class Query:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str = ""


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        QUERIES[name] = Query(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}


def _fixtures(spark: SparkSession, sf_dir: str):
    return dict(
        updates=C.opc_updates(spark, sf_dir),
        devices=C.site_devices(spark, sf_dir),
        templates=C.sos_templates(spark),
        connections=C.opc_client_connections(spark),
    )


# ---------------------------------------------------------------------------
# Flagship — SURVEY.md §7 Phase 1
# ---------------------------------------------------------------------------

_FLAGSHIP_ORACLE = C.with_fixture_ctes("""
    , joined AS (
        SELECT u.*, d.device_type, t.unit, t.scale_mode, t.slope, t."offset",
               t.factor, t.target_min
        FROM opc_updates u
        JOIN opc_connections c USING (conn_id)
        JOIN site_devices d
          ON u.daq_name = d.daq_name AND d.monitored AND d.protocol = 'OPCUA'
        JOIN sos_templates t
          ON t.device_type = d.device_type AND t.template_name = d.daq_template
         AND t.measure_name = u.measure_name
        WHERE u.measure_name <> 'myPV_online'
          AND abs(epoch_us(u.received_ts) - epoch_us(u.source_ts)) / 1000.0 <= c.timeout_ms
    ),
    latest_good AS (
        SELECT * FROM (
            SELECT j.*, row_number() OVER (
                PARTITION BY daq_name, measure_name
                ORDER BY received_ts DESC, event_id DESC) AS rn
            FROM joined j WHERE status_code = 0)
        WHERE rn = 1
    ),
    value_rows AS (
        SELECT daq_name AS device, device_type, tag_name,
               scaled_value AS tag_value, measure_name,
               scaled_value AS measure_value,
               unit AS source_unit, unit AS destination_unit,
               strftime(received_ts, '%Y-%m-%dT%H:%M:%S.%f') AS last_updated,
               'instant' AS logging
        FROM (
            SELECT l.*,
                   CAST(CASE l.scale_mode
                        WHEN 'slope_intercept'
                            THEN round(CAST(l.value AS DECIMAL(18,6)) * l.slope + l."offset", 3)
                        WHEN 'point_slope'
                            THEN round(CAST(l.value AS DECIMAL(18,6)) * l.factor + l.target_min, 3)
                        ELSE CAST(l.value AS DECIMAL(18,6))
                   END AS DOUBLE) AS scaled_value
            FROM latest_good l)
    ),
    plan_points AS (
        SELECT d.daq_name, d.device_type, t.tag_name, t.measure_name, t.unit
        FROM site_devices d
        JOIN sos_templates t
          ON t.device_type = d.device_type AND t.template_name = d.daq_template
        WHERE d.monitored AND d.protocol = 'OPCUA'
    ),
    seed_rows AS (
        SELECT p.daq_name AS device, p.device_type, p.tag_name,
               0.0 AS tag_value, p.measure_name, 0.0 AS measure_value,
               p.unit AS source_unit, p.unit AS destination_unit,
               '1970-01-01T00:00:00.000000' AS last_updated,
               'instant' AS logging
        FROM plan_points p
        WHERE NOT EXISTS (
            SELECT 1 FROM latest_good l
            WHERE l.daq_name = p.daq_name AND l.measure_name = p.measure_name)
    ),
    last_event AS (
        SELECT * FROM (
            SELECT daq_name, status_code, received_ts, row_number() OVER (
                PARTITION BY daq_name
                ORDER BY received_ts DESC, event_id DESC) AS rn
            FROM joined)
        WHERE rn = 1
    ),
    live AS (
        SELECT d.daq_name, d.device_type, le.received_ts AS last_ts,
               CAST(CASE WHEN le.status_code = 0
                         AND epoch_us((SELECT max(received_ts) FROM joined))
                             - epoch_us(le.received_ts) <= 60 * 1000000
                    THEN 1.0 ELSE 0.0 END AS DOUBLE) AS online
        FROM (SELECT daq_name, device_type FROM site_devices
              WHERE monitored AND protocol = 'OPCUA') d
        LEFT JOIN last_event le USING (daq_name)
    ),
    online_rows AS (
        SELECT daq_name AS device, device_type,
               'myPV_online' AS tag_name, online AS tag_value,
               'myPV_online' AS measure_name, online AS measure_value,
               'bool' AS source_unit, 'bool' AS destination_unit,
               coalesce(strftime(last_ts, '%Y-%m-%dT%H:%M:%S.%f'),
                        '1970-01-01T00:00:00.000000') AS last_updated,
               'instant' AS logging
        FROM live
    )
    SELECT * FROM value_rows
    UNION ALL SELECT * FROM seed_rows
    UNION ALL SELECT * FROM online_rows
""")


@register(
    "q_flagship_modvalues",
    _FLAGSHIP_ORACLE,
    "SURVEY.md §7 Phase 1: latest scaled value + liveness per (device, measure)",
)
def q_flagship_modvalues(spark: SparkSession, sf_dir: str) -> DataFrame:
    fx = _fixtures(spark, sf_dir)
    return ingest.modvalues_snapshot(
        fx["updates"], fx["devices"], fx["templates"], fx["connections"]
    )
