"""opcua_ingestion_engine_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of ``solarops/opcua_ingestion_engine``.

The reference (surveyed in /root/repo/SURVEY.md) is a .NET OPC UA -> PostgreSQL
telemetry ingester: a config-driven device/point catalog, a telemetry update
stream with staleness + quality filtering, unit-scaling transforms,
last-write-wins current-value state keyed by (device, measure), device liveness
with heartbeats/watchdogs, node-tree browsing, and config reconciliation.

This package re-expresses those semantics Spark-first:

- ``catalog``    — config/fixture derivation (devices, templates, connections,
                   the ``opc_updates`` telemetry stream) as DataFrames plus
                   matching DuckDB SQL snippets for oracle checks.
- ``functions``  — scalar column expressions (scaling X1-X3, timestamp format
                   X5, casts X4, ...). Pure ``Column -> Column``; no UDFs.
- ``operators``  — DataFrame -> DataFrame operators (filters F1-F10, joins
                   J1-J7, aggregations A1-A4, merge/upsert S9-S11, browse
                   B1-B4, reconcile J5, and the [EXT] scale operators:
                   dedup + connected-component clustering, similarity
                   search, text analysis, multimodal, as-of/range joins +
                   sessionization, composed corpus curation).
- ``sources``    — file-backed config loaders (S3/S4 nested-JSON catalogs
                   via from_json + map explode, S5 connection config; S6
                   hot reload falls out of re-reading per call).
- ``streaming``  — Structured Streaming composition of the same operators
                   (events replayer, foreachBatch merge sink, liveness).
- ``plans``      — the query registry: one ``queries()`` +
                   ``oracle_sql()`` entry per SURVEY.md §2 operator ID.

Design stance (SURVEY.md §7): batch-first DataFrame library + thin streaming
layer; every operator is a pure function testable against DuckDB; streaming
composes the same functions. No custom Catalyst rules are needed — the
reference's hand optimizations are all subsumed by Catalyst (SURVEY.md §4).
"""

__version__ = "0.1.0"
