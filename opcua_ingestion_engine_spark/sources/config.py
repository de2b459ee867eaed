"""JSON config-file sources (SURVEY.md §2.1 S3/S4/S5/S6).

The reference loads three JSON config files at startup and on
FileSystemWatcher change events:

- S3 ``LoadOpcTemplates`` — ``sos_templates_opcua.json``: nested
  ``deviceType -> templateName -> [point]`` dicts
  (``Services/OpcSubscribeService.cs:472-475``).
- S4 ``LoadSiteDevices`` — ``site_devices.json``:
  ``deviceType -> [device]`` with per-device ``Network.Params``
  (``:477-480``; model ``Models/OpcDevice.cs:7-39``).
- S5 ``LoadConnectionString`` — ``plant_config.json`` -> DB connection
  string (``:482-497``, ``Helpers/OpcuaHelperFunctions.cs:67-71``).
- S6 hot reload — the watcher re-invokes the matching loader on change
  (``:83-95,499-518``).

Spark-first: the dynamic-key nesting is parsed with ``from_json`` into
``MapType`` columns and flattened with map ``explode`` (X10) — one small
driver-read file becomes a broadcastable dimension frame. Hot reload (S6)
falls out for free: every loader call re-reads the file (no caching in
this layer), so a batch-per-trigger ``foreachBatch`` that calls a loader
sees config changes on the next micro-batch.

The registered S3/S4 catalog queries use the synthesized in-memory
fixtures (driver testdata has no config files); these loaders are the
file-backed production path and are pinned by tests/test_config_sources.py
to produce frames identical to those fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# One point of a template (Models/OpcTemplates.cs:30-56; AutoScaling
# flattened into the point row). Numeric scale params arrive as JSON
# numbers and are cast to the catalog's exact DECIMAL types.
_POINT_SCHEMA = (
    "array<struct<tag_name:string,measure_name:string,unit:string,"
    "scale_mode:string,slope:string,offset:string,factor:string,"
    "target_min:string>>"
)

_TEMPLATES_SCHEMA = f"map<string, map<string, {_POINT_SCHEMA}>>"

# One device (Models/OpcDevice.cs:7-39) with the reference's
# Network.Params nesting preserved.
_DEVICE_SCHEMA = (
    "array<struct<daq_name:string,daq_template:string,monitored:boolean,"
    "prefix:string,point_node:string,"
    "network:struct<params:struct<protocol:string,server:string>>>>"
)

_DEVICES_SCHEMA = f"map<string, {_DEVICE_SCHEMA}>"


def _read_json_text(spark: SparkSession, path: str) -> DataFrame:
    """Whole-file read: config files are single nested JSON documents, not
    JSON-lines — ``wholetext`` keeps the document intact for from_json."""
    return spark.read.text(path, wholetext=True)


def _parse_document(
    spark: SparkSession,
    path: str,
    schema: str,
    retries: int = 5,
    backoff_s: float = 0.05,
) -> DataFrame:
    """Parse one whole-file JSON document with the reference's transient-
    failure retry (config reads race the writer's partial writes / file
    locks — ``OpcSubscribeService.cs:449-470`` retries x5 with backoff;
    same policy at ``Helpers/OpcuaHelperFunctions.cs:25-27,49-51``).

    ``from_json`` yields NULL on malformed JSON — the partial-write
    signature — so a NULL document triggers a re-read instead of silently
    producing an empty catalog (which downstream would treat as "all
    devices deconfigured": the exact failure the reference guards)."""
    import time

    for attempt in range(retries):
        # Drop any cached file status for this path: the session-shared
        # FileStatusCache can pin the PREVIOUS length of a file being
        # rewritten, making every re-read see the stale truncated bytes
        # (observed as a 5x-retry flake). Also what S6 hot-reload needs —
        # a re-read must see the new content, not the listing cache.
        spark.catalog.refreshByPath(path)
        # PIN the bytes the validation saw: returning the lazy plan would
        # re-read the file on every downstream action, so a rewrite racing
        # the caller could hand downstream a DIFFERENT (possibly torn)
        # parse than the one validated here — the exact TOCTOU this retry
        # loop exists to close. localCheckpoint materializes the validated
        # parse (config-sized: one row).
        parsed = _read_json_text(spark, path).select(
            F.from_json("value", schema).alias("doc")
        ).localCheckpoint(eager=True)
        if parsed.filter(F.col("doc").isNotNull()).count() > 0:
            return parsed
        time.sleep(backoff_s * (attempt + 1))
    raise ValueError(
        f"config file {path!r} failed to parse after {retries} attempts "
        "(malformed or perpetually mid-write)"
    )


def load_templates_json(spark: SparkSession, path: str) -> DataFrame:
    """S3 — parse ``deviceType -> templateName -> [point]`` into one row
    per point: (device_type, template_name, tag_name, measure_name, unit,
    scale_mode, slope, offset, factor, target_min), matching
    ``catalog.sos_templates`` exactly."""
    parsed = _parse_document(spark, path, _TEMPLATES_SCHEMA).select(
        F.col("doc").alias("by_type")
    )
    flat = (
        parsed.select(F.explode("by_type").alias("device_type", "by_template"))
        .select("device_type", F.explode("by_template").alias("template_name", "points"))
        .select("device_type", "template_name", F.explode("points").alias("p"))
        .select("device_type", "template_name", "p.*")
    )
    return flat.select(
        "device_type",
        "template_name",
        "tag_name",
        "measure_name",
        "unit",
        "scale_mode",
        F.col("slope").cast("decimal(10,4)").alias("slope"),
        F.col("offset").cast("decimal(10,4)").alias("offset"),
        F.col("factor").cast("decimal(10,4)").alias("factor"),
        F.col("target_min").cast("decimal(10,4)").alias("target_min"),
    )


def load_devices_json(spark: SparkSession, path: str) -> DataFrame:
    """S4 — parse ``deviceType -> [device]`` into one row per device with
    the ``Network.Params`` nesting flattened to (protocol, server),
    matching ``catalog.site_devices``' column convention."""
    parsed = _parse_document(spark, path, _DEVICES_SCHEMA).select(
        F.col("doc").alias("by_type")
    )
    return (
        parsed.select(F.explode("by_type").alias("device_type", "devices"))
        .select("device_type", F.explode("devices").alias("d"))
        .select(
            "device_type",
            F.col("d.daq_name").alias("daq_name"),
            F.col("d.daq_template").alias("daq_template"),
            F.col("d.monitored").alias("monitored"),
            F.col("d.network.params.protocol").alias("protocol"),
            F.col("d.prefix").alias("prefix"),
            F.col("d.network.params.server").alias("server"),
            F.col("d.point_node").alias("point_node"),
        )
    )


def load_connection_config(spark: SparkSession, path: str) -> str:
    """S5 — ``plant_config.json`` -> connection string
    (``Helpers/OpcuaHelperFunctions.cs:67-71`` builds the Npgsql string
    from host/port/database/username/password fields).

    Deliberately driver-side: the result configures the engine (a scalar,
    O(1) row), exactly as the reference holds it in a field. No secrets
    are logged; the password segment is whatever the file carries
    (AES-at-rest is X8's concern, not this reader's).
    """
    row = (
        _parse_document(
            spark,
            path,
            "struct<host:string,port:int,database:string,"
            "username:string,password:string>",
        )
        .select("doc.*")
        .first()
    )
    return (
        f"Host={row['host']};Port={row['port']};Database={row['database']};"
        f"Username={row['username']};Password={row['password']}"
    )
