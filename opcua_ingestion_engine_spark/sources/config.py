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


def migrate_legacy_client_config(
    spark: SparkSession, json_path: str, out_root: str
) -> "tuple[int, int]":
    """S14 — the reference's one-shot legacy-config migration
    (``Migrations/20240718023204_AddClientConfig.cs:87-140``): lift the
    flat-file ``opcua_client_config.json`` (``{"connections": [...]}``,
    each with connection_name / url / max_search / staleness_timeout_ms
    / browse_exclusion_folders) into the RELATIONAL config tables the
    post-migration reference reads — ``opc_client_connections`` (with
    the new nullable UserName / EncryptedPassword columns the migration
    introduces) and ``browse_exclusion_folders`` (FK rows, one per
    folder) — then delete the legacy file, exactly the reference's
    sequence. Tables land as versioned-table commits under
    ``out_root/<table>``.

    Ids are assigned 1..n in file order. DOCUMENTED DIVERGENCE: the
    reference re-initializes its id counter INSIDE the per-client loop
    (``int pgFirstId = 1`` at :108 with the dead ``pgFirstId += 1`` at
    :137), so every connection inserts with Id=1 and any multi-
    connection file would fail the primary key — i.e. the shipped
    migration only ever worked for single-connection files. This port
    implements the evident intent (sequential ids) rather than the
    defect.

    Crash-safe and idempotent: content derives deterministically from
    the file; both tables are full-replace commits; the file is
    removed LAST, so a crash anywhere re-runs to the same state. A
    call with the file already gone and both tables committed is the
    "already migrated" no-op (returns the live versions); with nothing
    to do at all it raises FileNotFoundError like the reference's
    missing-config guard."""
    import json as _json
    import os

    from ..operators import tablefmt as TF

    conns_root = os.path.join(out_root, "opc_client_connections")
    folders_root = os.path.join(out_root, "browse_exclusion_folders")
    if not os.path.exists(json_path):
        vc, vf = TF.latest_version(conns_root), TF.latest_version(folders_root)
        if vc is not None and vf is not None:
            return vc, vf  # already migrated
        raise FileNotFoundError(
            f"no legacy config at {json_path} and no migrated tables at "
            f"{out_root}"
        )
    with open(json_path) as f:
        legacy = _json.load(f)
    conn_rows = []
    folder_rows = []
    fid = 1
    for i, c in enumerate(legacy["connections"], start=1):
        conn_rows.append(
            (
                i,
                c["connection_name"],
                c["url"],
                int(c["max_search"]),
                int(c["staleness_timeout_ms"]),
                None,  # UserName — new nullable column, no legacy value
                None,  # EncryptedPassword — ditto
            )
        )
        for folder in c.get("browse_exclusion_folders", []):
            folder_rows.append((fid, i, i, folder))
            fid += 1
    conns = spark.createDataFrame(
        conn_rows,
        "id int, connection_name string, url string, max_search int, "
        "timeout_ms int, user_name string, encrypted_password binary",
    ).coalesce(1)
    folders = spark.createDataFrame(
        folder_rows,
        "id int, connection_opc_client_connection_id int, "
        "opc_client_connection_id int, exclusion_folder string",
    ).coalesce(1)
    vc = TF.commit_version(conns, conns_root, app={"op": "s14_migration"})
    vf = TF.commit_version(folders, folders_root, app={"op": "s14_migration"})
    os.remove(json_path)  # the reference's File.Delete — LAST, crash-safe
    return vc, vf
