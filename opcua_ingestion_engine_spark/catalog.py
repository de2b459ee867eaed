"""Config catalog + telemetry-stream derivation (SURVEY.md §1, FIXTURES.md).

The reference loads three config artifacts (SURVEY.md §2.1 S3/S4/S8):

- point templates  ``deviceType -> templateName -> [point]``
  (reference ``Services/OpcSubscribeService.cs:472-475``,
  ``Models/OpcTemplates.cs:20-57``)
- site devices     ``deviceType -> [device]``
  (``Services/OpcSubscribeService.cs:477-480``, ``Models/OpcDevice.cs:7-39``)
- client connections (url, timeout_ms, max_search)
  (``Services/OpcuaHelperService.cs:64-89``, ``Models/OpcClientConfig.cs:5-46``)

and consumes a telemetry notification stream
(``Services/OpcSubscribeService.cs:522-598``) with schema ``opc_updates``
(SURVEY.md §1.2).

The driver's test corpus only ships the TPC-H-ish tables plus
``events``/``documents``/``embeddings`` (TESTDATA.md), so this module derives
reference-shaped fixtures **deterministically from `events`** (the mapping
suggested by FIXTURES.md §A): ``user_id -> device``, ``event_type ->
measure``, ``ts -> source_ts``, ``received_ts = ts + (event_id % 150) s``,
``status_code`` bad for ~2% of rows. Every derivation exists twice — once as a
DataFrame builder (Spark) and once as a SQL snippet (DuckDB oracle) — with
arithmetic chosen to be bit-identical in both engines (whole-second interval
adds; DECIMAL literals for anything later multiplied).

Scale note: `opc_updates` is the 100 TB-scale fact stream — derivations are
pure per-row projections (no shuffle). The three catalogs are tiny dimension
tables; every join against them must broadcast (SURVEY.md §2.3: "All reference
joins are dictionary-lookup joins against small config maps").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Bad-quality marker: OPC UA StatusCode severity-Bad bit (0x80000000).
BAD_STATUS = 2147483648

# Liveness window: myPV_online=1 iff device updated in last 60 s
# (reference Services/OpcSubscribeService.cs:49-52).
LIVENESS_WINDOW_S = 60


# Per-session memo for MATERIALIZED dimension derivations (site_devices is
# an events scan + distinct — without the memo every query that references
# the device catalog re-runs that scan; VERDICT r1 flagged exactly this).
# Keyed by applicationId so a stopped/recreated session never sees stale
# checkpointed RDDs. Only O(devices)-sized dimensions belong here — never
# the fact stream. Values carry the owning session so eviction can ask
# "is that context actually stopped?" rather than "is it a different app?"
# — two LIVE SparkSessions (parallel test fixtures) must not wipe each
# other's cache on every miss.
_DIM_CACHE: dict[tuple[str, str, str], tuple[SparkSession, DataFrame]] = {}


def _session_stopped(sess: SparkSession) -> bool:
    try:
        sc = sess.sparkContext
        return sc._jsc is None or sc._jsc.sc().isStopped()
    except Exception:
        return True  # unreachable JVM handle == dead session


def _memo_ckpt(spark: SparkSession, sf_dir: str, key: str, build) -> DataFrame:
    app = spark.sparkContext.applicationId
    k = (app, sf_dir, key)
    hit = _DIM_CACHE.get(k)
    if hit is not None:
        return hit[1]
    # Evict only entries whose owning context is STOPPED: those reference
    # checkpointed frames of dead sessions and would pin driver memory for
    # process lifetime. Entries of other live sessions stay cached.
    # pop, not del: two live sessions can run this eviction concurrently
    # over the same snapshot of stale keys (the dict has no lock)
    for stale in [kk for kk, (sess, _) in _DIM_CACHE.items()
                  if kk[0] != app and _session_stopped(sess)]:
        _DIM_CACHE.pop(stale, None)
    df = build().localCheckpoint(eager=True)
    _DIM_CACHE[k] = (spark, df)
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read via nanosAsLong: ns -> us with integer div
        # (exact; DuckDB's ns->us read truncates identically).
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # Naive parquet timestamps read as TIMESTAMP_NTZ when the session's NTZ
    # inference is on (driver-owned sessions may pin it). Operators use
    # LTZ-only functions (unix_micros, window); with UTC session tz the
    # NTZ->LTZ cast is wall-clock-identical to DuckDB's naive reads.
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


# ---------------------------------------------------------------------------
# opc_updates — the raw telemetry stream (FIXTURES.md b1)
# ---------------------------------------------------------------------------

def opc_updates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the notification stream consumed at
    ``Services/OpcSubscribeService.cs:540-565`` from the ``events`` fixture.

    Pure projection — no shuffle; at 100 TB this is a parquet scan with
    column pruning plus codegen'd expressions.
    """
    ev = load_table(spark, sf_dir, "events")
    device = F.concat(F.lit("DEV-"), F.lpad((F.col("user_id") % 100).cast("string"), 3, "0"))
    tag_name = F.concat(F.col("event_type"), F.lit("_raw"))
    return ev.select(
        F.col("event_id"),
        # The connection is a property of the DEVICE (user_id % 100), so
        # updates ride the connection the device catalog assigns — deriving
        # it from the raw user_id made users 3/103/203 deliver DEV-003's
        # traffic over three different connections, contradicting
        # site_devices (and silently distorting per-connection staleness).
        F.concat(
            F.lit("opc.tcp://10.10.100."),
            (F.col("user_id") % 100 % 3 + 1).cast("string"),
            F.lit(":62541"),
        ).alias("server_url"),
        (F.col("user_id") % 100 % 3).cast("int").alias("conn_id"),
        # X6 node-id concat (OpcSubscribeService.cs:232)
        F.concat(F.lit("ns=2;s="), device, F.lit("/"), tag_name).alias("node_id"),
        device.alias("daq_name"),
        F.col("event_type").alias("measure_name"),
        tag_name.alias("tag_name"),
        F.col("value"),
        F.col("ts").alias("source_ts"),
        F.when(F.col("event_id") % 50 == 0, F.lit(BAD_STATUS))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("status_code"),
        (F.col("ts") + F.make_interval(secs=(F.col("event_id") % 150).cast("int"))).alias(
            "received_ts"
        ),
    )


SQL_OPC_UPDATES = """
    SELECT
        event_id,
        'opc.tcp://10.10.100.' || CAST(user_id % 100 % 3 + 1 AS VARCHAR) || ':62541' AS server_url,
        CAST(user_id % 100 % 3 AS INT) AS conn_id,
        'ns=2;s=DEV-' || lpad(CAST(user_id % 100 AS VARCHAR), 3, '0')
            || '/' || event_type || '_raw' AS node_id,
        'DEV-' || lpad(CAST(user_id % 100 AS VARCHAR), 3, '0') AS daq_name,
        event_type AS measure_name,
        event_type || '_raw' AS tag_name,
        value,
        ts AS source_ts,
        CAST(CASE WHEN event_id % 50 = 0 THEN 2147483648 ELSE 0 END AS BIGINT) AS status_code,
        ts + to_seconds(event_id % 150) AS received_ts
    FROM events
"""


# ---------------------------------------------------------------------------
# site_devices — device catalog (FIXTURES.md b2)
# ---------------------------------------------------------------------------

def site_devices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Device catalog derived from the distinct devices present in events.

    Mirrors ``Models/OpcDevice.cs:7-39``: (device_type, daq_name,
    daq_template, monitored, protocol, prefix, server, point_node).
    ~10% unmonitored and a MODBUS slice exercise filter F1
    (``OpcSubscribeService.cs:197``). Tiny dimension — always broadcast.
    Memoized + checkpointed per (session, sf_dir): the derivation costs a
    full events scan, and a query graph that references the catalog twice
    (or a session running many queries) must pay it once, not per
    reference.
    """
    return _memo_ckpt(spark, sf_dir, "site_devices", lambda: _site_devices_build(spark, sf_dir))


def _site_devices_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dev = (
        ev.select((F.col("user_id") % 100).cast("int").alias("dev_idx"))
        .distinct()
    )
    return dev.select(
        F.concat(F.lit("type-"), (F.col("dev_idx") % 4).cast("string")).alias("device_type"),
        F.concat(F.lit("DEV-"), F.lpad(F.col("dev_idx").cast("string"), 3, "0")).alias("daq_name"),
        F.concat(F.lit("tmpl-"), (F.col("dev_idx") % 4).cast("string")).alias("daq_template"),
        (F.col("dev_idx") % 10 != 0).alias("monitored"),
        F.when(F.col("dev_idx") % 25 == 24, F.lit("MODBUS")).otherwise(F.lit("OPCUA")).alias("protocol"),
        F.lit("").alias("prefix"),
        F.concat(F.lit("conn-"), (F.col("dev_idx") % 3).cast("string")).alias("server"),
        (F.col("dev_idx") % 3).cast("int").alias("conn_id"),
        F.concat(F.lit("ns=2;s=DEV-"), F.lpad(F.col("dev_idx").cast("string"), 3, "0")).alias("point_node"),
    )


SQL_SITE_DEVICES = """
    SELECT
        'type-' || CAST(dev_idx % 4 AS VARCHAR) AS device_type,
        'DEV-' || lpad(CAST(dev_idx AS VARCHAR), 3, '0') AS daq_name,
        'tmpl-' || CAST(dev_idx % 4 AS VARCHAR) AS daq_template,
        dev_idx % 10 <> 0 AS monitored,
        CASE WHEN dev_idx % 25 = 24 THEN 'MODBUS' ELSE 'OPCUA' END AS protocol,
        '' AS prefix,
        'conn-' || CAST(dev_idx % 3 AS VARCHAR) AS server,
        CAST(dev_idx % 3 AS INT) AS conn_id,
        'ns=2;s=DEV-' || lpad(CAST(dev_idx AS VARCHAR), 3, '0') AS point_node
    FROM (SELECT DISTINCT CAST(user_id % 100 AS INT) AS dev_idx FROM events)
"""


# ---------------------------------------------------------------------------
# sos_templates — point/template catalog (FIXTURES.md b3)
# ---------------------------------------------------------------------------
#
# One point per (device_type, template, measure). Scaling parameters follow
# Models/OpcTemplates.cs:42-56 (slope default 1, offset default 0) and the
# scale-mode dispatch at Services/OpcSubscribeService.cs:568-576:
# 'slope_intercept' | 'point_slope' | anything else = identity.
# Parameters are chosen decimal-exact so Spark & DuckDB produce bit-identical
# doubles: point_slope factors are pre-reduced ((tmax-tmin)/(vmax-vmin)).

_TEMPLATE_POINTS = [
    # measure,   unit,    scale_mode,        slope,  offset, factor, target_min
    ("click",    "kW",    "slope_intercept", "2.5",  "1.0",  None,   None),
    ("view",     "count", "slope_intercept", "1.0",  "0.0",  None,   None),
    ("signup",   "%",     "point_slope",     None,   None,   "0.2",  "0.0"),
    ("purchase", "ratio", "point_slope",     None,   None,   "0.004", "-1.0"),
    ("error",    "code",  "none",            None,   None,   None,   None),
]


def sos_templates(spark: SparkSession) -> DataFrame:
    """Point catalog: 4 device_types x matching template x 5 measures.

    The reference nests this as JSON dicts (deviceType -> template ->
    [point]); flattened here to one row per point (SURVEY.md §1.1).
    DECIMAL columns keep downstream scaling arithmetic exact.
    """
    rows = []
    for dt in range(4):
        for measure, unit, mode, slope, offset, factor, tmin in _TEMPLATE_POINTS:
            rows.append(
                (
                    f"type-{dt}",
                    f"tmpl-{dt}",
                    f"{measure}_raw",
                    measure,
                    unit,
                    mode,
                    slope,
                    offset,
                    factor,
                    tmin,
                )
            )
    df = spark.createDataFrame(
        rows,
        "device_type string, template_name string, tag_name string, "
        "measure_name string, unit string, scale_mode string, "
        "slope string, offset string, factor string, target_min string",
    )
    return df.select(
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


def _sql_template_rows() -> str:
    vals = []
    for dt in range(4):
        for measure, unit, mode, slope, offset, factor, tmin in _TEMPLATE_POINTS:
            def d(x):  # decimal literal or NULL
                return f"CAST({x} AS DECIMAL(10,4))" if x is not None else "CAST(NULL AS DECIMAL(10,4))"
            vals.append(
                f"('type-{dt}', 'tmpl-{dt}', '{measure}_raw', '{measure}', '{unit}', "
                f"'{mode}', {d(slope)}, {d(offset)}, {d(factor)}, {d(tmin)})"
            )
    return ",\n        ".join(vals)


SQL_SOS_TEMPLATES = f"""
    SELECT * FROM (VALUES
        {_sql_template_rows()}
    ) AS t(device_type, template_name, tag_name, measure_name, unit,
           scale_mode, slope, "offset", factor, target_min)
"""


# ---------------------------------------------------------------------------
# opc_client_connections (FIXTURES.md b4)
# ---------------------------------------------------------------------------

_CONNECTIONS = [
    # conn_id, connection_name, url,                  max_search, timeout_ms, username, password
    (0, "conn-0", "opc.tcp://10.10.100.1:62541", 600, 30000, " svc-opc ", "s3cret-alpha"),
    (1, "conn-1", "opc.tcp://10.10.100.2:62541", 600, 60000, "svc-opc", "s3cret-bravo"),
    (2, "conn-2", "opc.tcp://10.10.100.3:62541", 600, 120000, "Svc-OPC", "s3cret-charlie"),
]


def opc_client_connections(spark: SparkSession) -> DataFrame:
    """Connection config (Models/OpcClientConfig.cs:5-46). Defaults mirror the
    injected "Ignition" row: MaxSearch=600, TimeoutMs=60000
    (Services/OpcuaHelperService.cs:74-86); timeouts varied per FIXTURES.md b4
    to exercise the per-connection staleness cutoff F3. username carries
    deliberate whitespace/case noise for X13 trim / X7 lower coverage;
    password is the X8 AES roundtrip subject."""
    return spark.createDataFrame(
        _CONNECTIONS,
        "conn_id int, connection_name string, url string, max_search int, "
        "timeout_ms int, username string, password string",
    )


SQL_CONNECTIONS = """
    SELECT * FROM (VALUES
        (CAST(0 AS INT), 'conn-0', 'opc.tcp://10.10.100.1:62541', 600, 30000, ' svc-opc ', 's3cret-alpha'),
        (CAST(1 AS INT), 'conn-1', 'opc.tcp://10.10.100.2:62541', 600, 60000, 'svc-opc', 's3cret-bravo'),
        (CAST(2 AS INT), 'conn-2', 'opc.tcp://10.10.100.3:62541', 600, 120000, 'Svc-OPC', 's3cret-charlie')
    ) AS t(conn_id, connection_name, url, max_search, timeout_ms, username, password)
"""


# ---------------------------------------------------------------------------
# browse_exclusion_folders — J4/F6 (Models/OpcClientConfig.cs:26-36)
# ---------------------------------------------------------------------------

_EXCLUSION_FOLDERS = [
    # conn_id, folder display name (reference prunes subtrees whose
    # DisplayName matches — Helpers/OpcuaBrowse.cs:80-87)
    (0, "Diagnostics"),
    (0, "Server"),
    (1, "Server"),
]


def browse_exclusion_folders(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        _EXCLUSION_FOLDERS, "conn_id int, folder string"
    )


SQL_EXCLUSION_FOLDERS = """
    SELECT * FROM (VALUES
        (CAST(0 AS INT), 'Diagnostics'),
        (CAST(0 AS INT), 'Server'),
        (CAST(1 AS INT), 'Server')
    ) AS t(conn_id, folder)
"""


# ---------------------------------------------------------------------------
# browse_nodes — the OPC UA address space as an edge list (SURVEY.md §1.1,
# Models/JsTreeExport.cs:36-46). Derived from the device/template catalogs:
# per connection a root Objects folder; per device an Object folder holding
# its template-point Variables plus a Diagnostics Object subfolder (browse
# exclusion target) with one Status Variable.
# ---------------------------------------------------------------------------

def browse_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The five union branches below each reference `dev`; materialize the
    # tiny dimension once so the fixture derivation (events scan +
    # distinct) doesn't run once per branch.
    dev = site_devices(spark, sf_dir)  # memoized+checkpointed in catalog
    tpl = sos_templates(spark)
    root = (
        dev.select("conn_id").distinct()
        .select(
            "conn_id",
            F.lit(None).cast("string").alias("parent_id"),
            F.lit("i=85").alias("node_id"),
            F.lit("Objects").alias("display_name"),
            F.lit("Object").alias("node_class"),
        )
    )
    dev_nodes = dev.select(
        "conn_id",
        F.lit("i=85").alias("parent_id"),
        F.col("point_node").alias("node_id"),
        F.col("daq_name").alias("display_name"),
        F.lit("Object").alias("node_class"),
    )
    diag = dev.select(
        "conn_id",
        F.col("point_node").alias("parent_id"),
        F.concat("point_node", F.lit("/Diagnostics")).alias("node_id"),
        F.lit("Diagnostics").alias("display_name"),
        F.lit("Object").alias("node_class"),
    )
    diag_var = dev.select(
        "conn_id",
        F.concat("point_node", F.lit("/Diagnostics")).alias("parent_id"),
        F.concat("point_node", F.lit("/Diagnostics/Status")).alias("node_id"),
        F.lit("Status").alias("display_name"),
        F.lit("Variable").alias("node_class"),
    )
    variables = (
        dev.join(
            F.broadcast(tpl),
            (dev.device_type == tpl.device_type)
            & (dev.daq_template == tpl.template_name),
            "inner",
        )
        .select(
            "conn_id",
            F.col("point_node").alias("parent_id"),
            F.concat("point_node", F.lit("/"), "prefix", "tag_name").alias("node_id"),
            F.col("tag_name").alias("display_name"),
            F.lit("Variable").alias("node_class"),
        )
    )
    return (
        root.unionByName(dev_nodes)
        .unionByName(diag)
        .unionByName(diag_var)
        .unionByName(variables)
    )


SQL_BROWSE_NODES = """
    SELECT DISTINCT conn_id, CAST(NULL AS VARCHAR) AS parent_id,
           'i=85' AS node_id, 'Objects' AS display_name, 'Object' AS node_class
    FROM site_devices
    UNION ALL
    SELECT conn_id, 'i=85', point_node, daq_name, 'Object' FROM site_devices
    UNION ALL
    SELECT conn_id, point_node, point_node || '/Diagnostics', 'Diagnostics', 'Object'
    FROM site_devices
    UNION ALL
    SELECT conn_id, point_node || '/Diagnostics',
           point_node || '/Diagnostics/Status', 'Status', 'Variable'
    FROM site_devices
    UNION ALL
    SELECT d.conn_id, d.point_node, d.point_node || '/' || d.prefix || t.tag_name,
           t.tag_name, 'Variable'
    FROM site_devices d
    JOIN sos_templates t
      ON t.device_type = d.device_type AND t.template_name = d.daq_template
"""


def with_fixture_ctes(body_sql: str, recursive: bool = False) -> str:
    """Wrap an oracle SELECT with the shared fixture CTEs so each oracle query
    sees the same derived tables the Spark side builds. ``recursive=True``
    emits WITH RECURSIVE (needed when the body adds a recursive CTE, e.g.
    the B1 browse walk)."""
    return f"""
    WITH {"RECURSIVE " if recursive else ""}opc_updates AS ({SQL_OPC_UPDATES}),
         site_devices AS ({SQL_SITE_DEVICES}),
         sos_templates AS ({SQL_SOS_TEMPLATES}),
         opc_connections AS ({SQL_CONNECTIONS}),
         exclusion_folders AS ({SQL_EXCLUSION_FOLDERS}),
         browse_nodes AS ({SQL_BROWSE_NODES})
    {body_sql}
    """
