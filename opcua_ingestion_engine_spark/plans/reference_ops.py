"""Registry entries for the reference-derived operator inventory
(SURVEY.md §2.1-§2.9) — one ``queries()`` + ``oracle_sql()`` pair per ID.

Each query is deliberately small: it exercises ONE operator against the
shared fixture tables so a red CORRECTNESS row points at one operator.
Column-name and arithmetic conventions follow registry.py (identical
aliases both sides; DECIMAL before any float-summing arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog as C
from ..functions.timefmt import format_modvalues_ts
from ..operators import browse as B
from ..operators import ingest
from ..operators import reconcile as R
from ..operators import sink
from .registry import register


def _upd(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.opc_updates(spark, sf_dir)


def _dev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.site_devices(spark, sf_dir)


# ---------------------------------------------------------------------------
# §2.2 Filters F1-F10
# ---------------------------------------------------------------------------

@register(
    "q_f1_monitored_devices",
    C.with_fixture_ctes("""
        SELECT daq_name, device_type, daq_template
        FROM site_devices WHERE monitored AND protocol = 'OPCUA'
    """),
    "F1 — Monitored && Protocol=='OPCUA' (OpcSubscribeService.cs:197)",
)
def q_f1(spark, sf_dir):
    return ingest.monitored_devices(_dev(spark, sf_dir)).select(
        "daq_name", "device_type", "daq_template"
    )


@register(
    "q_f2_change_only",
    C.with_fixture_ctes("""
        , w AS (
            SELECT node_id, event_id, value, status_code,
                   lag(value) OVER pt AS prev_v,
                   lag(status_code) OVER pt AS prev_s,
                   row_number() OVER pt AS rn
            FROM opc_updates
            WINDOW pt AS (PARTITION BY node_id ORDER BY source_ts, event_id)
        )
        SELECT node_id, event_id, value, status_code
        FROM w
        WHERE rn = 1
           OR (value IS NULL) <> (prev_v IS NULL)
           OR (value IS NOT NULL AND prev_v IS NOT NULL
               AND abs(value - prev_v) > 0.0)
           OR status_code IS DISTINCT FROM prev_s
    """),
    "F2 — change-only transport filter: value/status change vs previous "
    "update of the point; deadband=0 (DataChangeFilter, "
    "OpcSubscribeService.cs:219-223). Stricter than the reference trigger "
    "(StatusValueTimestamp also passes timestamp-only changes) — "
    "deliberate batch semantics, documented divergence.",
)
def q_f2(spark, sf_dir):
    return ingest.change_only(_upd(spark, sf_dir)).select(
        "node_id", "event_id", "value", "status_code"
    )


@register(
    "q_f3_staleness_filter",
    C.with_fixture_ctes("""
        SELECT u.event_id, u.daq_name, u.measure_name
        FROM opc_updates u JOIN opc_connections c USING (conn_id)
        WHERE abs(epoch_us(u.received_ts) - epoch_us(u.source_ts)) / 1000.0
              <= c.timeout_ms
    """),
    "F3+J3 — per-connection staleness cutoff (OpcSubscribeService.cs:558-559)",
)
def q_f3(spark, sf_dir):
    return ingest.staleness_filter(
        _upd(spark, sf_dir), C.opc_client_connections(spark)
    ).select("event_id", "daq_name", "measure_name")


@register(
    "q_f4_quality_split",
    C.with_fixture_ctes("""
        SELECT event_id, daq_name, measure_name,
               CASE WHEN status_code = 0 THEN 'good' ELSE 'bad' END AS quality
        FROM opc_updates
    """),
    "F4 — StatusCode.IsGood routing (OpcSubscribeService.cs:563-589): "
    "good branch writes value+online=1, bad branch online=0 only",
)
def q_f4(spark, sf_dir):
    # Single-scan routing: the good/bad split is a conditional projection,
    # not a union of two filtered re-scans of the fact stream (the
    # reference routes per notification, not per pass —
    # OpcSubscribeService.cs:563). The same predicate drives
    # ingest.good_quality and perpoint_state's conditional aggregation.
    u = _upd(spark, sf_dir)
    return u.select(
        "event_id",
        "daq_name",
        "measure_name",
        F.when(F.col("status_code") == 0, F.lit("good"))
        .otherwise(F.lit("bad"))
        .alias("quality"),
    )


@register(
    "q_f5_self_measure_exclusion",
    C.with_fixture_ctes("""
        SELECT measure_name, count(*) AS n
        FROM opc_updates WHERE measure_name <> 'myPV_online'
        GROUP BY measure_name
    """),
    "F5 — myPV_online never subscribed/written directly "
    "(OpcSubscribeService.cs:216,558)",
)
def q_f5(spark, sf_dir):
    return (
        ingest.exclude_self_measure(_upd(spark, sf_dir))
        .groupBy("measure_name")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q_f6_browse_exclusion",
    C.with_fixture_ctes("""
        SELECT n.conn_id, n.node_id, n.display_name
        FROM browse_nodes n
        WHERE NOT EXISTS (
            SELECT 1 FROM exclusion_folders e
            WHERE e.conn_id = n.conn_id AND e.folder = n.display_name)
    """),
    "F6 — exclusion-folder anti join (Helpers/OpcuaBrowse.cs:80-87); "
    "NB subtree pruning is exercised by q_b1_browse_tree",
)
def q_f6(spark, sf_dir):
    nodes = C.browse_nodes(spark, sf_dir)
    excl = C.browse_exclusion_folders(spark).select(
        "conn_id", F.col("folder").alias("display_name")
    )
    return nodes.join(
        F.broadcast(excl), ["conn_id", "display_name"], "left_anti"
    ).select("conn_id", "node_id", "display_name")


@register(
    "q_f7_node_class",
    C.with_fixture_ctes("""
        SELECT node_class, count(*) AS n FROM browse_nodes
        WHERE node_class IN ('Object', 'Variable')
        GROUP BY node_class
    """),
    "F7 — browse node-class projection (Helpers/OpcuaBrowse.cs:33-41)",
)
def q_f7(spark, sf_dir):
    return (
        C.browse_nodes(spark, sf_dir)
        .filter(F.col("node_class").isin("Object", "Variable"))
        .groupBy("node_class")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q_f8_online_probe",
    C.with_fixture_ctes("""
        , joined AS (
            SELECT u.daq_name, u.status_code, u.received_ts, u.event_id
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
        last_event AS (
            SELECT * FROM (
                SELECT daq_name, status_code, received_ts, row_number() OVER (
                    PARTITION BY daq_name ORDER BY received_ts DESC, event_id DESC) AS rn
                FROM joined) WHERE rn = 1
        )
        SELECT daq_name AS device FROM last_event
        WHERE status_code = 0
          AND epoch_us((SELECT max(received_ts) FROM joined))
              - epoch_us(received_ts) <= 60 * 1000000
    """),
    "F8 — online-device probe: SELECT DISTINCT device ... WHERE "
    "measure_name='myPV_online' AND measure_value=1 "
    "(OpcSubscribeService.cs:308-313), asked of the flagship snapshot",
)
def q_f8(spark, sf_dir):
    snap = ingest.modvalues_snapshot(
        _upd(spark, sf_dir),
        _dev(spark, sf_dir),
        C.sos_templates(spark),
        C.opc_client_connections(spark),
    )
    return (
        snap.filter(
            (F.col("measure_name") == "myPV_online") & (F.col("measure_value") == 1.0)
        )
        .select("device")
        .distinct()
    )


@register(
    "q_f9_row_existence",
    C.with_fixture_ctes("""
        SELECT DISTINCT d.daq_name, t.measure_name
        FROM site_devices d
        JOIN sos_templates t
          ON t.device_type = d.device_type AND t.template_name = d.daq_template
        JOIN opc_connections c ON c.connection_name = d.server
        WHERE d.monitored AND d.protocol = 'OPCUA'
          AND EXISTS (
            SELECT 1 FROM opc_updates u
            WHERE u.daq_name = d.daq_name AND u.measure_name = t.measure_name)
    """),
    "F9 — row-existence probe as a left-semi join "
    "(OpcSubscribeService.cs:661-678). The oracle mirrors the FULL "
    "subscription_plan derivation including the connections inner join "
    "(a device whose server has no connection row subscribes nothing), "
    "so the row-dropping semantics are pinned, not fixture luck",
)
def q_f9(spark, sf_dir):
    plan = ingest.subscription_plan(
        _dev(spark, sf_dir), C.sos_templates(spark), C.opc_client_connections(spark)
    ).select("daq_name", "measure_name").distinct()
    return plan.join(
        _upd(spark, sf_dir), ["daq_name", "measure_name"], "left_semi"
    )


@register(
    "q_f10_projection",
    C.with_fixture_ctes("""
        SELECT daq_name AS device, tag_name, value AS tag_value,
               measure_name, value AS measure_value,
               strftime(received_ts, '%Y-%m-%dT%H:%M:%S.%f') AS last_updated,
               'instant' AS logging
        FROM opc_updates
    """),
    "F10 — column projection of the update stream onto the modvalues "
    "insert/update column lists (OpcSubscribeService.cs:624-630,687-689)",
)
def q_f10(spark, sf_dir):
    return _upd(spark, sf_dir).select(
        F.col("daq_name").alias("device"),
        "tag_name",
        F.col("value").alias("tag_value"),
        "measure_name",
        F.col("value").alias("measure_value"),
        format_modvalues_ts("received_ts").alias("last_updated"),
        F.lit("instant").alias("logging"),
    )


# ---------------------------------------------------------------------------
# §2.3 Joins J1-J7
# ---------------------------------------------------------------------------

@register(
    "q_j1_device_points",
    C.with_fixture_ctes("""
        SELECT d.daq_name, t.measure_name, t.tag_name, t.unit
        FROM site_devices d
        JOIN sos_templates t
          ON t.device_type = d.device_type AND t.template_name = d.daq_template
        WHERE d.monitored AND d.protocol = 'OPCUA'
    """),
    "J1 — device x template points broadcast join + explode "
    "(OpcSubscribeService.cs:201,212)",
)
def q_j1(spark, sf_dir):
    d = ingest.monitored_devices(_dev(spark, sf_dir))
    return ingest.device_points(d, C.sos_templates(spark)).select(
        "daq_name", "measure_name", "tag_name", "unit"
    )


@register(
    "q_j2_device_server_urls",
    C.with_fixture_ctes("""
        SELECT d.daq_name, c.url, c.timeout_ms
        FROM site_devices d
        JOIN opc_connections c ON d.server = c.connection_name
    """),
    "J2 — device -> server URL via connection-name map "
    "(OpcSubscribeService.cs:171-187,224)",
)
def q_j2(spark, sf_dir):
    return ingest.device_server_urls(
        _dev(spark, sf_dir), C.opc_client_connections(spark)
    ).select("daq_name", "url", "timeout_ms")


@register(
    "q_j4_connection_exclusions",
    C.with_fixture_ctes("""
        SELECT c.conn_id, c.connection_name,
               coalesce(e.folders, '') AS folders,
               coalesce(e.n_folders, 0) AS n_folders
        FROM opc_connections c
        LEFT JOIN (
            SELECT conn_id, string_agg(folder, ',' ORDER BY folder) AS folders,
                   count(*) AS n_folders
            FROM exclusion_folders GROUP BY conn_id) e USING (conn_id)
    """),
    "J4 — connection -> exclusion folders eager load (EF Include, "
    "Services/OpcuaHelperService.cs:68-70); child list as sorted CSV",
)
def q_j4(spark, sf_dir):
    return R.connection_exclusions(
        C.opc_client_connections(spark), C.browse_exclusion_folders(spark)
    )


@register(
    "q_j5_venn_reconcile",
    C.with_fixture_ctes("""
        , l AS (SELECT DISTINCT daq_name FROM site_devices),
        r AS (SELECT DISTINCT daq_name FROM opc_updates)
        SELECT coalesce(l.daq_name, r.daq_name) AS daq_name,
               CASE WHEN l.daq_name IS NOT NULL AND r.daq_name IS NOT NULL THEN 'both'
                    WHEN l.daq_name IS NOT NULL THEN 'left_only'
                    ELSE 'right_only' END AS venn_side
        FROM l FULL OUTER JOIN r ON l.daq_name = r.daq_name
    """),
    "J5 — Venn set partition: configured vs observed devices "
    "(Extensions/CommonExtensions.cs:9-48)",
)
def q_j5(spark, sf_dir):
    return R.venn_partition(
        _dev(spark, sf_dir), _upd(spark, sf_dir), ["daq_name"]
    )


@register(
    "q_j7_heartbeat_lockset",
    C.with_fixture_ctes("""
        SELECT DISTINCT daq_name AS device FROM opc_updates
        WHERE daq_name IN ('DEV-001', 'DEV-002', 'DEV-050')
    """),
    "J7 — heartbeat lock-set IN-list semi join "
    "(OpcSubscribeService.cs:338-363)",
)
def q_j7(spark, sf_dir):
    return (
        _upd(spark, sf_dir)
        .filter(F.col("daq_name").isin("DEV-001", "DEV-002", "DEV-050"))
        .select(F.col("daq_name").alias("device"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# §2.4 Aggregations A1-A4
# ---------------------------------------------------------------------------

@register(
    "q_a1_distinct_devices",
    C.with_fixture_ctes("SELECT DISTINCT daq_name FROM opc_updates"),
    "A1 — SELECT DISTINCT device (OpcSubscribeService.cs:308-313,984-986)",
)
def q_a1(spark, sf_dir):
    return _upd(spark, sf_dir).select("daq_name").distinct()


@register(
    "q_a2_latest_per_key",
    C.with_fixture_ctes("""
        SELECT daq_name, measure_name, value,
               strftime(received_ts, '%Y-%m-%dT%H:%M:%S.%f') AS last_updated
        FROM (
            SELECT u.*, row_number() OVER (
                PARTITION BY daq_name, measure_name
                ORDER BY received_ts DESC, event_id DESC) AS rn
            FROM opc_updates u)
        WHERE rn = 1
    """),
    "A2 — last-write-wins latest value per (device, measure): the core "
    "upsert semantics (OpcSubscribeService.cs:600-654)",
)
def q_a2(spark, sf_dir):
    latest = ingest.latest_per_key(
        _upd(spark, sf_dir),
        keys=["daq_name", "measure_name"],
        payload=["value", "received_ts", "event_id"],
    )
    return latest.select(
        "daq_name",
        "measure_name",
        "value",
        format_modvalues_ts("received_ts").alias("last_updated"),
    )


@register(
    "q_a3_device_liveness",
    C.with_fixture_ctes("""
        , good AS (SELECT * FROM opc_updates WHERE status_code = 0)
        SELECT d.daq_name,
               CAST(CASE WHEN pd.last_good_ts IS NOT NULL
                         AND epoch_us((SELECT max(received_ts) FROM good))
                             - epoch_us(pd.last_good_ts) <= 60 * 1000000
                    THEN 1.0 ELSE 0.0 END AS DOUBLE) AS online
        FROM (SELECT DISTINCT daq_name, device_type FROM site_devices
              WHERE monitored AND protocol = 'OPCUA') d
        LEFT JOIN (SELECT daq_name, max(received_ts) AS last_good_ts
                   FROM good GROUP BY 1) pd USING (daq_name)
    """),
    "A3 — batch device liveness: online=1 iff a good update within the "
    "60s window (OpcSubscribeService.cs:45-58,578-585)",
)
def q_a3(spark, sf_dir):
    live = ingest.device_liveness(
        ingest.good_quality(_upd(spark, sf_dir)),
        ingest.monitored_devices(_dev(spark, sf_dir)),
    )
    return live.select("daq_name", "online")


@register(
    "q_a4_rowcount_effects",
    C.with_fixture_ctes("""
        SELECT CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN status_code = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
               CAST(sum(CASE WHEN status_code <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
        FROM opc_updates
    """),
    "A4 — affected-row counts gating commits "
    "(OpcSubscribeService.cs:363-369,736-737): n_good counts the GOOD "
    "branch only (n_good + n_bad = n_total — the previous form counted "
    "every row as good, a shared-mistake both engines agreed on)",
)
def q_a4(spark, sf_dir):
    u = _upd(spark, sf_dir)
    return u.agg(
        F.count("*").alias("n_total"),
        F.sum(F.when(F.col("status_code") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_good"),
        F.sum(F.when(F.col("status_code") != 0, 1).otherwise(0))
        .cast("long")
        .alias("n_bad"),
    )


# ---------------------------------------------------------------------------
# §2.1 Sinks S9/S10/S11 as MERGE-shaped batch ops
# ---------------------------------------------------------------------------

_SINK_BASE_SQL = """
    , plan_points AS (
        SELECT d.daq_name AS device, d.device_type, t.tag_name,
               t.measure_name, t.unit
        FROM site_devices d
        JOIN sos_templates t
          ON t.device_type = d.device_type AND t.template_name = d.daq_template
        WHERE d.monitored AND d.protocol = 'OPCUA'
    ),
    current_tbl AS (
        SELECT device, device_type, tag_name, 0.0 AS tag_value, measure_name,
               0.0 AS measure_value, unit AS source_unit,
               unit AS destination_unit,
               '1970-01-01T00:00:00.000000' AS last_updated,
               'instant' AS logging
        FROM plan_points
    ),
    latest AS (
        SELECT daq_name AS device, measure_name, tag_name,
               value AS scaled_value, received_ts
        FROM (
            SELECT u.*, row_number() OVER (
                PARTITION BY daq_name, measure_name
                ORDER BY received_ts DESC, event_id DESC) AS rn
            FROM opc_updates u WHERE status_code = 0)
        WHERE rn = 1
    )
"""


def _sink_inputs(spark, sf_dir, with_latest: bool = True):
    dev = ingest.monitored_devices(_dev(spark, sf_dir))
    tpl = C.sos_templates(spark)
    plan = dev.join(
        F.broadcast(tpl),
        (dev.device_type == tpl.device_type)
        & (dev.daq_template == tpl.template_name),
        "inner",
    ).drop(tpl.device_type)
    current = plan.select(
        F.col("daq_name").alias("device"),
        "device_type",
        "tag_name",
        F.lit(0.0).alias("tag_value"),
        "measure_name",
        F.lit(0.0).alias("measure_value"),
        F.col("unit").alias("source_unit"),
        F.col("unit").alias("destination_unit"),
        F.lit(ingest.EPOCH_TS_TEXT).alias("last_updated"),
        F.lit("instant").alias("logging"),
    )
    if not with_latest:
        # S11 needs only the seeded current table — building (and eagerly
        # checkpointing) the latest-per-key frame would launch a full
        # fact-stream scan + wide aggregation for a frame it discards
        return current, None
    # O(points) — materialized because the MERGE-shaped consumers reference
    # it twice (rows + key set for the anti join); lazy it costs a second
    # full fact scan (plan audit: q_s10 showed 2 events scans without it).
    latest = ingest.latest_per_key(
        ingest.good_quality(_upd(spark, sf_dir)),
        keys=["daq_name", "measure_name"],
        payload=["tag_name", "value", "received_ts", "event_id"],
    ).select(
        F.col("daq_name").alias("device"),
        "measure_name",
        "tag_name",
        F.col("value").alias("scaled_value"),
        "received_ts",
    ).localCheckpoint(eager=True)
    return current, latest


@register(
    "q_s9_upsert_matched",
    C.with_fixture_ctes(_SINK_BASE_SQL + """
        SELECT c.device, c.device_type, c.tag_name,
               CASE WHEN l.m THEN l.scaled_value ELSE c.tag_value END
                   AS tag_value,
               c.measure_name,
               CASE WHEN l.m THEN l.scaled_value ELSE c.measure_value END
                   AS measure_value,
               c.source_unit, c.destination_unit,
               CASE WHEN l.m
                    THEN strftime(l.received_ts, '%Y-%m-%dT%H:%M:%S.%f')
                    ELSE c.last_updated END AS last_updated,
               c.logging
        FROM current_tbl c
        LEFT JOIN (SELECT *, TRUE AS m FROM latest) l
            USING (device, measure_name)
    """),
    "S9/J6 — MERGE WHEN MATCHED UPDATE: batch of latest updates applied "
    "onto the seeded modvalues table (ModifyMeasure, "
    "OpcSubscribeService.cs:600-654)",
)
def q_s9(spark, sf_dir):
    current, latest = _sink_inputs(spark, sf_dir)
    return sink.upsert_values(current, latest)


@register(
    "q_s10_insert_if_missing",
    C.with_fixture_ctes(_SINK_BASE_SQL + """
        , observed AS (
            SELECT device, device_type, tag_name, scaled_value AS tag_value,
                   measure_name, scaled_value AS measure_value,
                   'obs' AS source_unit, 'obs' AS destination_unit,
                   strftime(received_ts, '%Y-%m-%dT%H:%M:%S.%f') AS last_updated,
                   'instant' AS logging
            FROM latest l JOIN (SELECT DISTINCT daq_name AS device, device_type
                                FROM site_devices) d USING (device)
        )
        SELECT * FROM observed
        UNION ALL
        SELECT c.* FROM current_tbl c
        WHERE NOT EXISTS (
            SELECT 1 FROM observed o
            WHERE o.device = c.device AND o.measure_name = c.measure_name)
    """),
    "S10 — MERGE WHEN NOT MATCHED INSERT: seed rows added only for keys "
    "absent from the existing table (CheckAndAddMeasure, "
    "OpcSubscribeService.cs:656-713)",
)
def q_s10(spark, sf_dir):
    current, latest = _sink_inputs(spark, sf_dir)
    dev_types = _dev(spark, sf_dir).select(
        F.col("daq_name").alias("device"), "device_type"
    ).distinct()
    observed = latest.join(F.broadcast(dev_types), "device", "inner").select(
        "device",
        "device_type",
        "tag_name",
        F.col("scaled_value").alias("tag_value"),
        "measure_name",
        F.col("scaled_value").alias("measure_value"),
        F.lit("obs").alias("source_unit"),
        F.lit("obs").alias("destination_unit"),
        format_modvalues_ts("received_ts").alias("last_updated"),
        F.lit("instant").alias("logging"),
    )
    return sink.insert_if_missing(observed, current, ["device", "measure_name"])


@register(
    "q_s11_bulk_reset",
    C.with_fixture_ctes(_SINK_BASE_SQL + """
        , with_online AS (
            SELECT * FROM current_tbl
            UNION ALL
            SELECT DISTINCT daq_name, device_type, 'myPV_online', 1.0,
                   'myPV_online', 1.0, 'bool', 'bool',
                   '2024-01-01T00:00:00.000000', 'instant'
            FROM site_devices WHERE monitored AND protocol = 'OPCUA'
        )
        SELECT device, device_type, tag_name,
               CASE WHEN tag_name = 'myPV_online' THEN 0.0 ELSE tag_value END AS tag_value,
               measure_name,
               CASE WHEN tag_name = 'myPV_online' THEN 0.0 ELSE measure_value END AS measure_value,
               source_unit, destination_unit,
               CASE WHEN tag_name = 'myPV_online'
                    THEN '2024-06-01T00:00:00.000000' ELSE last_updated END AS last_updated,
               logging
        FROM with_online
    """),
    "S11/T8 — startup bulk reset: one conditional rewrite zeroing every "
    "myPV_online row (SetAllMyPVOnlineFalse, "
    "OpcSubscribeService.cs:715-739)",
)
def q_s11(spark, sf_dir):
    current, _ = _sink_inputs(spark, sf_dir, with_latest=False)
    online = ingest.monitored_devices(_dev(spark, sf_dir)).select(
        F.col("daq_name").alias("device"),
        "device_type",
        F.lit("myPV_online").alias("tag_name"),
        F.lit(1.0).alias("tag_value"),
        F.lit("myPV_online").alias("measure_name"),
        F.lit(1.0).alias("measure_value"),
        F.lit("bool").alias("source_unit"),
        F.lit("bool").alias("destination_unit"),
        F.lit("2024-01-01T00:00:00.000000").alias("last_updated"),
        F.lit("instant").alias("logging"),
    ).distinct()
    return sink.bulk_reset_online(
        current.unionByName(online), "2024-06-01T00:00:00.000000"
    )


# ---------------------------------------------------------------------------
# §2.9 Browse B1-B4 (+F6 subtree pruning)
# ---------------------------------------------------------------------------

@register(
    "q_b1_browse_tree",
    C.with_fixture_ctes("""
        , walk AS (
            SELECT conn_id, parent_id, node_id, display_name, node_class,
                   0 AS depth
            FROM browse_nodes
            WHERE parent_id IS NULL AND node_class IN ('Object', 'Variable')
            UNION ALL
            SELECT n.conn_id, n.parent_id, n.node_id, n.display_name,
                   n.node_class, w.depth + 1
            FROM walk w
            JOIN browse_nodes n
              ON n.conn_id = w.conn_id AND n.parent_id = w.node_id
            WHERE n.node_class IN ('Object', 'Variable')
              AND NOT EXISTS (
                SELECT 1 FROM exclusion_folders e
                WHERE e.conn_id = n.conn_id AND e.folder = n.display_name)
        )
        SELECT conn_id, node_id, display_name, node_class, depth,
               depth <= 3 AS opened
        FROM walk
    """, recursive=True),
    "B1/B3/B4 + F6 — BFS address-space expansion with exclusion-subtree "
    "pruning, depth-based opened flag and node-class label "
    "(Helpers/OpcuaBrowse.cs:20-144). WITH RECURSIVE oracle; Spark side is "
    "an iterated frontier self-join.",
)
def q_b1(spark, sf_dir):
    tree = B.browse_tree(
        C.browse_nodes(spark, sf_dir), C.browse_exclusion_folders(spark)
    )
    return tree.select(
        "conn_id", "node_id", "display_name", "node_class", "depth", "opened"
    )


# ---------------------------------------------------------------------------
# §2.7 Scalars X4-X13
# ---------------------------------------------------------------------------

@register(
    "q_x4_try_cast_skip",
    C.with_fixture_ctes("""
        SELECT event_id, parsed FROM (
            SELECT event_id,
                   TRY_CAST(CASE WHEN event_id % 7 = 0 THEN measure_name
                                 ELSE CAST(event_id AS VARCHAR) END AS DOUBLE) AS parsed
            FROM opc_updates)
        WHERE parsed IS NOT NULL
    """),
    "X4 — Convert.ToDouble throw-on-non-numeric => try_cast + drop "
    "(OpcSubscribeService.cs:565,591-594)",
)
def q_x4(spark, sf_dir):
    u = _upd(spark, sf_dir)
    mixed = F.when(
        F.col("event_id") % 7 == 0, F.col("measure_name")
    ).otherwise(F.col("event_id").cast("string"))
    return (
        u.select("event_id", mixed.try_cast("double").alias("parsed"))
        .filter(F.col("parsed").isNotNull())
    )


@register(
    "q_x5_timestamp_text",
    C.with_fixture_ctes("""
        SELECT event_id,
               strftime(source_ts, '%Y-%m-%dT%H:%M:%S.%f') AS ts_text
        FROM opc_updates
    """),
    "X5 — yyyy-MM-ddTHH:mm:ss.ffffff UTC text timestamps "
    "(OpcSubscribeService.cs:555 et al.)",
)
def q_x5(spark, sf_dir):
    return _upd(spark, sf_dir).select(
        "event_id", format_modvalues_ts("source_ts").alias("ts_text")
    )


@register(
    "q_x6_node_id_concat",
    C.with_fixture_ctes("""
        SELECT d.daq_name,
               d.point_node || '/' || d.prefix || t.tag_name AS node_id
        FROM site_devices d
        JOIN sos_templates t
          ON t.device_type = d.device_type AND t.template_name = d.daq_template
        JOIN opc_connections c ON c.connection_name = d.server
        WHERE d.monitored AND d.protocol = 'OPCUA'
    """),
    "X6 — '{PointNodeId}/{Prefix}{TagName}' monitored-item node id "
    "(OpcSubscribeService.cs:232); oracle includes subscription_plan's "
    "connections inner join so its row-dropping is pinned",
)
def q_x6(spark, sf_dir):
    plan = ingest.subscription_plan(
        _dev(spark, sf_dir), C.sos_templates(spark), C.opc_client_connections(spark)
    )
    return plan.select("daq_name", "node_id")


@register(
    "q_x7_lowercase",
    C.with_fixture_ctes("""
        SELECT connection_name, lower(username) AS username_lc
        FROM opc_connections
    """),
    "X7 — lowercase JSON naming policy (Helpers/OpcuaHelperFunctions.cs:13-20)",
)
def q_x7(spark, sf_dir):
    return C.opc_client_connections(spark).select(
        "connection_name", F.lower("username").alias("username_lc")
    )


@register(
    "q_x8_aes_roundtrip",
    C.with_fixture_ctes("""
        SELECT connection_name, password AS password_roundtrip
        FROM opc_connections
    """),
    "X8 — AES-256-CBC encrypt/decrypt roundtrip "
    "(Services/OpcuaHelperService.cs:195-248). DuckDB has no AES, so the "
    "oracle asserts decrypt(encrypt(pw)) == pw by returning the plaintext.",
)
def q_x8(spark, sf_dir):
    # 32-byte key = AES-256; CBC generates a random IV per row, so the
    # ciphertext is non-deterministic — the deterministic (oracle-checkable)
    # artifact is the decrypt(encrypt(x)) == x roundtrip.
    dec = F.expr(
        "cast(aes_decrypt("
        "aes_encrypt(password, '0123456789abcdef0123456789abcdef', 'CBC'),"
        "'0123456789abcdef0123456789abcdef', 'CBC') AS STRING)"
    )
    return C.opc_client_connections(spark).select(
        "connection_name", dec.alias("password_roundtrip")
    )


@register(
    "q_x9_utf8_encode",
    C.with_fixture_ctes("""
        SELECT connection_name, octet_length(encode(password)) AS n_bytes
        FROM opc_connections
    """),
    "X9 — UTF-8 encode of the password DTO (Helpers/AutoMapperProfiles.cs:13-14)",
)
def q_x9(spark, sf_dir):
    return C.opc_client_connections(spark).select(
        "connection_name",
        F.octet_length(F.encode("password", "UTF-8")).cast("long").alias("n_bytes"),
    )


@register(
    "q_x10_json_parse",
    C.with_fixture_ctes("""
        SELECT event_id, CAST(json_extract(props, '$.k') AS INT) AS k
        FROM events
    """),
    "X10 — JSON deserialize (config load, OpcSubscribeService.cs:449-470) "
    "exercised on the events.props JSON column",
)
def q_x10(spark, sf_dir):
    ev = C.load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("k"),
    )


@register(
    "q_x11_url_parse",
    C.with_fixture_ctes("""
        SELECT DISTINCT server_url,
               regexp_extract(server_url, '^[a-z.]+://([^:/]+)', 1) AS host,
               TRY_CAST(nullif(regexp_extract(server_url, ':(\\d+)$', 1), '')
                        AS INT) AS port
        FROM opc_updates
    """),
    "X11 — URL host/port parse for the TCP probe "
    "(OpcSubscribeService.cs:852-855). A port-less URL yields NULL in "
    "BOTH engines (Spark's cast of the empty match is NULL; the oracle "
    "needs TRY_CAST + nullif — a bare CAST('' AS INT) hard-errors in "
    "DuckDB instead of producing a comparable row)",
)
def q_x11(spark, sf_dir):
    u = _upd(spark, sf_dir).select("server_url").distinct()
    return u.select(
        "server_url",
        F.regexp_extract("server_url", r"^[a-z.]+://([^:/]+)", 1).alias("host"),
        F.regexp_extract("server_url", r":(\d+)$", 1).cast("int").alias("port"),
    )


@register(
    "q_x12_null_coalesce",
    C.with_fixture_ctes("""
        SELECT event_id,
               coalesce(nullif(value, 0.0), -1.0) AS v
        FROM opc_updates
    """),
    "X12 — null coalesce to SQL NULL / DBNull (OpcSubscribeService.cs:605)",
)
def q_x12(spark, sf_dir):
    return _upd(spark, sf_dir).select(
        "event_id",
        F.coalesce(F.nullif(F.col("value"), F.lit(0.0)), F.lit(-1.0)).alias("v"),
    )


@register(
    "q_x13_trim",
    C.with_fixture_ctes("""
        SELECT connection_name, trim(username) AS username_trim
        FROM opc_connections
    """),
    "X13 — username/password trim (Services/OpcuaHelperService.cs:282-289)",
)
def q_x13(spark, sf_dir):
    return C.opc_client_connections(spark).select(
        "connection_name", F.trim("username").alias("username_trim")
    )
