"""Registry entries for the config-scan / maintenance surface
(SURVEY.md §2.1 S3/S4/S8, §2.8 T3) and dedicated scalar-scaling queries
(§2.7 X1-X3 — previously exercised only inside the flagship composition).

Each entry is one small query against the shared fixtures so a red
CORRECTNESS row points at exactly one operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog as C
from ..functions.scaling import apply_scaling, point_slope_params, slope_intercept
from ..functions.timefmt import format_modvalues_ts
from ..operators import ingest
from .registry import register

# Value-domain precision for the X1-X3 SCALING arithmetic — deliberately
# decimal(18,6), NOT the decimal(38,6) the analytics modules use for
# order-independent float-parity SUMS: the scaling multiply must match
# the operators' apply_scaling types exactly. Named distinctly so the
# two recipes cannot be cross-pasted under one name.
DEC_SCALE = "decimal(18,6)"


def _upd(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.opc_updates(spark, sf_dir)


# ---------------------------------------------------------------------------
# §2.1 S3/S4/S8 — config scans
# ---------------------------------------------------------------------------

@register(
    "q_s3_template_scan",
    C.with_fixture_ctes("""
        SELECT device_type, template_name, tag_name, measure_name, unit,
               scale_mode,
               CAST(slope AS DOUBLE) AS slope,
               CAST("offset" AS DOUBLE) AS offset_v,
               CAST(factor AS DOUBLE) AS factor,
               CAST(target_min AS DOUBLE) AS target_min
        FROM sos_templates
    """),
    "S3 — template config scan flattened to one row per point "
    "(LoadOpcTemplates, OpcSubscribeService.cs:472-475; the reference's "
    "nested deviceType->template->[point] dicts as a broadcastable "
    "frame). Scale params surfaced as DOUBLE: raw DECIMAL columns "
    "round-trip through pandas as Decimal objects on one engine and "
    "float64 on the other, breaking value-hash comparison.",
)
def q_s3(spark, sf_dir):
    t = C.sos_templates(spark)
    return t.select(
        "device_type",
        "template_name",
        "tag_name",
        "measure_name",
        "unit",
        "scale_mode",
        F.col("slope").cast("double").alias("slope"),
        F.col("offset").cast("double").alias("offset_v"),
        F.col("factor").cast("double").alias("factor"),
        F.col("target_min").cast("double").alias("target_min"),
    )


@register(
    "q_s4_device_scan",
    C.with_fixture_ctes("""
        SELECT device_type, daq_name, daq_template, monitored, protocol,
               prefix, server, conn_id, point_node
        FROM site_devices
    """),
    "S4 — device config scan (LoadSiteDevices, "
    "OpcSubscribeService.cs:477-480; Models/OpcDevice.cs:7-39)",
)
def q_s4(spark, sf_dir):
    return C.site_devices(spark, sf_dir)


@register(
    "q_s8_default_injection",
    C.with_fixture_ctes("""
        , filtered AS (
            SELECT connection_name, url, max_search, timeout_ms
            FROM opc_connections WHERE max_search > 1000
        )
        SELECT * FROM filtered
        UNION ALL
        SELECT 'Ignition', 'opc.tcp://localhost:62541', 600, 60000
        WHERE NOT EXISTS (SELECT 1 FROM filtered)
    """),
    "S8 — relational connection-config scan with default-row injection: "
    "when the (here deliberately empty) filtered config is empty, the "
    "default 'Ignition' connection (MaxSearch=600, TimeoutMs=60000) is "
    "injected (Services/OpcuaHelperService.cs:74-89). Distributed form: "
    "the default row survives a filter against the 1-row count aggregate "
    "(broadcast NLJ) — no driver-side count().",
)
def q_s8(spark, sf_dir):
    conns = C.opc_client_connections(spark).select(
        "connection_name", "url", "max_search", "timeout_ms"
    )
    filtered = conns.filter(F.col("max_search") > 1000)
    default = spark.createDataFrame(
        [("Ignition", "opc.tcp://localhost:62541", 600, 60000)],
        "connection_name string, url string, max_search int, timeout_ms int",
    )
    n = filtered.agg(F.count("*").alias("_n"))
    inject = default.crossJoin(F.broadcast(n)).filter(F.col("_n") == 0).drop("_n")
    return filtered.unionByName(inject)


# ---------------------------------------------------------------------------
# §2.8 T3 — heartbeat refresh (batch analogue)
# ---------------------------------------------------------------------------

@register(
    "q_t3_heartbeat_refresh",
    C.with_fixture_ctes("""
        , good AS (SELECT * FROM opc_updates WHERE status_code = 0)
        , nowt AS (SELECT max(received_ts) AS now_ts FROM good)
        , online AS (
            SELECT d.daq_name
            FROM (SELECT DISTINCT daq_name FROM site_devices
                  WHERE monitored AND protocol = 'OPCUA') d
            JOIN (SELECT daq_name, max(received_ts) AS last_good_ts
                  FROM good GROUP BY 1) pd USING (daq_name)
            WHERE epoch_us((SELECT now_ts FROM nowt))
                  - epoch_us(pd.last_good_ts) <= 60 * 1000000
        )
        , latest AS (
            SELECT daq_name, measure_name FROM (
                SELECT u.*, row_number() OVER (
                    PARTITION BY daq_name, measure_name
                    ORDER BY received_ts DESC, event_id DESC) AS rn
                FROM opc_updates u) WHERE rn = 1
        )
        SELECT l.daq_name AS device, l.measure_name,
               strftime((SELECT now_ts FROM nowt),
                        '%Y-%m-%dT%H:%M:%S.%f') AS last_updated
        FROM latest l JOIN online o USING (daq_name)
    """),
    "T3 — heartbeat: for every device currently online, refresh "
    "last_updated to the tick timestamp across ALL its measure rows "
    "(OpcSubscribeService.cs:293-393; one UPDATE..ANY(@devices) batched "
    "statement :352-363). Batch analogue: liveness -> semi-join the "
    "per-key state -> stamp the logical now; the per-key state and the "
    "online set are each one aggregation over the same stream.",
)
def q_t3(spark, sf_dir):
    # ONE fact scan: a fused per-point aggregate (groupBy over all statuses,
    # conditional max for the good timestamp — same shape as
    # ingest.perpoint_state) yields BOTH the (device, measure) key set and,
    # via a second O(points) rollup, the per-device last-good / global-now
    # the online set needs. The naive form (liveness agg + latest agg +
    # now agg) scans the stream three times.
    u = _upd(spark, sf_dir)
    pp = (
        u.groupBy("daq_name", "measure_name")
        .agg(
            F.max(
                F.when(F.col("status_code") == 0, F.col("received_ts"))
            ).alias("lg")
        )
        .localCheckpoint(eager=True)
    )
    per_dev = pp.groupBy("daq_name").agg(F.max("lg").alias("last_good_ts"))
    now_df = per_dev.agg(F.max("last_good_ts").alias("now_ts"))
    mon = ingest.monitored_devices(C.site_devices(spark, sf_dir)).select("daq_name")
    online = (
        per_dev.join(F.broadcast(mon), "daq_name", "left_semi")
        .crossJoin(F.broadcast(now_df))
        .filter(
            F.col("last_good_ts").isNotNull()
            & (
                F.unix_micros(F.col("now_ts")) - F.unix_micros(F.col("last_good_ts"))
                <= C.LIVENESS_WINDOW_S * 1_000_000
            )
        )
        .select("daq_name")
    )
    return (
        pp.select("daq_name", "measure_name")
        .join(F.broadcast(online), "daq_name", "left_semi")
        .crossJoin(F.broadcast(now_df))
        .select(
            F.col("daq_name").alias("device"),
            "measure_name",
            format_modvalues_ts("now_ts").alias("last_updated"),
        )
    )


# ---------------------------------------------------------------------------
# §2.7 X1-X3 — dedicated scaling queries (decimal-exact both engines)
# ---------------------------------------------------------------------------

@register(
    "q_x1_slope_intercept",
    C.with_fixture_ctes("""
        SELECT event_id,
               CAST(round(CAST(value AS DECIMAL(18,6)) * CAST(2.5 AS DECIMAL(10,4))
                          + CAST(1.0 AS DECIMAL(10,4)), 3) AS DOUBLE) AS scaled
        FROM opc_updates
    """),
    "X1 — slope_intercept scaling round(v*slope+offset, 3) "
    "(OpcSubscribeService.cs:570-572); DECIMAL through the arithmetic so "
    "round is HALF_UP-exact in both engines",
)
def q_x1(spark, sf_dir):
    return _upd(spark, sf_dir).select(
        "event_id",
        slope_intercept(
            F.col("value").cast(DEC_SCALE),
            F.lit("2.5").cast("decimal(10,4)"),
            F.lit("1.0").cast("decimal(10,4)"),
        )
        .cast("double")
        .alias("scaled"),
    )


@register(
    "q_x2_point_slope_general",
    C.with_fixture_ctes("""
        SELECT event_id,
               CAST(round(
                   CAST((CAST(1.0 AS DECIMAL(10,4)) - CAST(-1.0 AS DECIMAL(10,4)))
                        / (CAST(100.0 AS DECIMAL(10,4)) - CAST(0.0 AS DECIMAL(10,4)))
                        AS DECIMAL(10,4))
                   * (CAST(value AS DECIMAL(18,6)) - CAST(0.0 AS DECIMAL(10,4)))
                   + CAST(-1.0 AS DECIMAL(10,4)), 3) AS DOUBLE) AS scaled
        FROM opc_updates
    """),
    "X2 (general 4-param form) — round((tmax-tmin)/(vmax-vmin)*(v-vmin)"
    "+tmin, 3) (OpcSubscribeService.cs:573-575). DuckDB decimal division "
    "yields DOUBLE, so the oracle re-decimalizes the factor; params are "
    "chosen so the factor (0.02) is DECIMAL(10,4)-exact, keeping both "
    "engines in exact decimal arithmetic end-to-end.",
)
def q_x2(spark, sf_dir):
    d = lambda s: F.lit(s).cast("decimal(10,4)")  # noqa: E731
    return _upd(spark, sf_dir).select(
        "event_id",
        point_slope_params(
            F.col("value").cast(DEC_SCALE), d("0.0"), d("100.0"), d("-1.0"), d("1.0")
        )
        .cast("double")
        .alias("scaled"),
    )


@register(
    "q_x3_scale_dispatch",
    C.with_fixture_ctes("""
        SELECT u.event_id, t.measure_name,
               CAST(CASE t.scale_mode
                    WHEN 'slope_intercept' THEN
                        round(CAST(u.value AS DECIMAL(18,6)) * t.slope
                              + t."offset", 3)
                    WHEN 'point_slope' THEN
                        round(CAST(u.value AS DECIMAL(18,6)) * t.factor
                              + t.target_min, 3)
                    ELSE CAST(u.value AS DECIMAL(18,6))
               END AS DOUBLE) AS scaled
        FROM opc_updates u
        JOIN sos_templates t
          ON t.device_type = 'type-0' AND t.measure_name = u.measure_name
    """),
    "X3 — scale-mode dispatch across slope_intercept / point_slope / "
    "identity-passthrough (the C# switch default) "
    "(OpcSubscribeService.cs:568-576), driven by the template catalog "
    "join; broadcast dimension, per-row codegen'd CASE",
)
def q_x3(spark, sf_dir):
    tpl = C.sos_templates(spark).filter(F.col("device_type") == "type-0")
    u = _upd(spark, sf_dir)
    joined = u.join(F.broadcast(tpl), "measure_name")
    return joined.select(
        "event_id",
        "measure_name",
        apply_scaling(
            F.col("value").cast(DEC_SCALE),
            F.col("scale_mode"),
            F.col("slope"),
            F.col("offset"),
            F.col("factor"),
            F.col("target_min"),
        ).alias("scaled"),
    )


@register(
    "q_s14_legacy_config_migration",
    C.with_fixture_ctes("""
        SELECT CAST(conn_id + 1 AS INT) AS id, connection_name, url,
               max_search, timeout_ms, folder AS exclusion_folder
        FROM opc_connections LEFT JOIN exclusion_folders USING (conn_id)
    """),
    "S14 — the legacy flat-file config migration "
    "(Migrations/20240718023204_AddClientConfig.cs:87-140): the "
    "fixture connections+exclusions are serialized to the reference's "
    "legacy opcua_client_config.json shape, migrated into the two "
    "relational tables (sequential ids in file order — the reference's "
    "evident intent; its shipped loop re-initializes the id per client "
    "and could never migrate a multi-connection file, documented in "
    "the operator), the legacy file is asserted DELETED, a rerun is "
    "asserted the already-migrated no-op, and the result is the "
    "connections LEFT JOIN folders view the post-migration services "
    "read. New nullable UserName/EncryptedPassword columns asserted "
    "all-NULL in-query.",
)
def q_s14_legacy_config_migration(spark, sf_dir):
    import json as _json
    import os

    from ..operators import tablefmt as TF
    from ..sources.config import migrate_legacy_client_config
    from .scratch import scratch_root

    conns = C.opc_client_connections(spark).collect()
    folders = C.browse_exclusion_folders(spark).collect()
    by_conn: dict = {}
    for r in folders:
        by_conn.setdefault(r["conn_id"], []).append(r["folder"])
    legacy = {
        "connections": [
            {
                "connection_name": r["connection_name"],
                "max_search": r["max_search"],
                "staleness_timeout_ms": r["timeout_ms"],
                "url": r["url"],
                "browse_exclusion_folders": by_conn.get(r["conn_id"], []),
            }
            for r in sorted(conns, key=lambda r: r["conn_id"])
        ]
    }
    work = scratch_root("s14_migration")
    json_path = os.path.join(work, "opcua_client_config.json")
    with open(json_path, "w") as f:
        _json.dump(legacy, f)
    out_root = os.path.join(work, "tables")
    vc, vf = migrate_legacy_client_config(spark, json_path, out_root)
    assert not os.path.exists(json_path), "migration must delete the file"
    # rerun with the file gone: the already-migrated no-op
    assert migrate_legacy_client_config(spark, json_path, out_root) == (vc, vf)
    ct = TF.read_version(
        spark, os.path.join(out_root, "opc_client_connections")
    )
    assert ct.filter(
        F.col("user_name").isNotNull()
        | F.col("encrypted_password").isNotNull()
    ).count() == 0, "new nullable columns must backfill NULL"
    ft = TF.read_version(
        spark, os.path.join(out_root, "browse_exclusion_folders")
    )
    assert (
        ft.filter(
            F.col("connection_opc_client_connection_id")
            != F.col("opc_client_connection_id")
        ).count()
        == 0
    ), "the migration writes both FK columns identically"
    return ct.join(
        ft.select(
            F.col("opc_client_connection_id").alias("id"),
            "exclusion_folder",
        ),
        "id",
        "left",
    ).select(
        "id", "connection_name", "url", "max_search", "timeout_ms",
        "exclusion_folder",
    )
