"""[EXT] composed telemetry reports on the reference domain — the
analytics a fleet operator runs over the same update stream the
ingestion engine maintains (SURVEY.md §3.1 data path), built by
composing this package's operators rather than ad-hoc SQL.

- Downtime report: gap sessionization (``operators/timeseries.sessionize``)
  applied to each device's GOOD updates — an offline period is a gap
  larger than the 60 s liveness window (OpcSubscribeService.cs:49-52),
  i.e. a session boundary; the report is sessions-per-device plus total
  in-session uptime.
- Server watchdog, batch form: the reference's 3-minute per-server
  one-shot timer (OpcSubscribeService.cs:42,809-847) marks a whole
  server's devices offline on silence; the batch analogue compares each
  connection's last notification to the stream's logical now.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .. import catalog as C
from ..operators import ingest
from ..operators import timeseries as TS
from .registry import register


@register(
    "q_t_downtime_report",
    C.with_fixture_ctes("""
    , good AS (
        SELECT daq_name, received_ts, event_id FROM opc_updates
        WHERE status_code = 0
    ),
    flagged AS (
        SELECT daq_name, received_ts, event_id,
               CASE WHEN lag(received_ts) OVER w IS NULL
                         OR epoch_us(received_ts)
                            - epoch_us(lag(received_ts) OVER w) > 60 * 1000000
                    THEN 1 ELSE 0 END AS new_sess
        FROM good
        WINDOW w AS (PARTITION BY daq_name ORDER BY received_ts, event_id)
    ),
    sess AS (
        SELECT daq_name, received_ts,
               CAST(sum(new_sess) OVER (PARTITION BY daq_name
                                        ORDER BY received_ts, event_id
                                        ROWS UNBOUNDED PRECEDING) - 1
                    AS BIGINT) AS session_id
        FROM flagged
    ),
    per_sess AS (
        SELECT daq_name, session_id,
               epoch_us(max(received_ts)) - epoch_us(min(received_ts)) AS up_us
        FROM sess GROUP BY daq_name, session_id
    )
    SELECT daq_name AS device,
           count(*) AS n_online_periods,
           CAST(count(*) - 1 AS BIGINT) AS n_outages,
           CAST(sum(up_us) / 1000000.0 AS DOUBLE) AS uptime_s
    FROM per_sess GROUP BY daq_name
    """),
    "[EXT] composed downtime report: 60s-gap sessionization of each "
    "device's good updates (operators/timeseries.sessionize on the "
    "telemetry domain); outages = session boundaries",
)
def q_t_downtime_report(spark, sf_dir):
    good = ingest.good_quality(C.opc_updates(spark, sf_dir)).select(
        "daq_name", "received_ts", "event_id"
    )
    sess = TS.sessionize(
        good, key="daq_name", ts="received_ts", tiebreak="event_id", gap_s=60
    )
    per_sess = sess.groupBy("daq_name", "session_id").agg(
        (
            F.unix_micros(F.max("received_ts")) - F.unix_micros(F.min("received_ts"))
        ).alias("up_us")
    )
    return per_sess.groupBy(F.col("daq_name").alias("device")).agg(
        F.count("*").alias("n_online_periods"),
        (F.count("*") - 1).cast("long").alias("n_outages"),
        (F.sum("up_us") / 1_000_000.0).alias("uptime_s"),
    )


@register(
    "q_t4_server_watchdog_batch",
    C.with_fixture_ctes("""
    , last_per_conn AS (
        SELECT conn_id, max(received_ts) AS last_ts
        FROM opc_updates GROUP BY conn_id
    ),
    now_ts AS (SELECT max(received_ts) AS now FROM opc_updates)
    SELECT c.conn_id, c.connection_name,
           CAST(CASE WHEN l.last_ts IS NULL
                          OR epoch_us((SELECT now FROM now_ts))
                             - epoch_us(l.last_ts) > 180 * 1000000
                     THEN 0.0 ELSE 1.0 END AS DOUBLE) AS server_online
    FROM opc_connections c
    LEFT JOIN last_per_conn l USING (conn_id)
    """),
    "T4 (batch analogue) — 3-minute server watchdog: a connection with no "
    "notification within 180s of the logical now has its server marked "
    "offline (OpcSubscribeService.cs:42,809-847); the stateful streaming "
    "form is state.liveness_stream",
)
def q_t4_server_watchdog_batch(spark, sf_dir):
    u = C.opc_updates(spark, sf_dir)
    conns = C.opc_client_connections(spark)
    last = (
        u.groupBy("conn_id").agg(F.max("received_ts").alias("last_ts"))
        # O(connections)-sized, referenced twice (rows + global now)
        .localCheckpoint(eager=True)
    )
    now = last.agg(F.max("last_ts").alias("_now"))
    online = F.when(
        F.col("last_ts").isNotNull()
        & (
            F.unix_micros(F.col("_now")) - F.unix_micros(F.col("last_ts"))
            <= 180 * 1_000_000
        ),
        F.lit(1.0),
    ).otherwise(F.lit(0.0))
    return (
        conns.join(last, "conn_id", "left")
        .crossJoin(F.broadcast(now))
        .select("conn_id", "connection_name", online.alias("server_online"))
    )
