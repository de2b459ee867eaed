"""Unit tests for operator edge semantics (VERDICT r1 item 8): scaling
defaults and dispatch, staleness boundary, tie-break determinism, venn
partition, merge sinks, browse pruning, jsTree shape."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

def test_bucketed_state_join_is_exchange_free(spark, tmp_path):
    """The bucketed modvalues layout (sink.write_bucketed_state) must let
    key-joins run without ANY exchange: both sides read the fixed bucket
    scheme, so the per-round MERGE shuffle disappears at 100 TB."""
    from opcua_ingestion_engine_spark.operators import sink

    df = spark.createDataFrame(
        [(f"DEV-{i % 7}", f"m{i % 3}", float(i)) for i in range(100)],
        "device string, measure_name string, tag_value double",
    )
    sink.write_bucketed_state(df, "bucketed_modvalues", num_buckets=4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # disable broadcast so the planner must pick a keyed join — the
        # case bucketing exists for (at 100 TB neither side broadcasts)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        t = spark.table("bucketed_modvalues")
        joined = t.alias("a").join(
            t.alias("b"), ["device", "measure_name"], "inner"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert joined.count() >= 100
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bucketed_modvalues")


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s).replace(tzinfo=None)


# ---------------------------------------------------------------------------
# X1-X3 scaling
# ---------------------------------------------------------------------------

def _scale(spark, mode, value, slope=None, offset=None, factor=None, tmin=None):
    from opcua_ingestion_engine_spark.functions.scaling import apply_scaling

    df = spark.createDataFrame(
        [(str(value), mode, slope, offset, factor, tmin)],
        "v string, mode string, slope string, offset string, "
        "factor string, tmin string",
    )
    out = df.select(
        apply_scaling(
            F.col("v").cast("decimal(18,6)"),
            F.col("mode"),
            F.col("slope").cast("decimal(10,4)"),
            F.col("offset").cast("decimal(10,4)"),
            F.col("factor").cast("decimal(10,4)"),
            F.col("tmin").cast("decimal(10,4)"),
        ).alias("r")
    )
    return out.collect()[0]["r"]


def test_slope_intercept_defaults(spark):
    # defaults slope=1, offset=0 (Models/OpcTemplates.cs:42-45) => round(v,3)
    assert _scale(spark, "slope_intercept", 12.3456, "1", "0") == 12.346


def test_slope_intercept_scaling(spark):
    assert _scale(spark, "slope_intercept", 10, "2.5", "1.0") == 26.0


def test_point_slope_scaling(spark):
    assert _scale(spark, "point_slope", 50, factor="0.2", tmin="0.0") == 10.0


def test_unknown_mode_passthrough(spark):
    # C# switch default: identity (OpcSubscribeService.cs:568-576)
    assert _scale(spark, "banana", 7.125) == 7.125
    assert _scale(spark, None, 7.125) == 7.125


def test_round_half_behavior(spark):
    # Spark round() on DECIMAL is HALF_UP — pin it so oracle drift is loud
    assert _scale(spark, "slope_intercept", 1.0005, "1", "0") == 1.001
    assert _scale(spark, "slope_intercept", -1.0005, "1", "0") == -1.001


# ---------------------------------------------------------------------------
# F3 staleness boundary
# ---------------------------------------------------------------------------

def test_staleness_boundary_exact_timeout_passes(spark):
    from opcua_ingestion_engine_spark.operators.ingest import staleness_filter

    conns = spark.createDataFrame([(0, 30000)], "conn_id int, timeout_ms int")
    rows = [
        (1, 0, ts("2024-01-01T00:00:00"), ts("2024-01-01T00:00:30")),  # == 30000ms
        (2, 0, ts("2024-01-01T00:00:00"), ts("2024-01-01T00:00:30.000001")),
    ]
    u = spark.createDataFrame(
        rows, "event_id long, conn_id int, source_ts timestamp, received_ts timestamp"
    )
    kept = [r["event_id"] for r in staleness_filter(u, conns).collect()]
    assert kept == [1]  # <= passes, strictly-greater dropped


# ---------------------------------------------------------------------------
# A2 tie-break determinism
# ---------------------------------------------------------------------------

def test_latest_per_key_tiebreak_on_event_id(spark):
    from opcua_ingestion_engine_spark.operators.ingest import latest_per_key

    t = ts("2024-01-01T00:00:00")
    u = spark.createDataFrame(
        [("d", "m", 1.0, t, 5), ("d", "m", 2.0, t, 9), ("d", "m", 3.0, t, 7)],
        "daq_name string, measure_name string, value double, "
        "received_ts timestamp, event_id long",
    )
    out = latest_per_key(u, payload=["value", "received_ts", "event_id"]).collect()
    assert len(out) == 1 and out[0]["value"] == 2.0  # highest event_id wins


# ---------------------------------------------------------------------------
# J5 venn partition
# ---------------------------------------------------------------------------

def test_venn_partition_sides(spark):
    from opcua_ingestion_engine_spark.operators.reconcile import venn_partition

    left = spark.createDataFrame([("a",), ("b",), ("b",)], "k string")
    right = spark.createDataFrame([("b",), ("c",)], "k string")
    out = {r["k"]: r["venn_side"] for r in venn_partition(left, right, ["k"]).collect()}
    assert out == {"a": "left_only", "b": "both", "c": "right_only"}


# ---------------------------------------------------------------------------
# S9/S10/S11 sinks
# ---------------------------------------------------------------------------

@pytest.fixture()
def current_tbl(spark):
    return spark.createDataFrame(
        [
            ("d1", "click", 1.0, 1.0, "t0"),
            ("d1", "myPV_online", 1.0, 1.0, "t0"),
            ("d2", "click", 2.0, 2.0, "t0"),
        ],
        "device string, measure_name string, tag_value double, "
        "measure_value double, last_updated string",
    ).withColumn("tag_name", F.when(
        F.col("measure_name") == "myPV_online", F.lit("myPV_online")
    ).otherwise(F.concat(F.col("measure_name"), F.lit("_raw"))))


def test_upsert_matched_updates_only_matches(spark, current_tbl):
    from opcua_ingestion_engine_spark.operators.sink import upsert_values

    inc = spark.createDataFrame(
        [("d1", "click", 9.0, ts("2024-01-01T00:00:01")),
         ("d9", "click", 8.0, ts("2024-01-01T00:00:01"))],  # no such row: ignored
        "device string, measure_name string, scaled_value double, "
        "received_ts timestamp",
    )
    out = {(r["device"], r["measure_name"]): r for r in upsert_values(current_tbl, inc).collect()}
    assert len(out) == 3  # S9 never inserts
    assert out[("d1", "click")]["tag_value"] == 9.0
    assert out[("d1", "click")]["measure_value"] == 9.0
    assert out[("d2", "click")]["tag_value"] == 2.0  # untouched
    assert out[("d1", "click")]["last_updated"].startswith("2024-01-01T00:00:01")


def test_insert_if_missing_keeps_existing(spark, current_tbl):
    from opcua_ingestion_engine_spark.operators.sink import insert_if_missing

    seeds = spark.createDataFrame(
        [("d1", "click", 0.0, 0.0, "seed", "click_raw"),
         ("d3", "view", 0.0, 0.0, "seed", "view_raw")],
        "device string, measure_name string, tag_value double, "
        "measure_value double, last_updated string, tag_name string",
    )
    out = insert_if_missing(current_tbl, seeds, ["device", "measure_name"])
    rows = {(r["device"], r["measure_name"]): r for r in out.collect()}
    assert len(rows) == 4
    assert rows[("d1", "click")]["tag_value"] == 1.0  # existing kept, not zeroed
    assert rows[("d3", "view")]["last_updated"] == "seed"


def test_bulk_reset_only_touches_online_rows(spark, current_tbl):
    from opcua_ingestion_engine_spark.operators.sink import bulk_reset_online

    out = {(r["device"], r["measure_name"]): r
           for r in bulk_reset_online(current_tbl, "RESET").collect()}
    assert out[("d1", "myPV_online")]["tag_value"] == 0.0
    assert out[("d1", "myPV_online")]["last_updated"] == "RESET"
    assert out[("d1", "click")]["tag_value"] == 1.0
    assert out[("d1", "click")]["last_updated"] == "t0"


# ---------------------------------------------------------------------------
# B1 browse: exclusion prunes whole subtree
# ---------------------------------------------------------------------------

@pytest.fixture()
def tiny_tree(spark):
    rows = [
        (0, None, "root", "Objects", "Object"),
        (0, "root", "a", "DeviceA", "Object"),
        (0, "root", "b", "Diagnostics", "Object"),
        (0, "a", "a1", "Temp", "Variable"),
        (0, "b", "b1", "Hidden", "Variable"),   # pruned with parent
        (0, "a", "a2", "Server", "Method"),     # F7: class filtered
        (1, None, "root1", "Objects", "Object"),
        (1, "root1", "c", "Diagnostics", "Object"),  # conn 1 has no exclusions
    ]
    return spark.createDataFrame(
        rows,
        "conn_id int, parent_id string, node_id string, display_name string, "
        "node_class string",
    )


def test_browse_tree_prunes_excluded_subtrees(spark, tiny_tree):
    from opcua_ingestion_engine_spark.operators.browse import browse_tree

    excl = spark.createDataFrame([(0, "Diagnostics")], "conn_id int, folder string")
    out = browse_tree(tiny_tree, excl)
    ids = {(r["conn_id"], r["node_id"]): r for r in out.collect()}
    assert (0, "b") not in ids and (0, "b1") not in ids  # subtree pruned
    assert (0, "a2") not in ids  # Method class filtered (F7)
    assert (1, "c") in ids  # same name, other connection: kept
    assert ids[(0, "a1")]["depth"] == 2 and ids[(0, "a1")]["opened"]


def test_jstree_export_shape(spark, tiny_tree):
    from opcua_ingestion_engine_spark.operators.browse import browse_tree, jstree_export

    excl = spark.createDataFrame([(0, "Diagnostics")], "conn_id int, folder string")
    roots = jstree_export(browse_tree(tiny_tree, excl), conn_id=0)
    assert len(roots) == 1
    root = roots[0]
    assert root["text"] == "Objects" and root["state"]["opened"] is True
    assert [c["text"] for c in root["children"]] == ["DeviceA"]
    assert root["children"][0]["children"][0]["data"]["type"] == "Variable"


def test_jstree_write_and_tempfile_guard(spark, tiny_tree, tmp_path):
    """S12 — JSON file sink: writes <name>.json (indented, lowercase keys)
    and skips when another job holds the temp file."""
    import json
    import os

    from opcua_ingestion_engine_spark.operators.browse import browse_tree, jstree_write

    excl = spark.createDataFrame([(0, "Diagnostics")], "conn_id int, folder string")
    tree = browse_tree(tiny_tree, excl)
    out = jstree_write(tree, 0, str(tmp_path))
    assert out == str(tmp_path / "connection-0.json")
    doc = json.loads((tmp_path / "connection-0.json").read_text())
    assert doc[0]["text"] == "Objects"
    assert set(doc[0]) == {"id", "text", "state", "data", "children"}  # lowercase
    # temp-file guard: a concurrent job's tmp file blocks the write
    (tmp_path / "connection-0.json.tmp").write_text("")
    assert jstree_write(tree, 0, str(tmp_path)) is None
    os.unlink(tmp_path / "connection-0.json.tmp")
    assert jstree_write(tree, 0, str(tmp_path)) == str(tmp_path / "connection-0.json")


def test_browse_job_registry_gates_and_reports(spark):
    """B5 — async job registry: one job per connection, status visible."""
    import threading

    from opcua_ingestion_engine_spark.operators.browse import BrowseJobRegistry

    reg = BrowseJobRegistry()
    gate = threading.Event()

    assert reg.status(0) == "unknown"
    assert reg.start(0, gate.wait) is True
    assert reg.status(0) == "running"
    assert reg.start(0, gate.wait) is False  # one job per connection
    gate.set()
    assert reg.join(0) == "done"
    assert reg.start(0, lambda: 1 / 0) is True  # finished job can restart
    assert reg.join(0) == "failed"


def test_approx_count_distinct_error_bound(spark):
    """q_agg_approx_distinct is rows-only (HLL sketches are
    engine-specific); pin its estimates to within 5x the configured
    rsd=0.02 of the exact distinct counts so the sketch path stays
    honest."""
    from opcua_ingestion_engine_spark.plans import QUERIES
    from tests.conftest import SF_CORRECT

    approx = {
        r["l_returnflag"]: r
        for r in QUERIES["q_agg_approx_distinct"].fn(spark, SF_CORRECT).collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in QUERIES["q_agg_count_distinct"].fn(spark, SF_CORRECT).collect()
    }
    assert set(approx) == set(exact) and approx
    for flag, e in exact.items():
        a = approx[flag]
        for ac, ec in (("n_supp_approx", "n_supp"), ("n_part_approx", "n_part")):
            rel_err = abs(a[ac] - e[ec]) / e[ec]
            assert rel_err <= 0.10, (flag, ac, a[ac], e[ec], rel_err)


def test_event_date_partition_pruning(spark, tmp_path):
    """The date-partitioned event layout must let Spark prune partitions
    for time-bounded queries: a single-day filter shows the predicate
    under PartitionFilters (not PushedFilters) and reads exactly one
    partition directory's rows."""
    from opcua_ingestion_engine_spark import catalog as C
    from opcua_ingestion_engine_spark.operators import sink
    from tests.conftest import SF_CORRECT

    ev = C.load_table(spark, SF_CORRECT, "events")
    path = str(tmp_path / "events_by_date")
    sink.write_events_partitioned(ev, path)

    day = ev.select(F.to_date(F.min("ts")).alias("d")).first()["d"]
    t = spark.read.parquet(path)
    one_day = t.filter(F.col("event_date") == F.lit(day))
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(event_date" in plan, plan
    expected = ev.filter(F.to_date("ts") == F.lit(day)).count()
    assert expected > 0
    assert one_day.count() == expected
    # full-fidelity ts column still present for exact bounds
    assert "ts" in t.columns


def test_compact_small_files_preserves_rows(spark, tmp_path):
    """Compaction must collapse a many-small-file table to the computed
    file count without changing its contents."""
    from opcua_ingestion_engine_spark.operators import sink

    path = str(tmp_path / "small_files")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)
    import glob
    assert len(glob.glob(path + "/*.parquet")) >= 32
    n = sink.compact_small_files(spark, path, target_file_bytes=1 << 30)
    assert n == 1
    out = spark.read.parquet(path)
    assert out.count() == 10_000
    assert out.agg(F.sum("v")).collect()[0][0] == 10_000 * 9_999


def test_browse_shuffled_fallback_matches_broadcast(spark):
    """B1's bushy-wide fallback (shuffled frontier join per level) must
    walk the identical tree as the broadcast-frontier default."""
    from opcua_ingestion_engine_spark import catalog as C
    from opcua_ingestion_engine_spark.operators import browse
    from tests.conftest import SF_SMOKE

    nodes = C.browse_nodes(spark, SF_SMOKE)
    excl = C.browse_exclusion_folders(spark)
    a = browse.browse_tree(nodes, excl)
    b = browse.browse_tree(nodes, excl, broadcast_frontier=False)

    def key(df):
        return sorted(
            tuple("" if v is None else v for v in r) for r in df.collect()
        )

    assert key(a) == key(b) and len(key(a)) > 0


def test_zorder_layout_prunes_both_dimensions(spark, tmp_path):
    """Z-ordered parquet must give file-stat pruning on BOTH interleaved
    columns; a single-column sort gives perfect pruning on one and none
    on the other. Pruning is measured from real parquet footer min/max
    stats, the same statistics a scan's file/row-group skipping uses."""
    import glob

    import pyarrow.parquet as pq

    from opcua_ingestion_engine_spark import catalog as C
    from opcua_ingestion_engine_spark.operators import sink
    from tests.conftest import SF_SMOKE

    ev = C.load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "value"
    )

    def files_touched(path, col, point):
        touched, total = 0, 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.to_arrow_schema().get_field_index(col)
            hit = False
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or (st.min <= point <= st.max):
                    hit = True
            total += 1
            touched += int(hit)
        assert total >= 6, f"expected several files, got {total}"
        return touched, total

    zpath = str(tmp_path / "z")
    sink.write_zordered(ev, zpath, "user_id", "value", n_files=8)
    zx, nx = files_touched(zpath, "user_id", 42)
    zy, ny = files_touched(zpath, "value", 9.0)

    spath = str(tmp_path / "sorted_x")
    (
        ev.repartitionByRange(8, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )
    sx, _ = files_touched(spath, "user_id", 42)
    sy, ns = files_touched(spath, "value", 9.0)

    # single-column sort: perfect on x, useless on y
    assert sx <= 2
    assert sy == ns
    # z-order: real pruning on BOTH dimensions
    assert zx <= nx * 3 // 4, (zx, nx)
    assert zy <= ny * 3 // 4, (zy, ny)

    # layout change must not change content
    back = spark.read.parquet(zpath)
    assert back.count() == ev.count()
    a = {tuple(r) for r in back.collect()}
    b = {tuple(r) for r in ev.collect()}
    assert a == b


def test_new_operators_tolerate_empty_inputs(spark):
    """Empty-input sweep for the round-3 operator surface: every operator
    must return an empty frame of its declared shape (or an empty merge
    list), never crash — the behavior a pipeline hits on an empty
    partition, a fully-filtered corpus, or a cold-start table."""
    from opcua_ingestion_engine_spark.operators import bpe as B
    from opcua_ingestion_engine_spark.operators import similarity as S
    from opcua_ingestion_engine_spark.operators import text as T
    from opcua_ingestion_engine_spark.operators import timeseries as TS

    docs = spark.createDataFrame([], "doc_id long, text string")
    ev = spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp, value double, "
            "event_type string"
    )
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")

    assert T.frequent_tokens(docs).count() == 0
    assert T.unigram_logprob(docs).count() == 0
    assert T.token_entropy(docs).count() == 0
    assert B.bpe_train(docs, n_merges=3) == []
    assert B.bpe_segment(docs, []).count() == 0
    assert TS.downsample_ohlc(ev).count() == 0
    assert TS.rolling_zscore_anomalies(ev).count() == 0
    assert TS.multires_rollup(ev).count() == 0
    assert TS.cohort_retention(ev).count() == 0
    # funnel on zero users still emits its 3 zero-count step rows
    funnel = {(r["step_name"], r["n_users"])
              for r in TS.funnel_counts(ev).collect()}
    assert funnel == {("view", 0), ("click", 0), ("purchase", 0)}
    # ANN family: empty corpus and/or empty query set -> empty result
    for fn in (S.brute_force_topk, S.pq_topk, S.ivf_topk, S.ivfpq_topk):
        assert fn(emb, emb.limit(0)).count() == 0, fn.__name__

    from opcua_ingestion_engine_spark.operators import datapipe as DP

    sdocs = spark.createDataFrame(
        [], "doc_id long, text string, source string"
    )
    assert DP.domain_mix_quota(sdocs).count() == 0
    assert DP.global_shuffle(sdocs).count() == 0
    assert DP.quality_topk_per_domain(sdocs).count() == 0
    assert DP.epoch_expand(sdocs, {"a": 2.5}).count() == 0
    lemb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    assert S.domain_diversity(lemb).count() == 0


def test_check_constraints_counts_planted_violations(spark):
    """The validation report must count every planted defect exactly:
    2 nulls, 1 out-of-range, 1 bad category, 2 surplus duplicate keys —
    and NULL predicate inputs fail their rule (absent data violates an
    expectation), matching the SQL CASE WHEN semantics of the oracle."""
    from opcua_ingestion_engine_spark.operators import validate as V

    rows = [
        (1, 10, "A", 5.0),
        (1, 11, "A", 6.0),     # dup key 1
        (1, 12, "A", 7.0),     # dup key 1 again
        (2, None, "A", 8.0),   # null custkey
        (3, 13, "B", 9.0),     # bad category
        (4, 14, "A", 99.0),    # out of range
        (5, None, "A", None),  # null custkey AND null value (range fails)
    ]
    df = spark.createDataFrame(
        rows, "k long, ck long, cat string, v double"
    )
    got = {
        r["rule"]: (r["n_violations"], r["passed"])
        for r in V.check_constraints(
            df,
            [V.not_null("ck"), V.in_range("v", 0, 50), V.is_in("cat", ["A"])],
            unique_cols=["k"],
        ).collect()
    }
    assert got == {
        "not_null(ck)": (2, False),
        "in_range(v,0,50)": (2, False),   # 99.0 and the NULL both fail
        "is_in(cat,[A])": (1, False),
        "unique(k)": (2, False),          # three rows share key 1 -> 2 surplus
    }

    clean = spark.createDataFrame([(1, 1, "A", 1.0)], "k long, ck long, cat string, v double")
    assert all(
        r["passed"] and r["n_violations"] == 0
        for r in V.check_constraints(
            clean, [V.not_null("ck")], unique_cols=["k"]
        ).collect()
    )


def test_perpoint_state_keys_on_config_tag_not_stream_tag(spark):
    """A stream whose tag field diverges from the template's tag must
    still fold into ONE state row per configured (device, measure),
    carrying the CONFIG tag — grouping on the stream tag would split
    the point into never-merged rows and disagree with S10 seeds."""
    from opcua_ingestion_engine_spark.operators.ingest import perpoint_state

    rows = [
        ("d1", "click", "inverter", "weird_tag", "click_raw", "W",
         0, "5.0", ts("2024-01-01T00:00:01"), 1),
        ("d1", "click", "inverter", "click_raw", "click_raw", "W",
         0, "7.0", ts("2024-01-01T00:00:02"), 2),
    ]
    joined = spark.createDataFrame(
        rows,
        "daq_name string, measure_name string, device_type string, "
        "tag_name string, cfg_tag_name string, unit string, "
        "status_code int, value string, received_ts timestamp, "
        "event_id long",
    ).selectExpr(
        "*", "CAST(NULL AS string) AS scale_mode",
        "CAST(NULL AS decimal(10,4)) AS slope",
        "CAST(NULL AS decimal(10,4)) AS offset",
        "CAST(NULL AS decimal(10,4)) AS factor",
        "CAST(NULL AS decimal(10,4)) AS target_min",
    )
    out = perpoint_state(joined).collect()
    assert len(out) == 1
    assert out[0]["tag_name"] == "click_raw"
    assert out[0]["good_latest"]["event_id"] == 2


def test_browse_tree_handles_cycles_and_diamonds(spark):
    """The address space is a reference GRAPH: a cycle must terminate
    with each node emitted ONCE at its shallowest depth, and a diamond
    (two parents) must emit the child once, not twice."""
    from opcua_ingestion_engine_spark.operators.browse import browse_tree

    rows = [
        # cycle: root -> A -> B -> A
        (0, None, "root", "root", "Object"),
        (0, "root", "A", "A", "Object"),
        (0, "A", "B", "B", "Object"),
        (0, "B", "A", "A", "Object"),
        # diamond: root -> C, root -> D, C -> E, D -> E
        (0, "root", "C", "C", "Object"),
        (0, "root", "D", "D", "Object"),
        (0, "C", "E", "E", "Variable"),
        (0, "D", "E", "E", "Variable"),
    ]
    nodes = spark.createDataFrame(
        rows,
        "conn_id int, parent_id string, node_id string, "
        "display_name string, node_class string",
    )
    excl = spark.createDataFrame([], "conn_id int, folder string")
    out = browse_tree(nodes, excl).collect()
    ids = [r["node_id"] for r in out]
    assert sorted(ids) == ["A", "B", "C", "D", "E", "root"]  # each once
    depth = {r["node_id"]: r["depth"] for r in out}
    assert depth == {"root": 0, "A": 1, "C": 1, "D": 1, "B": 2, "E": 2}


def test_jstree_write_recovers_stale_lock(spark, tmp_path):
    """A crashed writer's orphan .tmp must not wedge the export forever:
    fresh locks still skip (live contention), stale locks are reclaimed."""
    import os
    import time

    from opcua_ingestion_engine_spark.operators.browse import (
        browse_tree, jstree_write,
    )

    nodes = spark.createDataFrame(
        [(0, None, "root", "root", "Object")],
        "conn_id int, parent_id string, node_id string, "
        "display_name string, node_class string",
    )
    excl = spark.createDataFrame([], "conn_id int, folder string")
    tree = browse_tree(nodes, excl)
    out = str(tmp_path)

    tmp = os.path.join(out, "connection-0.json.tmp")
    open(tmp, "w").close()
    # fresh lock: live contention, skip
    assert jstree_write(tree, 0, out) is None
    # stale lock: reclaimed, write succeeds
    os.utime(tmp, (time.time() - 7200, time.time() - 7200))
    path = jstree_write(tree, 0, out)
    assert path and os.path.exists(path) and not os.path.exists(tmp)


def test_jstree_export_rejects_orphan_parents(spark):
    """Exporting a slice that lost a parent must fail loudly, never
    silently promote the orphan to a root."""
    import pytest as _pytest

    from opcua_ingestion_engine_spark.operators.browse import (
        browse_tree, jstree_export,
    )

    nodes = spark.createDataFrame(
        [(0, None, "root", "root", "Object"),
         (0, "root", "A", "A", "Object"),
         (0, "A", "B", "B", "Variable")],
        "conn_id int, parent_id string, node_id string, "
        "display_name string, node_class string",
    )
    excl = spark.createDataFrame([], "conn_id int, folder string")
    tree = browse_tree(nodes, excl)
    assert len(jstree_export(tree, 0)) == 1  # full tree: fine
    with _pytest.raises(ValueError, match="not in the exported slice"):
        jstree_export(tree.filter(F.col("depth") >= 1), 0)


def test_lang_id_works_without_ground_truth_column(spark):
    from opcua_ingestion_engine_spark.operators.text import lang_id

    docs = spark.createDataFrame(
        [(1, "the cat and the hat is a cat"), (2, "der hund und die katze ist")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lang_guess"] for r in lang_id(docs, extra=()).collect()}
    assert out == {1: "en", 2: "de"}


def test_upsert_matched_null_value_overwrites(spark, current_tbl):
    """MERGE WHEN MATCHED overwrites every SET column together: a matched
    row with a NULL incoming value writes NULL and still advances
    last_updated — per-column coalesce would keep the stale value under
    a fresh timestamp."""
    from opcua_ingestion_engine_spark.operators.sink import upsert_values

    inc = spark.createDataFrame(
        [("d1", "click", None, ts("2024-01-01T00:00:05"))],
        "device string, measure_name string, scaled_value double, "
        "received_ts timestamp",
    )
    out = {(r["device"], r["measure_name"]): r
           for r in upsert_values(current_tbl, inc).collect()}
    row = out[("d1", "click")]
    assert row["tag_value"] is None and row["measure_value"] is None
    assert row["last_updated"].startswith("2024-01-01T00:00:05")
    assert out[("d2", "click")]["tag_value"] == 2.0  # unmatched untouched


def test_compact_refuses_partitioned_and_handles_empty(spark, tmp_path):
    from opcua_ingestion_engine_spark.operators import sink

    # hive-partitioned table: refuse, never flatten
    ev = spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02")], "id long, event_date string"
    )
    p = str(tmp_path / "parts")
    ev.write.partitionBy("event_date").parquet(p)
    with pytest.raises(ValueError, match="hive-partitioned"):
        sink.compact_small_files(spark, p)
    # content untouched by the refusal
    assert spark.read.parquet(p).count() == 2

    # empty directory: no-op, not a schema-inference crash
    empty = tmp_path / "empty"
    empty.mkdir()
    assert sink.compact_small_files(spark, str(empty)) == 0


def test_text_operators_survive_hostile_inputs(spark):
    """Latent-input regression pins: (1) empty-text documents flow
    through the quality metrics as 0-ratios instead of raising
    DIVIDE_BY_ZERO under ANSI mode; (2) pattern extraction counts
    capitalized words (group-less regex needs idx=0 — the default group
    index crashes); (3) an explicitly empty sentiment lexicon means
    zero hits, not the default lexicon."""
    from opcua_ingestion_engine_spark.operators.text import (
        quality_metrics, sentiment_score,
    )
    from opcua_ingestion_engine_spark import plans

    docs = spark.createDataFrame(
        [(1, ""), (2, "The Cat sat 42 times"), (3, "plain words only")],
        "doc_id long, text string",
    )
    m = {r["doc_id"]: r for r in quality_metrics(docs).collect()}
    assert m[1]["punct_ratio"] == 0.0 and m[1]["upper_ratio"] == 0.0

    pat = plans.QUERIES["q_e4_pattern_extract"].fn
    import opcua_ingestion_engine_spark.catalog as C  # noqa: F401
    # run the registered query body against the hostile frame directly
    from pyspark.sql import functions as F2
    counts = {
        r["doc_id"]: (r["n_numbers"], r["n_capitalized"])
        for r in docs.select(
            "doc_id",
            F2.size(F2.regexp_extract_all("text", F2.lit(r"[0-9]+(\.[0-9]+)?"), 0)).cast("long").alias("n_numbers"),
            F2.size(F2.regexp_extract_all("text", F2.lit(r"[A-Z][a-z]+"), 0)).cast("long").alias("n_capitalized"),
        ).collect()
    }
    assert counts[2] == (1, 2) and counts[3] == (0, 0)

    s = {r["doc_id"]: (r["n_pos"], r["label"])
         for r in sentiment_score(docs.filter("doc_id = 3"),
                                  positive=[], negative=["only"]).collect()}
    assert s[3] == (0, "negative")


def test_check_constraints_empty_batch_passes_cleanly(spark):
    """An EMPTY ingest batch must pass every predicate rule with
    n_violations=0 / passed=True — sum() over zero rows yields NULL, and
    without the coalesce that NULL propagated into the quality gate
    (ADVICE r3 #1: the one operator that could emit a wrong answer)."""
    from opcua_ingestion_engine_spark.operators import validate as V

    empty = spark.createDataFrame([], "k long, ck long, v double")
    got = {
        r["rule"]: (r["n_violations"], r["passed"])
        for r in V.check_constraints(
            empty, [V.not_null("ck"), V.in_range("v", 0, 50)], unique_cols=["k"]
        ).collect()
    }
    assert got == {
        "not_null(ck)": (0, True),
        "in_range(v,0,50)": (0, True),
        "unique(k)": (0, True),
    }


def test_check_constraints_duplicate_rule_names_keep_both_rows(spark):
    """Two rules sharing a name must emit two report rows — the old
    create_map unpivot crashed under mapKeyDedupPolicy=EXCEPTION (or
    silently dropped one count under LAST_WIN)."""
    from pyspark.sql import functions as F

    from opcua_ingestion_engine_spark.operators import validate as V

    df = spark.createDataFrame([(1, None), (2, 5)], "k long, ck long")
    rows = V.check_constraints(
        df,
        [("dup_rule", F.col("ck").isNotNull()), ("dup_rule", F.col("k") > 0)],
    ).collect()
    assert [(r["rule"], r["n_violations"], r["passed"]) for r in rows] == [
        ("dup_rule", 1, False),
        ("dup_rule", 0, True),
    ]


def test_jstree_stale_reclaim_single_winner(spark, tmp_path):
    """Two recoverers racing one stale lock: the atomic quarantine-rename
    guarantees exactly one publishes and the published JSON is complete
    (ADVICE r3 #3 — unlink+O_EXCL let one writer publish the other's
    half-written file)."""
    import json
    import os
    import threading
    import time

    from opcua_ingestion_engine_spark.operators.browse import (
        browse_tree, jstree_write,
    )

    nodes = spark.createDataFrame(
        [(0, None, "root", "root", "Object"), (0, "root", "A", "A", "Variable")],
        "conn_id int, parent_id string, node_id string, "
        "display_name string, node_class string",
    )
    excl = spark.createDataFrame([], "conn_id int, folder string")
    tree = browse_tree(nodes, excl).localCheckpoint(eager=True)
    out = str(tmp_path)
    tmp = os.path.join(out, "connection-0.json.tmp")
    open(tmp, "w").close()
    os.utime(tmp, (time.time() - 7200, time.time() - 7200))

    barrier = threading.Barrier(2)
    results = [None, None]

    def recover(i):
        barrier.wait()
        results[i] = jstree_write(tree, 0, out)

    threads = [threading.Thread(target=recover, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    published = [r for r in results if r is not None]
    assert len(published) == 1
    with open(published[0]) as f:
        roots = json.load(f)  # complete, parseable JSON
    assert [n["id"] for n in roots] == ["root"]
    assert [c["id"] for c in roots[0]["children"]] == ["A"]
    # no stale/quarantine debris left behind
    assert [p for p in os.listdir(out) if ".tmp" in p or ".stale" in p] == []


def test_dim_cache_evicts_only_stopped_sessions():
    """Two LIVE SparkSessions must not wipe each other's dimension memo on
    every cache miss; only entries owned by a STOPPED context are evicted
    (ADVICE r3 #4)."""
    from opcua_ingestion_engine_spark import catalog as C

    class FakeJsc:
        def __init__(self, stopped):
            self._stopped = stopped

        def sc(self):
            return self

        def isStopped(self):
            return self._stopped

    class FakeContext:
        def __init__(self, app):
            self.applicationId = app
            self._jsc = FakeJsc(False)

        def stop(self):
            self._jsc = None

    class FakeSession:
        def __init__(self, app):
            self.sparkContext = FakeContext(app)

    class FakeDF:
        def localCheckpoint(self, eager=True):
            return self

    saved = dict(C._DIM_CACHE)
    C._DIM_CACHE.clear()
    try:
        a, b = FakeSession("app-A"), FakeSession("app-B")
        builds = {"n": 0}

        def build():
            builds["n"] += 1
            return FakeDF()

        df_a = C._memo_ckpt(a, "sf", "dims", build)
        # B's miss must NOT evict live A's entry…
        C._memo_ckpt(b, "sf", "dims", build)
        assert C._memo_ckpt(a, "sf", "dims", build) is df_a  # still cached
        assert builds["n"] == 2
        # …but once A's context stops, B's next miss evicts A's entries.
        a.sparkContext.stop()
        C._memo_ckpt(b, "sf", "other", build)
        assert all(k[0] != "app-A" for k in C._DIM_CACHE)
    finally:
        C._DIM_CACHE.clear()
        C._DIM_CACHE.update(saved)


def test_driver_lloyd_helpers_mirror_distributed_semantics():
    """Pure-numpy properties of the sampled quantizer trainers
    (operators/similarity): deterministic, k clamped to the sample,
    empty cells retain their previous centroid (never NaN), spherical
    centroids stay unit-norm, and PQ codebooks keep the (m, ksub,
    sub_dim) layout with means in the data's convex hull."""
    import numpy as np

    from opcua_ingestion_engine_spark.operators import similarity as S

    rng = np.random.Generator(np.random.PCG64(7))
    sample = rng.normal(size=(200, 16))
    sample /= np.linalg.norm(sample, axis=1, keepdims=True)

    c1 = S._lloyd_spherical(sample, k=8, iters=3)
    c2 = S._lloyd_spherical(sample.copy(), k=8, iters=3)
    assert np.array_equal(c1, c2)
    assert c1.shape == (8, 16)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)
    assert not np.isnan(c1).any()

    # k larger than the sample clamps instead of indexing out of range
    small = S._lloyd_spherical(sample[:5], k=8, iters=2)
    assert small.shape == (5, 16)

    # a far-away seed that captures no points must survive untouched:
    # plant an isolated direction as seed 0 by prepending it
    iso = np.zeros(16)
    iso[0] = -1.0
    planted = np.vstack([iso, sample[sample[:, 0] > 0.2]])
    cents = S._lloyd_spherical(planted, k=4, iters=2)
    assert not np.isnan(cents).any()

    b1 = S._lloyd_pq(sample, m=4, ksub=16, iters=3)
    b2 = S._lloyd_pq(sample.copy(), m=4, ksub=16, iters=3)
    assert np.array_equal(b1, b2)
    assert b1.shape == (4, 16, 4)
    assert not np.isnan(b1).any()
    lo, hi = sample.min(), sample.max()
    assert (b1 >= lo - 1e-12).all() and (b1 <= hi + 1e-12).all()

    import pytest as _pytest
    with _pytest.raises(ValueError, match="not divisible"):
        S._lloyd_pq(sample, m=5, ksub=8, iters=1)


def test_browse_bushy_flat_node_fallback(spark):
    """The documented bushy-wide regime, exercised for real (round-7
    verdict item 7): one flat node with 50k children — the frontier
    shape where a broadcast would strain the driver and the shuffled
    per-level join is the right dispatch. The fallback must walk the
    identical tree (counts, exclusion prune, depths) as the broadcast
    default on the same graph."""
    from opcua_ingestion_engine_spark.operators import browse

    root = spark.createDataFrame(
        [(1, None, "root", "root", "Object")],
        "conn_id int, parent_id string, node_id string, "
        "display_name string, node_class string",
    )
    children = spark.range(50_000).select(
        F.lit(1).alias("conn_id"),
        F.lit("root").alias("parent_id"),
        F.concat(F.lit("c"), F.col("id")).alias("node_id"),
        F.concat(F.lit("c"), F.col("id")).alias("display_name"),
        F.lit("Object").alias("node_class"),
    )
    # every 1000th child has one grandchild; c1000's sits under the
    # excluded folder and must be pruned WITH its parent
    grand = spark.range(50).select(
        F.lit(1).alias("conn_id"),
        F.concat(F.lit("c"), F.col("id") * 1000).alias("parent_id"),
        F.concat(F.lit("g"), F.col("id")).alias("node_id"),
        F.concat(F.lit("g"), F.col("id")).alias("display_name"),
        F.lit("Variable").alias("node_class"),
    )
    nodes = root.unionByName(children).unionByName(grand)
    excl = spark.createDataFrame([(1, "c1000")], "conn_id int, folder string")

    fallback = browse.browse_tree(nodes, excl, broadcast_frontier=False)
    rows = fallback.collect()
    # 1 root + (50k - 1 excluded) children + (50 - 1 orphaned) grandkids
    assert len(rows) == 1 + 49_999 + 49
    ids = {r["node_id"] for r in rows}
    assert "c1000" not in ids and "g1" not in ids  # subtree pruned
    assert {r["depth"] for r in rows} == {0, 1, 2}

    broadcast = browse.browse_tree(nodes, excl, broadcast_frontier=True)

    def key(df):
        return sorted(
            tuple("" if v is None else v for v in r) for r in df.collect()
        )

    assert key(fallback) == key(broadcast)
