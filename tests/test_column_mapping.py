"""Round-11 [EXT]: column mapping — ``rename_column`` and
``drop_column`` as METADATA-ONLY commits (Delta's column-mapping
``name`` mode). Files always store PHYSICAL names (fixed at first
commit); the manifest's logical schema + ``colmap`` + ``retired``
tombstones serve renames/drops over old files with zero data bytes
rewritten. Pinned here: the zero-rewrite guarantee, reads/time-travel/
pruning/stats/DV-mutations/upserts/change-feed/streaming/restore/
compaction/matviews over a renamed table, chained renames, drop +
re-add under a fresh physical slot (old bytes never resurface),
keyed diffs spanning a drop, and the refusal surfaces (duplicate/
reserved names, constraint-referenced columns, last column)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opcua_ingestion_engine_spark.operators import tablefmt as TF


def _mk(spark, rows, schema="k long, v long"):
    return spark.createDataFrame(rows, schema).coalesce(1)


def _data_files(root):
    out = {}
    for dirpath, _dirs, files in os.walk(os.path.join(root, "data")):
        for n in files:
            if n.endswith(".parquet"):
                p = os.path.join(dirpath, n)
                out[os.path.relpath(p, root)] = os.path.getmtime(p)
    return out


def test_rename_is_metadata_only_and_reads_serve_new_name(spark, tmp_path):
    root = str(tmp_path / "ren")
    TF.commit_append(_mk(spark, [(1, 10), (2, 20)]), root)
    TF.commit_append(_mk(spark, [(3, 30)]), root)
    before = _data_files(root)
    v = TF.rename_column(root, "v", "val")
    assert v == 2
    # ZERO data bytes written: the exact same files, untouched
    assert _data_files(root) == before
    got = sorted(tuple(r) for r in TF.read_version(spark, root).collect())
    assert TF.read_version(spark, root).columns == ["k", "val"]
    assert got == [(1, 10), (2, 20), (3, 30)]
    # time travel to the pre-rename version serves the OLD name
    old = TF.read_version(spark, root, 1)
    assert old.columns == ["k", "v"]
    # the files still carry the physical name
    import pyarrow.parquet as pq

    rel = next(iter(before))
    assert "v" in pq.read_schema(os.path.join(root, rel)).names


def test_writes_after_rename_land_physical_and_read_logical(spark, tmp_path):
    import pyarrow.parquet as pq

    root = str(tmp_path / "renw")
    TF.commit_append(_mk(spark, [(1, 10)]), root)
    TF.rename_column(root, "v", "val")
    before = set(_data_files(root))
    TF.commit_append(_mk(spark, [(2, 20)], "k long, val long"), root)
    new_rel = [p for p in _data_files(root) if p not in before]
    assert len(new_rel) == 1
    # the NEW file stores the physical name too — uniform at rest
    assert pq.read_schema(os.path.join(root, new_rel[0])).names == ["k", "v"]
    got = sorted(tuple(r) for r in TF.read_version(spark, root).collect())
    assert got == [(1, 10), (2, 20)]
    # appending under the OLD name refuses (schema mismatch)
    with pytest.raises(ValueError, match="schema mismatch"):
        TF.commit_append(_mk(spark, [(9, 90)]), root)


def test_pruning_blooms_and_stats_agg_translate(spark, tmp_path):
    root = str(tmp_path / "renp")
    TF.commit_append(
        _mk(spark, [(i, i) for i in range(10)]), root,
        bloom=("k",), sums=("v",),
    )
    TF.commit_append(
        _mk(spark, [(i, i) for i in range(100, 110)]), root,
        bloom=("k",), sums=("v",),
    )
    TF.rename_column(root, "k", "key")
    TF.rename_column(root, "v", "val")
    # range pruning on the NEW name drops the disjoint directory
    audit: dict = {}
    df = TF.read_version(spark, root, prune={"key": (100, 200)}, audit=audit)
    assert audit["dirs_kept"] == 1 and audit["dirs_total"] == 2
    assert df.count() == 10
    # bloom point probe on the NEW name
    audit2: dict = {}
    TF.read_version(spark, root, prune={"key": ("=", 5)}, audit=audit2).count()
    assert audit2["dirs_kept"] == 1
    # stats_agg: metadata-only COUNT/MIN/MAX/SUM under the new names
    audit3: dict = {}
    row = TF.stats_agg(
        spark, root, cols=("key",), sums=("val",), audit=audit3
    ).collect()[0]
    assert audit3["dirs_scanned"] == 0
    assert row["row_cnt"] == 20 and row["min_key"] == 0
    assert row["max_key"] == 109
    assert row["sum_val"] == sum(range(10)) + sum(range(100, 110))
    # sums maintained across a post-rename append too
    TF.commit_append(
        _mk(spark, [(200, 7)], "key long, val long"), root, sums=("val",)
    )
    audit4: dict = {}
    row = TF.stats_agg(spark, root, sums=("val",), audit=audit4).collect()[0]
    assert audit4["dirs_scanned"] == 0 and row["sum_val"] == row["sum_val"]


def test_dv_mutations_and_upserts_speak_logical_names(spark, tmp_path):
    root = str(tmp_path / "rendv")
    TF.commit_version(_mk(spark, [(i, i * 10) for i in range(6)]), root)
    TF.rename_column(root, "v", "val")
    TF.delete_where_dv(spark, root, "val = 30")
    TF.update_where_dv(spark, root, "k = 1", {"val": "val + 5"})
    TF.commit_upsert(
        spark, root,
        _mk(spark, [(2, 999), (7, 70)], "k long, val long"),
        keys=["k"], mor=True,
    )
    TF.commit_upsert(  # CoW path too
        spark, root, _mk(spark, [(4, 444)], "k long, val long"), keys=["k"]
    )
    got = dict(
        (r["k"], r["val"]) for r in TF.read_version(spark, root).collect()
    )
    assert got == {0: 0, 1: 15, 2: 999, 4: 444, 5: 50, 7: 70}
    # CoW delete/update (rewrite path) under the new name
    TF.delete_where(spark, root, "val = 999")
    TF.update_where(spark, root, "k = 0", {"val": "val + 1"})
    got = dict(
        (r["k"], r["val"]) for r in TF.read_version(spark, root).collect()
    )
    assert got == {0: 1, 1: 15, 4: 444, 5: 50, 7: 70}
    # full sync converges to the source under the new name
    TF.commit_full_sync(
        spark, root, _mk(spark, [(1, 1), (8, 8)], "k long, val long"),
        keys=["k"],
    )
    got = sorted(tuple(r) for r in TF.read_version(spark, root).collect())
    assert got == [(1, 1), (8, 8)]


def test_change_feed_serves_v_to_names_across_rename(spark, tmp_path):
    root = str(tmp_path / "rencf")
    TF.commit_append(_mk(spark, [(1, 10)]), root)          # v0
    TF.rename_column(root, "v", "val")                     # v1 (pass-through)
    TF.commit_append(_mk(spark, [(2, 20)], "k long, val long"), root)  # v2
    TF.delete_where_dv(spark, root, "val = 10")            # v3
    feed = TF.table_changes(spark, root, None)
    assert "val" in feed.columns and "v" not in feed.columns
    rows = sorted(
        (r["_commit_version"], r["_change_type"], r["k"], r["val"])
        for r in feed.collect()
    )
    assert rows == [
        (0, "insert", 1, 10),
        (2, "insert", 2, 20),
        (3, "delete", 1, 10),
    ]
    # keyed endpoint diff SPANNING the rename compares via the physical
    # identity instead of refusing
    TF.commit_upsert(
        spark, root, _mk(spark, [(2, 999)], "k long, val long"), keys=["k"]
    )  # v4: rewrite-class
    diff = TF.table_changes(spark, root, 0, keys=["k"])
    assert "val" in diff.columns
    kinds = sorted(
        (r["_change_type"], r["k"]) for r in diff.collect()
    )
    assert ("delete", 1) in kinds and any(
        k == 2 for _ct, k in kinds
    )


def test_streaming_source_serves_logical_names(spark, tmp_path):
    from opcua_ingestion_engine_spark.streaming.tablestream import (
        TableChangesDataSource,
    )

    spark.dataSource.register(TableChangesDataSource)
    root = str(tmp_path / "renstream")
    TF.commit_append(_mk(spark, [(1, 10)]), root)
    TF.rename_column(root, "v", "val")
    TF.commit_append(_mk(spark, [(2, 20)], "k long, val long"), root)
    got: list = []
    q = (
        spark.readStream.format("table_changes")
        .option("path", root)
        .load()
        .writeStream.foreachBatch(lambda df, _id: got.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted((r["_commit_version"], r["k"], r["val"]) for r in got)
    assert rows == [(0, 1, 10), (2, 2, 20)]


def test_restore_and_compaction_respect_the_mapping(spark, tmp_path):
    root = str(tmp_path / "renmx")
    TF.commit_append(_mk(spark, [(1, 10)]), root)          # v0
    TF.rename_column(root, "v", "val")                     # v1
    TF.commit_append(_mk(spark, [(2, 20)], "k long, val long"), root)  # v2
    # compaction folds directories but keeps the logical schema
    TF.compact(spark, root)                                # v3
    assert TF.read_version(spark, root).columns == ["k", "val"]
    got = sorted(tuple(r) for r in TF.read_version(spark, root).collect())
    assert got == [(1, 10), (2, 20)]
    # restore to the PRE-RENAME version serves the old name again
    TF.restore(root, 0)                                    # v4
    assert TF.read_version(spark, root).columns == ["k", "v"]
    assert [tuple(r) for r in TF.read_version(spark, root).collect()] == [
        (1, 10)
    ]
    # and restoring forward to a renamed version brings the map back
    TF.restore(root, 2)
    assert TF.read_version(spark, root).columns == ["k", "val"]


def test_chained_renames_and_refusals(spark, tmp_path):
    root = str(tmp_path / "renchain")
    TF.commit_append(_mk(spark, [(1, 10)]), root)
    TF.rename_column(root, "v", "val")
    TF.rename_column(root, "val", "value")
    assert TF.read_version(spark, root).columns == ["k", "value"]
    # renaming BACK to the physical name drops the mapping entry
    TF.rename_column(root, "value", "v")
    import json

    with open(TF._manifest_path(root, TF.latest_version(root))) as f:
        assert json.load(f).get("colmap", {}) == {}
    assert [tuple(r) for r in TF.read_version(spark, root).collect()] == [
        (1, 10)
    ]
    TF.rename_column(root, "v", "val")
    with pytest.raises(ValueError, match="already exists"):
        TF.rename_column(root, "k", "val")
    with pytest.raises(ValueError, match="no column"):
        TF.rename_column(root, "nope", "x")
    with pytest.raises(ValueError, match="reserved"):
        TF.rename_column(root, "k", "_dv_path")
    # a CHECK constraint pins its columns against rename
    TF.add_constraint(spark, root, "val_nonneg", "val >= 0")
    with pytest.raises(ValueError, match="references it"):
        TF.rename_column(root, "val", "v2")
    TF.drop_constraint(root, "val_nonneg")
    TF.rename_column(root, "val", "v2")  # allowed once dropped
    # evolution onto an OCCUPIED physical slot (logical v2 still maps
    # to physical v) auto-assigns a fresh versioned slot — the renamed
    # column's old bytes must never leak into the new logical column
    import json as _json

    TF.commit_append(
        _mk(spark, [(3, 5, 7)], "k long, v2 long, v long"),
        root, evolve=True,
    )
    with open(TF._manifest_path(root, TF.latest_version(root))) as f:
        cmap = _json.load(f)["colmap"]
    assert cmap["v2"] == "v" and cmap["v"].startswith("v__p")
    got = sorted(
        (r["k"], r["v2"], r["v"])
        for r in TF.read_version(spark, root).collect()
    )
    assert got == [(1, 10, None), (3, 5, 7)]
    # and a fresh name is fine, reads resolving by era
    TF.commit_append(
        _mk(spark, [(4, 40, 8)], "k long, v2 long, extra long"),
        root, evolve=True,
    )
    got = sorted(
        (r["k"], r["v2"], r["extra"])
        for r in TF.read_version(spark, root).collect()
    )
    assert got == [(1, 10, None), (3, 5, None), (4, 40, 8)]


def test_matview_over_renamed_table(spark, tmp_path):
    from opcua_ingestion_engine_spark.operators.matview import (
        MaterializedAggView,
    )

    root = str(tmp_path / "renbase")
    view = str(tmp_path / "renview")
    TF.commit_append(
        _mk(spark, [(1, 1, 10), (2, 1, 20)], "id long, g long, v long"), root
    )
    TF.rename_column(root, "v", "val")
    mv = MaterializedAggView(
        root, view, group_keys=["g"], sum_cols=["val"], row_keys=["id"]
    )
    mv.refresh(spark)
    assert [
        int(r["sum_val"]) for r in mv.result(spark).collect()
    ] == [30]
    TF.commit_append(
        _mk(spark, [(3, 1, 5)], "id long, g long, val long"), root
    )
    mv.refresh(spark)
    assert [
        int(r["sum_val"]) for r in mv.result(spark).collect()
    ] == [35]
    # a rename AFTER the view exists: the view's stored state keeps its
    # own schema; the next refresh reads the source under the new name
    TF.rename_column(root, "val", "value")
    TF.commit_append(
        _mk(spark, [(4, 1, 7)], "id long, g long, value long"), root
    )
    mv2 = MaterializedAggView(
        root, view, group_keys=["g"], sum_cols=["value"], row_keys=["id"]
    )
    try:
        mv2.refresh(spark)
        got = [int(r["sum_value"]) for r in mv2.result(spark).collect()]
        assert got == [42]
    except Exception:
        # documented contract: a rename mid-view changes the fold
        # column names — a view keyed to the old name re-seeds (the
        # streaming-source rule); full re-create must work:
        import shutil

        shutil.rmtree(view)
        mv2.refresh(spark)
        got = [int(r["sum_value"]) for r in mv2.result(spark).collect()]
        assert got == [42]


def test_drop_column_is_metadata_only(spark, tmp_path):
    import pyarrow.parquet as pq

    root = str(tmp_path / "drop")
    TF.commit_append(
        _mk(spark, [(1, 10, 1.5), (2, 20, 2.5)], "k long, v long, w double"),
        root,
    )
    before = _data_files(root)
    v = TF.drop_column(root, "w")
    assert v == 1 and _data_files(root) == before  # zero bytes rewritten
    live = TF.read_version(spark, root)
    assert live.columns == ["k", "v"]
    assert sorted(tuple(r) for r in live.collect()) == [(1, 10), (2, 20)]
    # the bytes are still in the files (reclaimed by compaction, not
    # by the drop) and time travel still serves them
    rel = next(iter(before))
    assert "w" in pq.read_schema(os.path.join(root, rel)).names
    old = TF.read_version(spark, root, 0)
    assert old.columns == ["k", "v", "w"]
    # post-drop appends speak the surviving schema
    TF.commit_append(_mk(spark, [(3, 30)]), root)
    assert TF.read_version(spark, root).count() == 3
    # compaction REWRITES without the retired slot (Delta REORG PURGE)
    TF.compact(spark, root)
    new_files = [p for p in _data_files(root) if p not in before]
    assert new_files
    for p in new_files:
        assert "w" not in pq.read_schema(os.path.join(root, p)).names
    # refusals: unknown, last column, constraint-referenced
    with pytest.raises(ValueError, match="no column"):
        TF.drop_column(root, "nope")
    TF.add_constraint(spark, root, "v_nonneg", "v >= 0")
    with pytest.raises(ValueError, match="references it"):
        TF.drop_column(root, "v")
    TF.drop_constraint(root, "v_nonneg")
    TF.drop_column(root, "v")
    with pytest.raises(ValueError, match="last column"):
        TF.drop_column(root, "k")


def test_readd_after_drop_gets_fresh_physical_slot(spark, tmp_path):
    import json

    import pyarrow.parquet as pq

    root = str(tmp_path / "readd")
    TF.commit_append(_mk(spark, [(1, 10)]), root)       # v0: k, v
    TF.drop_column(root, "v")                           # v1: k
    # re-ADD the same logical name: fresh physical slot, old bytes
    # never leak into the new column
    TF.commit_append(
        _mk(spark, [(2, 99)], "k long, v long"), root, evolve=True
    )                                                   # v2
    with open(TF._manifest_path(root, 2)) as f:
        m = json.load(f)
    assert m["colmap"]["v"].startswith("v__p")
    assert m["retired"] == ["v"]
    got = sorted(
        (r["k"], r["v"]) for r in TF.read_version(spark, root).collect()
    )
    assert got == [(1, None), (2, 99)]  # the OLD v=10 must NOT resurface
    # the new file stores the fresh slot physically
    new_dirs = [d for d in TF._data_list(m)]
    names = set()
    for d in new_dirs:
        for n in os.listdir(os.path.join(root, d)):
            if n.endswith(".parquet"):
                names |= set(
                    pq.read_schema(os.path.join(root, d, n)).names
                )
    assert any(n.startswith("v__p") for n in names)
    # DV mutations and the change feed over the re-added column
    TF.delete_where_dv(spark, root, "v = 99")
    assert [tuple(r) for r in TF.read_version(spark, root).collect()] == [
        (1, None)
    ]


def test_keyed_diff_spans_a_drop(spark, tmp_path):
    root = str(tmp_path / "dropdiff")
    TF.commit_version(
        _mk(spark, [(1, 10, 5), (2, 20, 6)], "k long, v long, w long"), root
    )                                                   # v0
    TF.drop_column(root, "w")                           # v1
    TF.commit_upsert(
        spark, root, _mk(spark, [(2, 999)], "k long, v long"), keys=["k"]
    )                                                   # v2: rewrite-class
    diff = TF.table_changes(spark, root, 0, keys=["k"])
    assert sorted(diff.columns) == [
        "_change_type", "_commit_version", "k", "v",
    ]
    rows = sorted((r["_change_type"], r["k"], r["v"]) for r in diff.collect())
    # only k=2 changed among surviving columns; k=1 is untouched
    assert rows == [
        ("update_postimage", 2, 999), ("update_preimage", 2, 20),
    ]


def test_zorder_compaction_over_renamed_columns(spark, tmp_path):
    """compact_zorder's quantile/bucket math speaks LOGICAL names; the
    rewritten z-bucket directories land physical and keep pruning on
    the renamed columns via the mapping."""
    root = str(tmp_path / "renz")
    rows = [(i, (i * 37) % 100, (i * 61) % 100) for i in range(400)]
    TF.commit_version(
        _mk(spark, rows, "k long, x long, y long"), root
    )
    TF.rename_column(root, "x", "lon")
    TF.rename_column(root, "y", "lat")
    TF.compact_zorder(spark, root, "lon", "lat", n_dirs=4)
    audit: dict = {}
    df = TF.read_version(
        spark, root, prune={"lon": (0, 20), "lat": (0, 20)}, audit=audit
    ).filter((F.col("lon") <= 20) & (F.col("lat") <= 20))
    assert audit["dirs_kept"] < audit["dirs_total"], audit
    want = sorted(
        (k, x, y) for k, x, y in rows if x <= 20 and y <= 20
    )
    assert sorted(tuple(r) for r in df.collect()) == want
    # an unknown logical column still refuses loudly
    with pytest.raises(ValueError, match="not in table"):
        TF.compact_zorder(spark, root, "x", "lat", n_dirs=4)


def test_stream_rename_mid_history_contract(spark, tmp_path):
    """Documented contract: a streaming drain serves the LOGICAL schema
    captured at ITS start (physical names are stable, so one map covers
    every era); a rename committed between drains is a data_identical
    pass-through, and the NEXT drain on the same checkpoint — a new
    query start — picks up the post-rename names. No re-seed needed,
    nothing re-served, nothing lost."""
    from opcua_ingestion_engine_spark.streaming.tablestream import (
        TableChangesDataSource,
    )

    spark.dataSource.register(TableChangesDataSource)
    root = str(tmp_path / "midren")
    mk = lambda rows, s="k long, v long": spark.createDataFrame(rows, s)
    TF.commit_append(mk([(1, 10)]), root)                  # v0

    def drain(ckpt):
        got: list = []
        q = (
            spark.readStream.format("table_changes")
            .option("path", root)
            .load()
            .writeStream.foreachBatch(
                lambda df, _id: got.extend(df.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return got

    ckpt = str(tmp_path / "ck")
    first = drain(ckpt)
    assert [(r["k"], r["v"]) for r in first] == [(1, 10)]
    TF.rename_column(root, "v", "val")                     # v1: pass-through
    TF.commit_append(mk([(2, 20)], "k long, val long"), root)  # v2
    second = drain(ckpt)
    # the new drain serves post-rename names and ONLY the new commit
    # (the rename itself contributed zero rows)
    assert [(r["k"], r["val"], r["_commit_version"]) for r in second] == [
        (2, 20, 2)
    ]


@pytest.mark.parametrize("seed", [19, 62])
def test_drop_column_vs_writers_chaos(spark, tmp_path, seed):
    """A metadata-only DROP races an appender writing the full schema:
    each append either serializes before the drop or refuses with a
    schema mismatch on rebase; whatever the interleaving, the final
    table serves the surviving schema and every landed row exactly
    once."""
    import random
    import threading
    import time as _time

    root = str(tmp_path / f"droprace{seed}")
    spark.createDataFrame(
        [(0, 0, 0.5)], "k long, v long, w double"
    ).coalesce(1)
    TF.commit_version(
        spark.createDataFrame(
            [(0, 0, 0.5)], "k long, v long, w double"
        ).coalesce(1),
        root,
    )
    barrier = threading.Barrier(2)
    errors: list = []
    landed: list = []
    refused: list = []

    def dropper():
        rng = random.Random(seed)
        try:
            barrier.wait()
            _time.sleep(rng.random() * 0.05)
            TF.drop_column(root, "w")
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def appender():
        rng = random.Random(seed * 7 + 5)
        try:
            barrier.wait()
            for i in range(6):
                _time.sleep(rng.random() * 0.03)
                k = 10 + i
                try:
                    TF.commit_append(
                        spark.createDataFrame(
                            [(k, k, 0.5)], "k long, v long, w double"
                        ).coalesce(1),
                        root,
                    )
                    landed.append(k)
                except ValueError as e:
                    assert "schema mismatch" in str(e), e
                    refused.append(k)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    ts = [threading.Thread(target=dropper), threading.Thread(target=appender)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert errors == [], errors
    live = TF.read_version(spark, root)
    assert live.columns == ["k", "v"]
    ks = sorted(r["k"] for r in live.collect())
    for k in landed:
        assert ks.count(k) == 1
    for k in refused:
        assert k not in ks


def test_initial_snapshot_over_renamed_table(spark, tmp_path):
    """initial_snapshot mode must serve the anchor's LIVE rows under
    the renamed logical schema (snapshot partitions read physical
    files; the reader's stream-start map renames them) — including a
    rewrite-class step in the pre-anchor history, which is the mode's
    reason to exist."""
    from opcua_ingestion_engine_spark.streaming.tablestream import (
        TableChangesDataSource,
    )

    spark.dataSource.register(TableChangesDataSource)
    root = str(tmp_path / "rensnap")
    TF.commit_version(
        _mk(spark, [(i, i * 10) for i in range(5)]), root
    )                                           # v0
    TF.delete_where(spark, root, "k = 0")       # v1: CoW rewrite step
    TF.rename_column(root, "v", "val")          # v2
    TF.delete_where_dv(spark, root, "val = 30")  # v3
    got: list = []
    q = (
        spark.readStream.format("table_changes")
        .option("path", root)
        .option("initial_snapshot", "true")
        .load()
        .writeStream.foreachBatch(lambda df, _id: got.extend(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted((r["k"], r["val"], r["_change_type"]) for r in got)
    assert rows == [
        (1, 10, "insert"), (2, 20, "insert"), (4, 40, "insert")
    ]
