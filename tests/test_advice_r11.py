"""Pinned regressions for the round-10 ADVICE findings plus the
round-11 verdict-queue items that land in the streaming table source:

1. ``_in_condition`` must escape backslashes — Spark's SQL parser
   treats ``\\`` as an escape inside string literals, so an id ending
   in a backslash would swallow the closing quote and a crafted id
   could widen a GDPR forget predicate to the WHOLE table.
2. ``q_tf_check_constraints``' violating-update probe must anchor to a
   row that exists (``update_where_dv`` cannot refuse on an empty
   match, so a synthetic cohort could make the refusal assertion trip
   vacuously at a small scale factor).
3. ``TableChangesStreamReader.latestOffset`` must be STATELESS — the
   initial snapshot is keyed solely off the ``snap`` marker that
   ``initialOffset`` plants, never off per-instance mutable state that
   a checkpointed restart would re-initialize.
4. Tail and initial-snapshot input partitions are split PER PARQUET
   FILE (Delta's add-file granularity), so a monolithic base commit's
   snapshot parallelizes across executors.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opcua_ingestion_engine_spark.operators import tablefmt as TF
from opcua_ingestion_engine_spark.streaming.bm25index import _in_condition


def test_in_condition_escapes_backslashes(spark):
    df = spark.createDataFrame(
        [("a",), ("x\\",), (") OR 1=1 --",), ("plain",)], "id string"
    )
    # a trailing-backslash id must parse AND match only itself
    cond = _in_condition("id", ["x\\"])
    got = [r["id"] for r in df.filter(F.expr(cond)).collect()]
    assert got == ["x\\"]
    # an injection-shaped id must match only its literal self, never all
    cond2 = _in_condition("id", [") OR 1=1 --"])
    got2 = [r["id"] for r in df.filter(F.expr(cond2)).collect()]
    assert got2 == [") OR 1=1 --"]
    # combined batch: exactly the two requested ids
    cond3 = _in_condition("id", ["x\\", ") OR 1=1 --"])
    assert df.filter(F.expr(cond3)).count() == 2


def test_bm25_forget_with_backslash_id_deletes_only_that_row(
    spark, tmp_path
):
    """End-to-end pin on the GDPR path: a forget batch containing a
    trailing-backslash id must delete exactly that id's rows from a
    versioned table, not the whole table (pre-fix the spliced predicate
    matched ALL rows)."""
    from opcua_ingestion_engine_spark.streaming.bm25index import (
        _in_condition as cond_fn,
    )

    root = str(tmp_path / "forget")
    df = spark.createDataFrame(
        [("x\\", 1), ("keep", 2), ("alsokeep", 3)], "doc_id string, v long"
    ).coalesce(1)
    TF.commit_version(df, root)
    TF.delete_where_dv(spark, root, cond_fn("doc_id", ["x\\"]))
    left = sorted(
        r["doc_id"] for r in TF.read_version(spark, root).collect()
    )
    assert left == ["alsokeep", "keep"]


def test_check_constraints_probe_survives_tiny_tables(spark, tmp_path):
    """The registered query's refusal probes must not depend on a
    synthetic cohort being non-empty: run the same anchored-update
    shape against a 2-row table and assert the violating update
    REFUSES (pre-fix an empty cohort made the no-op update 'succeed'
    and the in-query assertion trip)."""
    root = str(tmp_path / "ck_tiny")
    df = spark.createDataFrame(
        [(1, 7, 1.0), (2, 8, 2.0)], "event_id long, user_id long, value double"
    ).coalesce(1)
    TF.commit_version(df, root)
    TF.add_constraint(spark, root, "ck_ids", "event_id >= 0 AND user_id >= 0")
    v0 = TF.latest_version(root)
    anchor = df.agg(F.max("user_id").alias("m")).first()["m"]
    with pytest.raises(ValueError, match="ck_ids"):
        TF.update_where_dv(
            spark, root, f"user_id = {int(anchor)}",
            {"event_id": "0 - event_id - 1"},
        )
    assert TF.latest_version(root) == v0


def _reader(root: str, **opts):
    from opcua_ingestion_engine_spark.streaming.tablestream import (
        CHANGE_TYPE_COL, COMMIT_VERSION_COL, TableChangesStreamReader,
    )

    names = ["k", "v", CHANGE_TYPE_COL, COMMIT_VERSION_COL]
    return TableChangesStreamReader({"path": root, **opts}, names)


def test_latest_offset_is_stateless_in_snapshot_mode(spark, tmp_path):
    """latestOffset must return the same plain {"version": N} however
    many times it is called (no per-instance snap state), and the
    snapshot must be served solely off the ``snap`` marker in the
    START offset — so a checkpointed restart (which never replays
    initialOffset) can never re-serve or skip the snapshot on the
    strength of call ordering."""
    from opcua_ingestion_engine_spark.streaming.tablestream import (
        _SnapshotPartition, _TailPartition,
    )

    root = str(tmp_path / "stateless")
    mk = lambda rows: spark.createDataFrame(rows, "k long, v long")
    TF.commit_version(mk([(i, i) for i in range(4)]), root)  # v0
    TF.commit_append(mk([(10, 10)]), root)                   # v1

    r = _reader(root, initial_snapshot="true")
    first = r.latestOffset()
    assert first == {"version": 1}
    assert r.latestOffset() == first and r.latestOffset() == first
    # fresh start: initialOffset carries the snap marker; ONE batch
    # serves snapshot @ anchor plus the (anchor, live] tail
    init = r.initialOffset()
    assert init["snap"] and init["version"] == 1
    parts = r.partitions(init, first)
    assert any(isinstance(p, _SnapshotPartition) for p in parts)
    # restart past the first commit: the committed offset is plain, so
    # a NEW reader instance must not re-serve the snapshot
    TF.commit_append(mk([(11, 11)]), root)
    r2 = _reader(root, initial_snapshot="true")
    parts2 = r2.partitions({"version": 1}, r2.latestOffset())
    assert parts2 and all(
        not isinstance(p, _SnapshotPartition) for p in parts2
    )
    assert all(isinstance(p, _TailPartition) for p in parts2)


def test_tail_and_snapshot_partitions_split_per_file(spark, tmp_path):
    """A monolithic base commit whose single directory holds N parquet
    files must plan N snapshot partitions (and an append's tail plans
    one partition per file) — Delta's per-add-file task granularity,
    so a wide initial snapshot parallelizes instead of reading as one
    pyarrow task."""
    import os

    from opcua_ingestion_engine_spark.streaming.tablestream import (
        _SnapshotPartition, _TailPartition,
    )

    root = str(tmp_path / "perfile")
    base = spark.createDataFrame(
        [(i, i) for i in range(64)], "k long, v long"
    ).repartition(8)
    TF.commit_version(base, root)  # v0: one directory, 8 files

    def n_files(version: int) -> int:
        import json

        with open(TF._manifest_path(root, version)) as f:
            m = json.load(f)
        from opcua_ingestion_engine_spark.operators.tablefmt import _data_list

        return sum(
            len([
                n for n in os.listdir(os.path.join(root, d))
                if n.endswith(".parquet")
            ])
            for d in _data_list(m)
        )

    r = _reader(root, initial_snapshot="true")
    parts = r.partitions(r.initialOffset(), r.latestOffset())
    snap_parts = [p for p in parts if isinstance(p, _SnapshotPartition)]
    assert len(snap_parts) == n_files(0) == 8
    assert all(p.file_name for p in snap_parts)

    # an append of 4 files plans 4 tail partitions
    TF.commit_append(
        spark.createDataFrame(
            [(100 + i, i) for i in range(16)], "k long, v long"
        ).repartition(4),
        root,
    )
    r2 = _reader(root)
    tail = r2.partitions({"version": 0}, {"version": 1})
    assert len(tail) == 4
    assert all(
        isinstance(p, _TailPartition) and p.file_name for p in tail
    )

    # and the per-file drain still equals the batch change feed
    from opcua_ingestion_engine_spark.streaming.tablestream import (
        TableChangesDataSource,
    )

    spark.dataSource.register(TableChangesDataSource)
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
    key = lambda r: (r["_commit_version"], r["_change_type"], r["k"], r["v"])
    want = sorted(
        key(r) for r in TF.table_changes(spark, root, None).collect()
    )
    assert sorted(map(key, got)) == want


def test_s14_migration_crash_resume_and_refusals(spark, tmp_path):
    """S14 (round 11 — the last SURVEY §2 component): the legacy-config
    migration is crash-safe BY ORDERING (tables commit first, the file
    deletes last), so a crash between the two is resumed by simply
    re-running; with neither file nor tables it refuses like the
    reference's missing-config guard; the reference's id-counter defect
    (resets to 1 per client) is NOT reproduced — ids are sequential."""
    import json
    import os

    from opcua_ingestion_engine_spark.operators import tablefmt as TF
    from opcua_ingestion_engine_spark.sources.config import (
        migrate_legacy_client_config,
    )

    legacy = {
        "connections": [
            {
                "connection_name": f"c{i}",
                "max_search": 600,
                "staleness_timeout_ms": 30000 * (i + 1),
                "url": f"opc.tcp://10.0.0.{i}:62541",
                "browse_exclusion_folders": ["Server"] if i == 0 else [],
            }
            for i in range(3)
        ]
    }
    path = str(tmp_path / "opcua_client_config.json")
    out = str(tmp_path / "tables")
    with pytest.raises(FileNotFoundError):
        migrate_legacy_client_config(spark, path, out)
    with open(path, "w") as f:
        json.dump(legacy, f)
    vc, vf = migrate_legacy_client_config(spark, path, out)
    assert not os.path.exists(path)
    conns = TF.read_version(spark, os.path.join(out, "opc_client_connections"))
    # sequential ids — the multi-connection case the shipped reference
    # migration could never complete (its Id resets to 1 per client)
    assert sorted(r["id"] for r in conns.collect()) == [1, 2, 3]
    # crash simulation: tables committed but the file "came back"
    # (crash happened before the delete) — rerun converges, new
    # versions, same content
    with open(path, "w") as f:
        json.dump(legacy, f)
    vc2, vf2 = migrate_legacy_client_config(spark, path, out)
    assert (vc2, vf2) == (vc + 1, vf + 1) and not os.path.exists(path)
    again = TF.read_version(
        spark, os.path.join(out, "opc_client_connections")
    )
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, conns.collect())
    )
    # already-migrated no-op: no file, both tables live
    assert migrate_legacy_client_config(spark, path, out) == (vc2, vf2)
