"""Round-12 [EXT]: admission control for the ``table_changes``
streaming source — Delta's ``maxFilesPerTrigger``/``maxBytesPerTrigger``
parity. A long backlog, a large single commit, or the initial snapshot
drains as BOUNDED micro-batches: offsets step THROUGH commit history
(and, within a commit or the snapshot, through its stable per-file
partition plan) instead of jumping to the live head.

Pinned here: per-batch partition counts over a seeded backlog (unit
level, driving the reader exactly as the engine does), mid-commit
``part`` offsets, byte budgets, snapshot stepping, the restart ping
(``partitions(committed, committed)``) teaching a fresh reader its
position so a checkpointed restart is rate-limited from its first
trigger, engine-level multi-batch drains equal to the batch feed, and
checkpoint-resume across a bounded drain."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opcua_ingestion_engine_spark.operators import tablefmt as TF
from opcua_ingestion_engine_spark.streaming.tablestream import (
    CHANGE_TYPE_COL,
    COMMIT_VERSION_COL,
    TableChangesDataSource,
    TableChangesStreamReader,
)


def _mk(spark, rows, nfiles=1, schema="k long, v long"):
    return spark.createDataFrame(rows, schema).repartition(nfiles)


def _reader(root, **opts):
    options = {"path": root, **{k: str(v) for k, v in opts.items()}}
    return TableChangesStreamReader(
        options, ["k", "v", CHANGE_TYPE_COL, COMMIT_VERSION_COL]
    )


def _drain_offsets(reader, max_steps=50):
    """Drive the reader exactly as the engine does: latestOffset ->
    partitions(prev, end) -> commit(end), until caught up. Returns the
    list of (end_offset, n_partitions) per micro-batch."""
    steps = []
    prev = reader.initialOffset()
    for _ in range(max_steps):
        end = reader.latestOffset()
        if end == prev:
            break
        parts = reader.partitions(prev, end)
        reader.commit(end)
        steps.append((end, len(parts)))
        prev = end
    else:
        raise AssertionError("did not catch up within max_steps")
    return steps


def test_backlog_steps_bounded_batches(spark, tmp_path):
    """6 single-file commits, max_files_per_trigger=2 -> exactly 3
    batches of exactly 2 partitions each, clean version offsets."""
    root = str(tmp_path / "backlog")
    for i in range(6):
        TF.commit_append(_mk(spark, [(i, i * 10)]), root)
    r = _reader(root, max_files_per_trigger=2)
    steps = _drain_offsets(r)
    assert [n for _, n in steps] == [2, 2, 2]
    assert [o for o, _ in steps] == [
        {"version": 1},
        {"version": 3},
        {"version": 5},
    ]


def test_large_commit_steps_through_part_offsets(spark, tmp_path):
    """ONE commit holding 5 files, max_files_per_trigger=2 -> the
    offsets step mid-commit via {"version": N, "part": K}."""
    root = str(tmp_path / "bigcommit")
    TF.commit_append(
        _mk(spark, [(i, i) for i in range(50)], nfiles=5), root
    )
    r = _reader(root, max_files_per_trigger=2)
    steps = _drain_offsets(r)
    assert [n for _, n in steps] == [2, 2, 1]
    assert [o for o, _ in steps] == [
        {"version": -1, "part": 2},
        {"version": -1, "part": 4},
        {"version": 0},
    ]


def test_byte_budget_admits_one_partition_minimum(spark, tmp_path):
    """max_bytes_per_trigger=1 is below any file's size: every batch
    still admits exactly ONE partition (progress is guaranteed)."""
    root = str(tmp_path / "bytes")
    for i in range(3):
        TF.commit_append(_mk(spark, [(i, i)]), root)
    r = _reader(root, max_bytes_per_trigger=1)
    steps = _drain_offsets(r)
    assert [n for _, n in steps] == [1, 1, 1]


def test_snapshot_steps_per_file(spark, tmp_path):
    """initial_snapshot over a 4-file base: the snapshot itself drains
    in bounded batches carrying the snap marker, then the tail
    follows."""
    root = str(tmp_path / "snap")
    TF.commit_append(
        _mk(spark, [(i, i) for i in range(40)], nfiles=4), root
    )                                                   # v0: 4 files
    TF.commit_append(_mk(spark, [(100, 100)]), root)    # v1 (post-anchor)
    r = _reader(
        root,
        max_files_per_trigger=2,
        initial_snapshot="true",
        starting_version=0,
    )
    steps = _drain_offsets(r)
    assert [n for _, n in steps] == [2, 2, 1]
    assert [o for o, _ in steps] == [
        {"version": 0, "snap": 1, "part": 2},
        {"version": 0},
        {"version": 1},
    ]


def test_restart_ping_rate_limits_first_batch(spark, tmp_path):
    """A FRESH reader (checkpointed restart) learns its position from
    the engine's latest-seen-offset ping — partitions(committed,
    committed) — so its first latestOffset is already bounded."""
    root = str(tmp_path / "restart")
    for i in range(6):
        TF.commit_append(_mk(spark, [(i, i)]), root)
    r1 = _reader(root, max_files_per_trigger=2)
    prev = r1.initialOffset()
    end1 = r1.latestOffset()
    r1.partitions(prev, end1)
    r1.commit(end1)
    assert end1 == {"version": 1}
    # new reader instance, as a restarted run would build
    r2 = _reader(root, max_files_per_trigger=2)
    assert r2.partitions(end1, end1) == []  # the restart ping
    end2 = r2.latestOffset()
    assert end2 == {"version": 3}  # bounded from the committed offset
    assert len(r2.partitions(end1, end2)) == 2


def test_no_admission_options_keeps_live_head(spark, tmp_path):
    root = str(tmp_path / "nohead")
    for i in range(6):
        TF.commit_append(_mk(spark, [(i, i)]), root)
    r = _reader(root)
    steps = _drain_offsets(r)
    assert steps == [({"version": 5}, 6)]


def test_mixed_history_bounded_drain_equals_batch_feed(spark, tmp_path):
    """Appends + dv-deletes + mor-upserts drained under a 2-file budget:
    the union over bounded batches equals table_changes(None)."""
    root = str(tmp_path / "mixed")
    TF.commit_append(_mk(spark, [(1, 10), (2, 20), (3, 30)]), root)
    TF.delete_where_dv(spark, root, "k = 2")
    TF.commit_upsert(
        spark, root, _mk(spark, [(3, 333), (4, 44)]), keys=["k"], mor=True
    )
    TF.commit_append(_mk(spark, [(5, 55)]), root)
    r = _reader(root, max_files_per_trigger=2)
    prev = r.initialOffset()
    rows = []
    for _ in range(50):
        end = r.latestOffset()
        if end == prev:
            break
        for p in r.partitions(prev, end):
            for batch in r.read(p):
                rows.extend(batch.to_pylist())
        r.commit(end)
        prev = end
    key = lambda d: (
        d[COMMIT_VERSION_COL], d[CHANGE_TYPE_COL], d["k"], d["v"]
    )
    want = sorted(
        (r_["_commit_version"], r_["_change_type"], r_["k"], r_["v"])
        for r_ in TF.table_changes(spark, root, None).collect()
    )
    assert sorted(map(key, rows)) == want


def test_engine_bounded_drain_multi_batch(spark, tmp_path):
    """End-to-end through the engine: a 6-commit backlog under
    max_files_per_trigger=2 drains in >1 micro-batch via a
    processing-time trigger, and the result equals the batch feed."""
    spark.dataSource.register(TableChangesDataSource)
    root = str(tmp_path / "engine")
    for i in range(6):
        TF.commit_append(_mk(spark, [(i, i * 10)]), root)
    batches: list = []

    def sink(df, batch_id):
        rows = df.collect()
        if rows:
            batches.append(rows)

    q = (
        spark.readStream.format("table_changes")
        .option("path", root)
        .option("max_files_per_trigger", "2")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(batches) == 3
    assert all(
        len({r["_commit_version"] for r in b}) == 2 for b in batches
    )
    key = lambda r: (r["_commit_version"], r["k"], r["v"])
    got = sorted(key(r) for b in batches for r in b)
    want = sorted(
        key(r) for r in TF.table_changes(spark, root, None).collect()
    )
    assert got == want


def test_engine_checkpoint_resume_across_bounded_drain(spark, tmp_path):
    """Stop a bounded drain mid-backlog; the restarted run continues
    from the checkpoint — bounded — and the union equals the feed."""
    spark.dataSource.register(TableChangesDataSource)
    root = str(tmp_path / "resume")
    for i in range(6):
        TF.commit_append(_mk(spark, [(i, i * 10)]), root)
    ckpt = str(tmp_path / "ck")
    first: list = []
    # availableNow + admission = exactly ONE bounded batch per run
    # (the engine captures one stepped offset per start)
    q = (
        spark.readStream.format("table_changes")
        .option("path", root)
        .option("max_files_per_trigger", "2")
        .load()
        .writeStream.foreachBatch(
            lambda df, _id: first.extend(df.collect())
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len({r["_commit_version"] for r in first}) == 2
    rest: list = []
    q2 = (
        spark.readStream.format("table_changes")
        .option("path", root)
        .option("max_files_per_trigger", "2")
        .load()
        .writeStream.foreachBatch(
            lambda df, _id: rest.extend(df.collect())
        )
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    key = lambda r: (r["_commit_version"], r["k"], r["v"])
    got = sorted(key(r) for r in first + rest)
    want = sorted(
        key(r) for r in TF.table_changes(spark, root, None).collect()
    )
    assert got == want


def test_rewrite_class_refusal_after_draining_prefix(spark, tmp_path):
    """A rewrite-class commit mid-backlog: the bounded stepping drains
    everything recoverable BEFORE it, then refuses with the typed
    error on the next step."""
    root = str(tmp_path / "refuse")
    TF.commit_append(_mk(spark, [(1, 10)]), root)   # v0
    TF.commit_append(_mk(spark, [(2, 20)]), root)   # v1
    TF.restore(root, 0)                             # v2: rewrite-class
    r = _reader(root, max_files_per_trigger=1)
    prev = r.initialOffset()
    e1 = r.latestOffset()
    assert e1 == {"version": 0}
    r.partitions(prev, e1)
    r.commit(e1)
    e2 = r.latestOffset()
    assert e2 == {"version": 1}
    r.partitions(e1, e2)
    r.commit(e2)
    with pytest.raises(ValueError, match="rewrite-class"):
        r.latestOffset()


def test_option_validation(spark, tmp_path):
    root = str(tmp_path / "opts")
    TF.commit_append(_mk(spark, [(1, 10)]), root)
    with pytest.raises(ValueError, match="max_files_per_trigger"):
        _reader(root, max_files_per_trigger=0)
    with pytest.raises(ValueError, match="max_bytes_per_trigger"):
        _reader(root, max_bytes_per_trigger=-5)
