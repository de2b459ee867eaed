"""Round-12 chaos surface: a RATE-LIMITED table_changes drain
(``max_files_per_trigger``) racing live writers ACROSS a mid-stream
rename and maintenance commits. The bounded offset stepping plans
version-by-version against a moving manifest chain while a rename
lands (metadata-only pass-through), appends CAS-race it (landing or
refusing per the rename-vs-writers contract), dv-deletes interleave,
and compaction/DV-consolidation rewrite directory layouts under the
planner. Whatever the interleaving: the union of all bounded batches
equals the batch change feed over the FINAL history, and replaying the
feed reproduces the live snapshot."""

from __future__ import annotations

import random
import threading
import time as _time

import pytest

from opcua_ingestion_engine_spark.operators import tablefmt as TF


def _mk(spark, rows, schema="k long, v long"):
    return spark.createDataFrame(rows, schema).coalesce(1)


@pytest.mark.parametrize("seed", [9, 37, 64])
def test_ratelimited_drain_vs_writers_rename_compact_chaos(
    spark, tmp_path, seed
):
    from opcua_ingestion_engine_spark.streaming.tablestream import (
        TableChangesDataSource,
    )

    spark.dataSource.register(TableChangesDataSource)
    root = str(tmp_path / f"rlrace{seed}")
    TF.commit_version(_mk(spark, [(i, i * 10) for i in range(8)]), root)
    next_k = [8]
    lock = threading.Lock()
    errors: list = []
    refused: list = []
    barrier = threading.Barrier(4)

    def fresh(n):
        with lock:
            base = next_k[0]
            next_k[0] += n
        return [(base + i, (base + i) * 10) for i in range(n)]

    def appender():
        rng = random.Random(seed * 5 + 3)
        try:
            barrier.wait()
            for _ in range(6):
                _time.sleep(rng.random() * 0.05)
                rows = fresh(rng.randint(1, 3))
                try:
                    TF.commit_append(_mk(spark, rows), root)
                except ValueError as e:
                    # post-rename old-name frame — the pinned contract
                    assert "schema mismatch" in str(e), e
                    refused.extend(k for k, _ in rows)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def deleter():
        rng = random.Random(seed * 11 + 1)
        try:
            barrier.wait()
            for _ in range(3):
                _time.sleep(rng.random() * 0.06)
                TF.delete_where_dv(
                    spark, root, f"k = {rng.randrange(8)}"
                )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def renamer():
        rng = random.Random(seed)
        try:
            barrier.wait()
            _time.sleep(rng.random() * 0.1)
            TF.rename_column(root, "v", "val")
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def maintainer():
        rng = random.Random(seed * 29 + 2)
        try:
            barrier.wait()
            for _ in range(2):
                _time.sleep(rng.random() * 0.08)
                pick = rng.random()
                if pick < 0.34:
                    TF.consolidate_dv(spark, root)
                elif pick < 0.67:
                    TF.compact(spark, root)
                else:
                    # every dir is tiny here, so this merges the whole
                    # tail through the bin-packing path (DV apply +
                    # data_identical passthrough under the planner)
                    TF.compact_small(spark, root)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    got: list = []
    n_batches = [0]

    def sink(df, _id):
        rows = df.collect()
        if rows:
            # positional keys: the value column's NAME depends on when
            # the serving query started relative to the rename
            got.extend(tuple(r) for r in rows)
            n_batches[0] += 1

    ckpt = str(tmp_path / f"ck{seed}")

    def bounded_run(available_now: bool):
        builder = (
            spark.readStream.format("table_changes")
            .option("path", root)
            .option("max_files_per_trigger", "2")
            .load()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
        )
        if available_now:
            q = builder.trigger(availableNow=True).start()
            q.awaitTermination()
        else:
            q = builder.trigger(processingTime="0 seconds").start()
            try:
                q.processAllAvailable()
            finally:
                q.stop()

    threads = [
        threading.Thread(target=appender),
        threading.Thread(target=deleter),
        threading.Thread(target=renamer),
        threading.Thread(target=maintainer),
    ]
    for t in threads:
        t.start()
    # bounded availableNow runs against the moving head — every run is
    # a fresh query on the same checkpoint, so the restart ping path
    # is exercised under live CAS traffic
    while any(t.is_alive() for t in threads):
        bounded_run(available_now=True)
    for t in threads:
        t.join()
    assert errors == [], errors
    # catch-up: a continuous bounded run drains the remaining backlog
    bounded_run(available_now=False)

    assert n_batches[0] > 1  # the stepping actually bounded the drain
    key = lambda t: (t[3], t[2], t[0], t[1])  # (_version, _type, k, val)
    want = sorted(
        (r[3], r[2], r[0], r[1])
        for r in TF.table_changes(spark, root, None).collect()
    )
    assert sorted(map(key, got)) == want
    # replaying the drained feed reproduces the live snapshot
    state: set = set()
    for _v, ct, k, val in sorted(map(key, got)):
        if ct == "delete":
            state.discard((k, val))
        else:
            state.add((k, val))
    live = {tuple(r)[:2] for r in TF.read_version(spark, root).collect()}
    assert state == live
    for k in refused:
        assert all(kk != k for kk, _ in live)
