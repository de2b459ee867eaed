"""Round-11 chaos surfaces:

1. ADD CONSTRAINT vs a concurrent appender (the round-10 verdict's
   "What's wrong #2"): with constraints riding the manifest CAS chain,
   either serialization order must leave the Delta guarantee intact —
   once ADD succeeds, NO violating row is or can later be committed;
   if a violating row serializes first, the ADD itself refuses.
2. The table_changes STREAMING source racing live writers: offset
   planning reads manifests while CAS commits land; the drained feed
   must equal the batch change feed over the final history.
"""

from __future__ import annotations

import random
import threading
import time as _time

import pytest

from opcua_ingestion_engine_spark.operators import tablefmt as TF


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, v long").coalesce(1)


@pytest.mark.parametrize("seed", [3, 44, 91])
def test_add_constraint_vs_appender_chaos(spark, tmp_path, seed):
    """Two writers race: one ADDs a CHECK constraint, the other appends
    batches that are violating about half the time. Whatever the
    interleaving: every append either lands (and was valid, or preceded
    the ADD) or refuses with the constraint name; the ADD either lands
    (after which the snapshot must satisfy the constraint FOREVER) or
    refuses because a violating row serialized first. No third outcome,
    no lost update, no violating row after a successful ADD."""
    root = str(tmp_path / f"addrace{seed}")
    TF.commit_version(_mk(spark, [(0, 0)]), root)
    barrier = threading.Barrier(2)
    add_outcome: dict = {}
    landed: list = []
    errors: list = []

    def adder():
        rng = random.Random(seed)
        try:
            barrier.wait()
            _time.sleep(rng.random() * 0.05)
            try:
                TF.add_constraint(spark, root, "v_nonneg", "v >= 0")
                add_outcome["ok"] = TF.latest_version(root)
            except ValueError as e:
                assert "existing rows violate" in str(e), e
                add_outcome["refused"] = str(e)
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    def appender():
        rng = random.Random(seed * 31 + 7)
        try:
            barrier.wait()
            for i in range(8):
                _time.sleep(rng.random() * 0.03)
                v = -(i + 1) if rng.random() < 0.5 else i + 1
                try:
                    TF.commit_append(_mk(spark, [(100 + i, v)]), root)
                    landed.append(v)
                except ValueError as e:
                    assert "v_nonneg" in str(e), e
                    assert v < 0, f"valid batch {v} must never refuse"
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append(e)

    threads = [threading.Thread(target=adder), threading.Thread(target=appender)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == [], errors
    assert add_outcome, "the ADD must resolve one way or the other"

    rows = {tuple(r) for r in TF.read_version(spark, root).collect()}
    if "ok" in add_outcome:
        # Delta guarantee: ADD validated the exact snapshot it landed
        # on top of, and every later commit enforced against it — so a
        # successful ADD implies ZERO violating rows ever landed (one
        # landing before it would have made the validation refuse).
        assert all(v >= 0 for _, v in rows), sorted(rows)
        assert all(v >= 0 for v in landed), landed
        assert TF.table_constraints(root) == {"v_nonneg": "v >= 0"}
    else:
        # refused ⇒ a violating row serialized first and is still there
        assert any(v < 0 for _, v in rows), sorted(rows)
    # every landed batch is in the final snapshot exactly once
    for v in landed:
        assert any(val == v for _, val in rows)


@pytest.mark.parametrize("seed", [11, 58, 73])
def test_streaming_source_vs_live_writers_chaos(spark, tmp_path, seed):
    """A table_changes streaming drain races three concurrent writers
    (appender, dv-deleter, consolidator/compactor). The source's offset
    planning reads manifests while CAS commits land; after the writers
    finish, draining to the end must yield EXACTLY the batch change
    feed over the final history — no duplicated, dropped, or
    misclassified step."""
    from opcua_ingestion_engine_spark.streaming.tablestream import (
        TableChangesDataSource,
    )

    spark.dataSource.register(TableChangesDataSource)
    root = str(tmp_path / f"srcrace{seed}")
    TF.commit_version(_mk(spark, [(i, i * 10) for i in range(8)]), root)
    next_k = [8]
    lock = threading.Lock()
    errors: list = []
    barrier = threading.Barrier(3)

    def fresh(n):
        with lock:
            base = next_k[0]
            next_k[0] += n
        return [(base + i, (base + i) * 10) for i in range(n)]

    def appender():
        rng = random.Random(seed)
        try:
            barrier.wait()
            for _ in range(5):
                _time.sleep(rng.random() * 0.05)
                TF.commit_append(_mk(spark, fresh(rng.randint(1, 3))), root)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def deleter():
        rng = random.Random(seed * 13 + 1)
        try:
            barrier.wait()
            for _ in range(4):
                _time.sleep(rng.random() * 0.06)
                TF.delete_where_dv(
                    spark, root, f"k = {rng.randrange(next_k[0])}"
                )
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def maintainer():
        rng = random.Random(seed * 29 + 2)
        try:
            barrier.wait()
            for _ in range(2):
                _time.sleep(rng.random() * 0.08)
                if rng.random() < 0.5:
                    TF.consolidate_dv(spark, root)
                else:
                    TF.compact(spark, root)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    got: list = []

    def drain():
        q = (
            spark.readStream.format("table_changes")
            .option("path", root)
            .load()
            .writeStream.foreachBatch(
                lambda df, _id: got.extend(df.collect())
            )
            .option("checkpointLocation", str(tmp_path / f"ck{seed}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    threads = [
        threading.Thread(target=appender),
        threading.Thread(target=deleter),
        threading.Thread(target=maintainer),
    ]
    for t in threads:
        t.start()
    # drain REPEATEDLY while the writers commit — each drain plans
    # offsets against a moving manifest chain
    while any(t.is_alive() for t in threads):
        drain()
    for t in threads:
        t.join()
    assert errors == [], errors
    drain()  # the catch-up pass after the last commit

    key = lambda r: (r["_commit_version"], r["_change_type"], r["k"], r["v"])
    want = sorted(
        key(r) for r in TF.table_changes(spark, root, None).collect()
    )
    assert sorted(map(key, got)) == want
    # and replaying the feed reproduces the live snapshot
    state: set = set()
    for _v, ct, k, val in sorted(map(key, got)):
        if ct == "delete":
            state.discard((k, val))
        else:
            state.add((k, val))
    live = {(r["k"], r["v"]) for r in TF.read_version(spark, root).collect()}
    assert state == live


@pytest.mark.parametrize("seed", [7, 41, 88])
def test_rename_vs_writers_chaos(spark, tmp_path, seed):
    """A metadata-only RENAME races an appender and a dv-deleter. The
    CAS serializes them: an append either lands (it serialized before
    the rename, or was already written under the new name) or refuses
    with a schema mismatch after the rename (its frame speaks the old
    name against the renamed parent it rebased onto); deletes are
    name-agnostic here (predicate on the unrenamed key) and always
    land. No interleaving corrupts the table: every landed batch is
    present exactly once under the final schema, and the change feed
    over the full history replays to the live snapshot."""
    root = str(tmp_path / f"renrace{seed}")
    TF.commit_version(_mk(spark, [(i, i * 10) for i in range(6)]), root)
    barrier = threading.Barrier(3)
    errors: list = []
    landed: list = []
    refused: list = []

    def renamer():
        rng = random.Random(seed)
        try:
            barrier.wait()
            _time.sleep(rng.random() * 0.06)
            TF.rename_column(root, "v", "val")
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def appender():
        rng = random.Random(seed * 5 + 3)
        try:
            barrier.wait()
            for i in range(6):
                _time.sleep(rng.random() * 0.03)
                k = 100 + seed * 10 + i
                try:
                    TF.commit_append(_mk(spark, [(k, k * 10)]), root)
                    landed.append(k)
                except ValueError as e:
                    assert "schema mismatch" in str(e), e
                    refused.append(k)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def deleter():
        rng = random.Random(seed * 11 + 1)
        try:
            barrier.wait()
            for _ in range(3):
                _time.sleep(rng.random() * 0.05)
                TF.delete_where_dv(spark, root, f"k = {rng.randrange(6)}")
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [
        threading.Thread(target=renamer),
        threading.Thread(target=appender),
        threading.Thread(target=deleter),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == [], errors
    live = TF.read_version(spark, root)
    assert live.columns == ["k", "val"]
    ks = sorted(r["k"] for r in live.collect())
    for k in landed:
        assert ks.count(k) == 1, (k, ks)
    for k in refused:
        assert k not in ks, (k, ks)
    # refusals only ever happen AFTER the rename landed — once refused,
    # an old-name appender never lands again (no reordering anomaly)
    # and the feed over the full history replays to the live snapshot
    key = lambda r: (r["_commit_version"], r["_change_type"], r["k"], r["val"])
    state: set = set()
    for _v, ct, k, val in sorted(
        key(r) for r in TF.table_changes(spark, root, None).collect()
    ):
        if ct == "delete":
            state.discard((k, val))
        else:
            state.add((k, val))
    assert state == {(r["k"], r["val"]) for r in live.collect()}
