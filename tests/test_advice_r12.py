"""Pinned regressions for the round-11 ADVICE findings:

1. (high) Full-replace commits (``commit_version``/``commit_merge`` via
   ``_try_commit``) must honor retired/occupied physical slots: after
   ``drop_column('v')``, a replace whose schema re-adds ``v`` used to
   write it under the retired slot while the child manifest inherited
   ``retired=['v']`` verbatim — so ``_logicalize`` projected the column
   away on every read (silent column loss). The fix remaps colliding
   new columns to fresh ``name__p<version>`` slots, exactly as
   ``commit_append(evolve=True)`` does.
2. (low) Pre-v0 constraint edits were a last-wins ``os.replace`` on the
   shared side file: two concurrent ``add_constraint`` calls on a table
   with no committed version could silently drop one. Now a
   create-exclusive ``os.link`` generation CAS (loser re-reads and
   re-merges).
3. (low) ``decode_jpeg``'s marker scan must tolerate 0xFF fill bytes
   before a marker code (T.81 B.1.1.2) instead of mis-parsing the
   stream.
"""

from __future__ import annotations

import json
import os
import threading

import numpy as np
import pytest
from pyspark.sql import functions as F

from opcua_ingestion_engine_spark.operators import tablefmt as TF


def _mk(spark, rows, schema="k long, v long"):
    return spark.createDataFrame(rows, schema).coalesce(1)


# ---------------------------------------------------------------------------
# 1. retired-slot collision in full-replace commits
# ---------------------------------------------------------------------------


def test_replace_after_drop_readds_column_under_fresh_slot(spark, tmp_path):
    """The exact ADVICE repro: commit(k,v) -> drop_column(v) ->
    commit_version(k,v) -> read must return BOTH columns with the
    replace frame's values (pre-fix it returned only ['k'])."""
    root = str(tmp_path / "replace_readd")
    TF.commit_append(_mk(spark, [(1, 10), (2, 20)]), root)   # v0: k, v
    TF.drop_column(root, "v")                                # v1: k
    TF.commit_version(_mk(spark, [(3, 33), (4, 44)]), root)  # v2: k, v
    out = TF.read_version(spark, root)
    assert out.columns == ["k", "v"]
    assert sorted(tuple(r) for r in out.collect()) == [(3, 33), (4, 44)]
    with open(TF._manifest_path(root, 2)) as f:
        m = json.load(f)
    # the manifest must claim a FRESH physical slot, keep the tombstone
    assert m["colmap"]["v"].startswith("v__p")
    assert m["retired"] == ["v"]
    # and the manifest schema must agree with what reads serve
    assert [f_["name"] for f_ in m["schema"]["fields"]] == ["k", "v"]


def test_replace_new_column_cannot_claim_renamed_slot(spark, tmp_path):
    """After rename a->b (logical b stored physically as 'a'), a replace
    that introduces a NEW logical column named 'a' must not write into
    b's physical home."""
    root = str(tmp_path / "replace_rename")
    TF.commit_append(_mk(spark, [(1, 10)], "k long, a long"), root)  # v0
    TF.rename_column(root, "a", "b")                                 # v1
    # replace with columns (k, b, a): b keeps its slot, a needs a fresh one
    TF.commit_version(
        _mk(spark, [(5, 50, 500)], "k long, b long, a long"), root
    )                                                                # v2
    out = TF.read_version(spark, root)
    assert out.columns == ["k", "b", "a"]
    assert [tuple(r) for r in out.collect()] == [(5, 50, 500)]
    with open(TF._manifest_path(root, 2)) as f:
        m = json.load(f)
    assert m["colmap"]["b"] == "a"
    assert m["colmap"]["a"].startswith("a__p")
    # time travel still serves the old shape
    old = TF.read_version(spark, root, 0)
    assert old.columns == ["k", "a"]
    assert [tuple(r) for r in old.collect()] == [(1, 10)]


def test_merge_after_drop_readds_column_correctly(spark, tmp_path):
    """commit_merge routes through the same _try_commit — pin the
    read-modify-write path too."""
    root = str(tmp_path / "merge_readd")
    TF.commit_append(_mk(spark, [(1, 10)]), root)  # v0: k, v
    TF.drop_column(root, "v")                      # v1: k

    def remerge(cur):
        return _mk(spark, [(1, 111), (2, 222)])

    TF.commit_merge(spark, root, remerge)          # v2: k, v
    out = TF.read_version(spark, root)
    assert out.columns == ["k", "v"]
    assert sorted(tuple(r) for r in out.collect()) == [(1, 111), (2, 222)]


def test_replace_readd_then_append_and_mutate(spark, tmp_path):
    """Life goes on after the fresh-slot replace: evolve-appends, DV
    deletes, and the change feed all speak the logical name."""
    root = str(tmp_path / "replace_life")
    TF.commit_append(_mk(spark, [(1, 10)]), root)
    TF.drop_column(root, "v")
    TF.commit_version(_mk(spark, [(3, 33), (4, 44)]), root)
    TF.commit_append(_mk(spark, [(5, 55)]), root, evolve=True)
    TF.delete_where_dv(spark, root, "v = 33")
    got = sorted(tuple(r) for r in TF.read_version(spark, root).collect())
    assert got == [(4, 44), (5, 55)]


# ---------------------------------------------------------------------------
# 2. pre-v0 constraint side-file CAS
# ---------------------------------------------------------------------------


def test_concurrent_prev0_adds_both_land(spark, tmp_path):
    root = str(tmp_path / "prev0_race")
    os.makedirs(root, exist_ok=True)
    n_threads = 8
    barrier = threading.Barrier(n_threads)
    errs: list = []

    def add(i):
        try:
            barrier.wait()
            TF.add_constraint(spark, root, f"c{i}", f"v > {i}")
        except Exception as e:  # pragma: no cover - failure detail
            errs.append(e)

    ts = [threading.Thread(target=add, args=(i,)) for i in range(n_threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    cons = TF.table_constraints(root)
    assert set(cons) == {f"c{i}" for i in range(n_threads)}
    # the first data commit lifts the FULL merged set into the chain
    TF.commit_append(
        _mk(spark, [(1, 100)]), root
    )
    assert set(TF.table_constraints(root)) == {
        f"c{i}" for i in range(n_threads)
    }


def test_prev0_add_drop_and_unversioned_migration(spark, tmp_path):
    root = str(tmp_path / "prev0_seq")
    os.makedirs(root, exist_ok=True)
    # an old-round unversioned side file pre-exists
    with open(TF._constraints_path(root), "w") as f:
        json.dump({"legacy": "v > 0"}, f)
    TF.add_constraint(spark, root, "fresh", "k IS NOT NULL")
    assert set(TF.table_constraints(root)) == {"legacy", "fresh"}
    TF.drop_constraint(root, "legacy")
    assert set(TF.table_constraints(root)) == {"fresh"}
    with pytest.raises(ValueError, match="no constraint"):
        TF.drop_constraint(root, "legacy")
    with pytest.raises(ValueError, match="already exists"):
        TF.add_constraint(spark, root, "fresh", "k IS NOT NULL")
    # enforcement works from the side-file chain before v0 ...
    with pytest.raises(ValueError, match="fresh"):
        TF.commit_append(
            spark.createDataFrame([(None, 1)], "k long, v long"), root
        )
    # ... and from the manifest chain after
    TF.commit_append(_mk(spark, [(1, 10)]), root)
    with pytest.raises(ValueError, match="fresh"):
        TF.commit_append(
            spark.createDataFrame([(None, 2)], "k long, v long"), root
        )


# ---------------------------------------------------------------------------
# 3. JPEG fill bytes before markers
# ---------------------------------------------------------------------------


def _gray(h, w, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def test_decode_tolerates_fill_bytes_before_markers():
    from opcua_ingestion_engine_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    px = _gray(16, 24)
    data = encode_jpeg(px)
    ref = decode_jpeg(data)

    # insert fill 0xFFs before the first DQT marker and before EOI
    def pad_before(b: bytes, marker: bytes, n: int) -> bytes:
        i = b.index(marker)
        return b[:i] + b"\xff" * n + b[i:]

    padded = pad_before(data, b"\xff\xdb", 3)
    padded = pad_before(padded, b"\xff\xd9", 2)
    got = decode_jpeg(padded)
    assert np.array_equal(got[0], ref[0]) and got[1:] == ref[1:]


def test_decode_refuses_fill_bytes_to_eof():
    from opcua_ingestion_engine_spark.operators.jpeg import decode_jpeg

    with pytest.raises(ValueError, match="truncated|marker"):
        decode_jpeg(b"\xff\xd8" + b"\xff" * 8)
