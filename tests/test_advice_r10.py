"""Pinned regressions for the round-9 ADVICE findings — all in the
versioned-table layer (``operators/tablefmt.py``):

1. ``_dir_col_sums`` must accumulate exactly even when a single file's
   int64 reduction would wrap (large-magnitude values, e.g. epoch-nanos).
2. ``stats_agg(sums=)`` must REFUSE non-integral columns instead of
   silently truncating fractions into the long-typed output.
3. A bloom point probe with an out-of-int64-range literal must keep the
   directory (conservative), never crash ``read_version``.
4. ``commit_full_sync`` must not unconditionally broadcast diff-sized key
   frames (they can approach the whole source on a divergent sync).
5. Caller-supplied ``app`` metadata must never clobber the layer's own
   op/audit keys (change-feed fast paths key on ``app.op``).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from opcua_ingestion_engine_spark.operators import tablefmt as TF


def test_dir_col_sums_exact_on_large_magnitude_ints(spark, tmp_path):
    """Epoch-nano-scale int64 values (~4e18) overflow a naive int64
    reduction within a handful of rows. The commit-time sums sidecar
    must record the EXACT per-directory total (Python bignum — JSON
    carries it losslessly) so stats_agg serves a correct SUM from
    metadata alone."""
    root = str(tmp_path / "bigsums")
    big = 4 * 10**18  # |5 * big| = 2e19 > 2^63-1 ~ 9.22e18
    d1 = spark.createDataFrame(
        [(i, big) for i in range(5)], "k long, v long"
    ).coalesce(1)
    d2 = spark.createDataFrame(
        [(i, -big) for i in range(5, 8)] + [(8, -(3 * 10**18))],
        "k long, v long",
    ).coalesce(1)
    TF.commit_append(d1, root, sums=("v",))
    TF.commit_append(d2, root, sums=("v",))

    # per-directory recorded sums are the exact bignums
    with open(TF._manifest_path(root, 1)) as f:
        stats = json.load(f)["stats"]
    recorded = sorted(
        e[TF._STATS_SUMS]["v"] for e in stats.values() if TF._STATS_SUMS in e
    )
    assert recorded == [-(3 * big + 3 * 10**18), 5 * big]

    # table total fits int64: metadata-served, exact, zero data reads
    audit = {}
    row = TF.stats_agg(spark, root, sums=("v",), audit=audit).collect()[0]
    assert row["sum_v"] == 5 * big - 3 * big - 3 * 10**18 == 5 * 10**18
    assert audit["dirs_scanned"] == 0


def test_stats_agg_sums_rejects_non_integral_column(spark, tmp_path):
    """A double column on the sums path would demote every directory to
    the scan path and then truncate fractions into the long-typed
    output — a silently wrong SUM. The layer must refuse instead."""
    root = str(tmp_path / "floatsums")
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 1.5).alias("v")
    )
    TF.commit_append(df, root)
    with pytest.raises(ValueError, match="non-integral"):
        TF.stats_agg(spark, root, sums=("v",)).collect()


def test_bloom_probe_out_of_int64_range_keeps_directory(spark, tmp_path):
    """``prune={col: ('=', 2**63)}`` used to raise OverflowError inside
    ``_bloom_h12`` and crash the read. The probe must conservatively
    keep the directory (pruning is an optimization, never a filter)."""
    assert TF._bloom_h12(2**63) is None
    assert TF._bloom_h12(-(2**63) - 1) is None
    # in-range values still hash
    assert TF._bloom_h12(2**63 - 1) is not None

    root = str(tmp_path / "bigprobe")
    df = spark.range(100).select(F.col("id").alias("k"))
    TF.commit_append(df, root, bloom=("k",))
    audit = {}
    # no OverflowError: the bloom probe declines (None -> keep); the
    # RANGE bounds then legitimately exclude the directory (no int64 row
    # can equal 2**63), so the read is empty — the right relational truth
    got = TF.read_version(spark, root, prune={"k": ("=", 2**63)}, audit=audit)
    assert got.count() == 0
    assert audit["dirs_total"] == 1


def test_full_sync_correct_without_broadcast(spark, tmp_path, monkeypatch):
    """With the broadcast threshold forced to 0 every diff-key join in
    commit_full_sync must take the non-broadcast path (AQE-planned) and
    still produce the exact three-clause MERGE result."""
    monkeypatch.setattr(TF, "_DV_BROADCAST_MAX_ROWS", 0)
    root = str(tmp_path / "fsync")
    base = spark.createDataFrame(
        [(i, f"n{i}", i * 10) for i in range(20)], "k long, name string, v long"
    )
    TF.commit_version(base, root)
    # source: updates k<5, deletes 5<=k<10, keeps 10..19, inserts 20..24
    source = spark.createDataFrame(
        [(i, f"N{i}", i * 100) for i in range(5)]
        + [(i, f"n{i}", i * 10) for i in range(10, 20)]
        + [(i, f"new{i}", -i) for i in range(20, 25)],
        "k long, name string, v long",
    )
    TF.commit_full_sync(spark, root, source, keys=["k"])
    got = sorted(
        tuple(r) for r in TF.read_version(spark, root).collect()
    )
    want = sorted(tuple(r) for r in source.collect())
    assert got == want


def test_app_layer_keys_win_over_caller(spark, tmp_path):
    """A hostile/buggy caller app dict must not clobber the layer's
    op/audit keys: ``table_changes``' DV fast path keys on
    ``app.op == 'delete_where_dv'`` — an overridden op would silently
    degrade spanning change feeds to the keyed diff (which errors
    without keys=)."""
    root = str(tmp_path / "appwin")
    df = spark.createDataFrame(
        [(i, i * 10) for i in range(10)], "k long, v long"
    )
    TF.commit_version(df, root)
    TF.delete_where_dv(
        spark, root, "k >= 8",
        app={"op": "evil", "dv_rows": -1, "note": "mine"},
    )
    with open(TF._manifest_path(root, 1)) as f:
        app = json.load(f)["app"]
    assert app["op"] == "delete_where_dv"
    assert app["dv_rows"] == 2
    assert app["note"] == "mine"  # benign caller keys survive

    # spanning change feed stays on the keyless DV fast path
    feed = TF.table_changes(spark, root, 0, 1)
    dels = sorted(
        r["k"] for r in feed.filter(
            F.col(TF.CHANGE_TYPE_COL) == "delete"
        ).collect()
    )
    assert dels == [8, 9]

    # the upsert path too: op must stay 'upsert'
    batch = spark.createDataFrame([(3, 999)], "k long, v long")
    TF.commit_upsert(spark, root, batch, keys=["k"], app={"op": "evil"})
    with open(TF._manifest_path(root, 2)) as f:
        assert json.load(f)["app"]["op"] == "upsert"
