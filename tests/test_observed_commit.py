"""Round-12 optimization pins: commit-time metadata rides the commit's
own write job (``_observed_write`` / ``_constraints_obs``) instead of
driver-side pyarrow re-reads of the just-written directory.

What must hold (and did, via the pyarrow path, before round 12):

- float footer [min,max] are only trusted once NaN absence is proven;
  a NaN-bearing column loses its bounds and its ``__exact__`` flag;
- opt-in integer ``sums=`` land exactly in the manifest's ``__sums__``;
- CHECK constraints refuse violating writes with the same typed error,
  landing nothing (no manifest, no orphan data directory).

What is NEW: none of that may re-read the written data bytes on the
driver — this file fails the commit if any ``pyarrow.parquet.read_table``
happens during it (footer ``read_metadata`` stays, that is the
add-file-stats discipline).
"""

from __future__ import annotations

import math
import os

import pytest

from pyspark.sql import functions as F

from opcua_ingestion_engine_spark.operators import tablefmt as TF


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, v double, x long")


def test_commit_stats_ride_the_write(spark, tmp_path, monkeypatch):
    import pyarrow.parquet as pq

    root = str(tmp_path / "obs")
    TF.commit_version(_mk(spark, [(0, 0.5, 5)]), root)

    def no_data_reads(*a, **k):  # footers only: read_metadata stays legal
        raise AssertionError(
            "commit must not re-read written data bytes on the driver"
        )

    monkeypatch.setattr(pq, "read_table", no_data_reads)
    v = TF.commit_append(
        _mk(spark, [(1, 1.0, 10), (2, float("nan"), 20), (3, 2.5, 30)]),
        root,
        sums=("x",),
    )
    import json

    with open(TF._manifest_path(root, v)) as f:
        man = json.load(f)
    rel = TF._data_list(man)[-1]
    entry = man["stats"][rel]
    # NaN-bearing float column: bounds dropped, exactness demoted
    assert "v" not in entry
    assert "v" not in entry["__exact__"]
    # clean columns keep footer bounds
    assert entry["k"] == [1, 3]
    assert entry["x"] == [10, 30]
    # integer sums folded into the write job, exact
    assert entry["__sums__"] == {"x": 60}


def test_nan_free_floats_keep_bounds_without_data_reads(
    spark, tmp_path, monkeypatch
):
    import pyarrow.parquet as pq

    root = str(tmp_path / "obs2")
    monkeypatch.setattr(
        pq,
        "read_table",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("data read")),
    )
    v = TF.commit_version(_mk(spark, [(1, 1.0, 10), (2, 4.5, 20)]), root)
    import json

    with open(TF._manifest_path(root, v)) as f:
        man = json.load(f)
    entry = man["stats"][TF._data_list(man)[-1]]
    assert entry["v"] == [1.0, 4.5]
    assert "v" in entry["__exact__"]


def test_constraint_refusal_rides_the_write_and_lands_nothing(
    spark, tmp_path
):
    root = str(tmp_path / "obs3")
    TF.commit_version(_mk(spark, [(1, 1.0, 10)]), root)
    TF.add_constraint(spark, root, "k_pos", "k >= 0")
    v0 = TF.latest_version(root)
    with pytest.raises(ValueError) as ei:
        TF.commit_append(_mk(spark, [(-5, 1.0, 10)]), root)
    # same typed error as the pre-round-12 standalone probe, example row
    # included (recovered on the cold path only)
    assert "k_pos" in str(ei.value) and "e.g." in str(ei.value)
    assert TF.latest_version(root) == v0
    # nothing landed: no orphan directory beyond the committed one
    assert len(os.listdir(os.path.join(root, "data"))) == 1
    # the valid path still commits (and pays no separate probe job —
    # asserted structurally in test_persisted_state's maintenance spy)
    v1 = TF.commit_append(_mk(spark, [(7, 2.0, 1)]), root)
    assert v1 == v0 + 1
    got = sorted(
        map(tuple, TF.read_version(spark, root).collect())
    )
    assert got == [(1, 1.0, 10), (7, 2.0, 1)]


def test_mor_tail_constraint_refusal_cleans_both_halves(spark, tmp_path):
    root = str(tmp_path / "obs4")
    TF.commit_version(_mk(spark, [(1, 1.0, 10), (2, 2.0, 20)]), root)
    TF.add_constraint(spark, root, "v_small", "v < 100")
    v0 = TF.latest_version(root)
    with pytest.raises(ValueError, match="v_small"):
        TF.update_where_dv(spark, root, "k = 1", {"v": "v + 1000.0"})
    assert TF.latest_version(root) == v0
    assert len(os.listdir(os.path.join(root, "data"))) == 1
    # the violating attempt's DV sidecar directory is cleaned too
    dv_root = os.path.join(root, "dv")
    assert not os.path.exists(dv_root) or os.listdir(dv_root) == []
    # table unchanged, byte for byte
    got = sorted(map(tuple, TF.read_version(spark, root).collect()))
    assert got == [(1, 1.0, 10), (2, 2.0, 20)]


def test_observed_write_empty_frame(spark, tmp_path):
    out = str(tmp_path / "empty")
    df = _mk(spark, [(1, 1.0, 10)]).filter(F.lit(False))
    nan, sums = TF._observed_write(df, out, sums=("x",))
    assert nan == {"v": 0}
    assert sums == {"x": 0}


def test_observed_write_non_integer_sum_falls_back(spark, tmp_path):
    out = str(tmp_path / "fb")
    df = _mk(spark, [(1, 1.5, 10), (2, 2.5, 20)])
    nan, sums = TF._observed_write(df, out, sums=("v", "x"))
    # float sum is order-dependent — never folded, left to the caller's
    # pyarrow path (which also refuses it); integer folds
    assert "v" not in sums
    assert sums == {"x": 30}
    assert nan == {"v": 0}
    assert not math.isnan(nan["v"])


def test_distributed_bloom_bit_identical(spark, tmp_path, monkeypatch):
    """Above the size threshold the bloom build runs distributed; its
    bitmap must be BIT-IDENTICAL to the driver-side pyarrow build (same
    hash family, same exact-count sizing), for both int and string
    columns — probes against either bitmap then agree by construction."""
    import numpy as np

    out = str(tmp_path / "blm")
    df = spark.range(500).select(
        (F.col("id") % 97).alias("ki"),
        F.concat(F.lit("t"), (F.col("id") % 53).cast("string")).alias("ks"),
    )
    df.write.parquet(out)

    root, rel = str(tmp_path), "blm"
    # driver build first (threshold huge -> pyarrow path)
    via_driver = TF._write_dir_blooms(root, rel, ("ki", "ks"), spark)
    driver_blobs = {
        c: open(os.path.join(out, m["file"]), "rb").read()
        for c, m in via_driver.items()
    }
    # force the distributed path and rebuild
    monkeypatch.setattr(TF, "_BLOOM_DISTRIBUTED_MIN_BYTES", 1)
    via_dist = TF._write_dir_blooms(root, rel, ("ki", "ks"), spark)
    assert via_dist.keys() == via_driver.keys() == {"ki", "ks"}
    for c in ("ki", "ks"):
        assert via_dist[c]["m"] == via_driver[c]["m"]
        assert via_dist[c]["n"] == via_driver[c]["n"]
        blob = open(os.path.join(out, via_dist[c]["file"]), "rb").read()
        assert blob == driver_blobs[c], f"bitmap diverged for {c}"
    # membership probes behave on the distributed bitmap
    m = via_dist["ki"]["m"]
    blob = open(os.path.join(out, via_dist["ki"]["file"]), "rb").read()
    assert all(TF._bloom_contains(blob, m, v) for v in range(97))
    misses = sum(
        TF._bloom_contains(blob, m, v) for v in range(1000, 3000)
    )
    assert misses < 40  # ~0.5% fpp on 2000 probes, generous margin
