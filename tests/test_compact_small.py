"""compact_small — bin-packing compaction (Delta OPTIMIZE's shape).

The scale contract under test: maintenance merges ONLY the sub-threshold
directory tail; large directories are never rewritten (their files,
stats, blooms, sums, and deletion vectors carry by reference), visible
rows are bit-for-bit unchanged, and the commit is data_identical so
change feeds and the streaming source pass it through. Semantic anchor:
the reference's maintenance jobs never block or rewrite hot data
(Services/OpcSubscribeService.cs row-lock discipline); the shape is
Delta OPTIMIZE bin-packing rather than compact()'s full rewrite.
"""
from __future__ import annotations

import json
import os
import threading

import pytest
from pyspark.sql import functions as F

from opcua_ingestion_engine_spark.operators import tablefmt as TF

SMALL = 100_000  # bytes — test threshold between payload and tail dirs


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _payload(spark, lo, hi):
    """~64 incompressible chars/row — a few thousand rows clears SMALL."""
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("v"),
    )


def _tiny(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("v"),
    )


def _dir_snapshot(root, rel):
    """(path, size, mtime_ns) of every file under one data dir."""
    out = []
    for base, _dirs, names in os.walk(os.path.join(root, rel)):
        for n in sorted(names):
            st = os.stat(os.path.join(base, n))
            out.append((os.path.join(base, n), st.st_size, st.st_mtime_ns))
    return out


def test_compact_small_merges_tail_keeps_big_dirs(spark, tmp_path):
    """Only the small tail is merged: the big directory's files are
    byte-identical untouched (same inode stats), its manifest stats
    entry carries verbatim, rows are unchanged, the commit is
    data_identical, and a second call finds nothing to do."""
    root = str(tmp_path / "binpack")
    TF.commit_append(_payload(spark, 0, 40_000), root)       # v0 (big)
    for lo, hi in ((40_000, 40_010), (40_010, 40_030), (40_030, 40_035)):
        TF.commit_append(_tiny(spark, lo, hi), root)          # v1..v3

    pm = TF.history(root)[-1]
    dirs = TF._data_list(pm)
    big = dirs[0]
    assert TF._dir_bytes(root, big) >= SMALL
    assert all(TF._dir_bytes(root, d) < SMALL for d in dirs[1:])

    pre = _rows(TF.read_version(spark, root))
    big_before = _dir_snapshot(root, big)
    big_stats_before = pm["stats"][big]

    v = TF.compact_small(spark, root, small_bytes=SMALL)
    assert v == 4
    m = TF.history(root)[-1]
    data = TF._data_list(m)
    assert data[0] == big and len(data) == 2  # untouched + one merged
    assert _dir_snapshot(root, big) == big_before
    assert m["stats"][big] == big_stats_before
    merged = data[1]
    assert m["stats"][merged][TF._STATS_ROWS] == 35
    assert m["app"]["op"] == "compact_small"
    assert m["app"]["data_identical"] is True
    assert m["app"]["dirs_merged"] == 3
    assert _rows(TF.read_version(spark, root)) == pre
    # time travel to the pre-compaction version still reads (no vacuum)
    assert _rows(TF.read_version(spark, root, 3)) == pre

    # the merged dir is the only small dir left -> below min_dirs
    assert TF.compact_small(spark, root, small_bytes=SMALL) is None
    with pytest.raises(ValueError, match="min_dirs"):
        TF.compact_small(spark, root, min_dirs=1)


def test_compact_small_applies_dv_and_drops_entries(spark, tmp_path):
    """Deletion vectors addressing merged directories are APPLIED (the
    deleted rows leave the files physically; their dv entries drop);
    an untouched directory's vectors carry verbatim."""
    root = str(tmp_path / "binpack_dv")
    TF.commit_append(_payload(spark, 0, 40_000), root)        # v0 (big)
    TF.commit_append(_tiny(spark, 40_000, 40_010), root)      # v1
    TF.commit_append(_tiny(spark, 40_010, 40_020), root)      # v2
    TF.delete_where_dv(spark, root, "k = 40005")              # v3 (tail)
    TF.delete_where_dv(spark, root, "k = 5")                  # v4 (big)

    pm = TF.history(root)[-1]
    big, tail1 = TF._data_list(pm)[0], TF._data_list(pm)[1]
    assert set(TF._dv_map(pm)) == {big, tail1}
    pre = _rows(TF.read_version(spark, root))
    assert not any(r[0] in (5, 40005) for r in pre)

    v = TF.compact_small(spark, root, small_bytes=SMALL)
    assert v == 5
    m = TF.history(root)[-1]
    assert set(TF._dv_map(m)) == {big}  # tail entries folded away
    merged = TF._data_list(m)[-1]
    raw = spark.read.parquet(os.path.join(root, merged))
    assert raw.filter(F.col("k") == 40005).count() == 0  # physically gone
    assert raw.count() == 19
    assert _rows(TF.read_version(spark, root)) == pre


def test_compact_small_preserves_bloom_and_sums_sidecars(spark, tmp_path):
    """A table maintaining bloom/sums sidecars keeps both surfaces
    across bin-packing: the merged directory gets fresh sidecars,
    metadata-only SUM still matches, and point-lookup pruning still
    drops directories."""
    root = str(tmp_path / "binpack_meta")
    TF.commit_append(
        _payload(spark, 0, 40_000), root, bloom=("k",), sums=("k",)
    )
    TF.commit_append(
        _tiny(spark, 40_000, 40_010), root, bloom=("k",), sums=("k",)
    )
    TF.commit_append(
        _tiny(spark, 40_010, 40_020), root, bloom=("k",), sums=("k",)
    )
    want_sum = sum(range(40_020))

    v = TF.compact_small(spark, root, small_bytes=SMALL)
    assert v == 3
    m = TF.history(root)[-1]
    merged = TF._data_list(m)[-1]
    entry = m["stats"][merged]
    assert "k" in (entry.get(TF._STATS_BLOOMS) or {})
    assert (entry.get(TF._STATS_SUMS) or {}).get("k") == sum(
        range(40_000, 40_020)
    )
    audit: dict = {}
    row = TF.stats_agg(spark, root, sums=("k",), audit=audit).collect()[0]
    assert row["sum_k"] == want_sum
    assert audit["dirs_scanned"] == 0  # still metadata-only post-merge

    audit: dict = {}
    hit = TF.read_version(
        spark, root, prune={"k": ("=", 40_015)}, audit=audit
    )
    assert audit["dirs_total"] == 2 and audit["dirs_kept"] == 1
    assert hit.filter(F.col("k") == 40_015).count() == 1


def test_compact_small_under_rename_and_evolution(spark, tmp_path):
    """Column mapping + schema evolution: the merged directory is
    written in PHYSICAL names (renames never rewrite), evolve-added
    columns normalize to the union schema, logical reads and time
    travel are unchanged."""
    root = str(tmp_path / "binpack_colmap")
    TF.commit_append(_payload(spark, 0, 40_000), root)        # v0 (big)
    TF.rename_column(root, "v", "w")                          # v1 (meta)
    TF.commit_append(
        spark.range(40_000, 40_010).select(
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("w"),
            F.lit(1).alias("z"),
        ),
        root,
        evolve=True,
    )                                                         # v2
    TF.commit_append(
        spark.range(40_010, 40_020).select(
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("w"),
            F.lit(2).alias("z"),
        ),
        root,
    )                                                         # v3
    pre = _rows(TF.read_version(spark, root))

    ver = TF.compact_small(spark, root, small_bytes=SMALL)
    assert ver == 4
    m = TF.history(root)[-1]
    assert m.get("evolved") is True
    assert TF.read_version(spark, root).columns == ["k", "w", "z"]
    assert _rows(TF.read_version(spark, root)) == pre
    merged = TF._data_list(m)[-1]
    raw_cols = spark.read.parquet(os.path.join(root, merged)).columns
    assert "v" in raw_cols and "w" not in raw_cols  # physical slot kept
    # time travel across the maintenance commit
    assert len(_rows(TF.read_version(spark, root, 0))) == 40_000


def test_compact_small_leaves_retired_slots_behind(spark, tmp_path):
    """After drop_column the retired physical slot rides only in the
    OLD files: the merged directory omits it, the untouched big
    directory keeps it, and the union read resolves by name."""
    root = str(tmp_path / "binpack_retired")
    TF.commit_append(_payload(spark, 0, 40_000), root)        # v0 (big)
    TF.drop_column(root, "v")                                 # v1 (meta)
    TF.commit_append(
        spark.range(40_000, 40_010).select(F.col("id").alias("k")), root
    )                                                         # v2
    TF.commit_append(
        spark.range(40_010, 40_020).select(F.col("id").alias("k")), root
    )                                                         # v3
    pre = _rows(TF.read_version(spark, root))

    ver = TF.compact_small(spark, root, small_bytes=SMALL)
    assert ver == 4
    m = TF.history(root)[-1]
    assert m.get("evolved") is True
    assert m.get("retired") == ["v"]
    big, merged = TF._data_list(m)[0], TF._data_list(m)[-1]
    assert "v" in spark.read.parquet(os.path.join(root, big)).columns
    assert spark.read.parquet(
        os.path.join(root, merged)
    ).columns == ["k"]
    assert TF.read_version(spark, root).columns == ["k"]
    assert _rows(TF.read_version(spark, root)) == pre


def test_maybe_compact_small_bytes_cadence(spark, tmp_path):
    """The cadence switch: small_bytes routes maybe_compact to
    bin-packing (big dirs untouched), stays a no-op below max_dirs,
    refuses the zorder combination, and — the load-bearing scale
    promise — NEVER falls back to a full rewrite when the tail has
    nothing to merge."""
    root = str(tmp_path / "binpack_cadence")
    with pytest.raises(ValueError, match="mutually exclusive"):
        TF.maybe_compact(
            spark, root, 4, zorder=("k", "v"), small_bytes=SMALL
        )

    TF.commit_append(_payload(spark, 0, 40_000), root)        # v0 (big)
    TF.commit_append(_tiny(spark, 40_000, 40_010), root)      # v1
    assert TF.maybe_compact(spark, root, 3, small_bytes=SMALL) is None
    TF.commit_append(_tiny(spark, 40_010, 40_020), root)      # v2
    big = TF._data_list(TF.history(root)[-1])[0]
    big_before = _dir_snapshot(root, big)
    v = TF.maybe_compact(spark, root, 3, small_bytes=SMALL)
    assert v == 3
    assert _dir_snapshot(root, big) == big_before
    assert TF.history(root)[-1]["app"]["op"] == "compact_small"

    # an all-big table at the dir threshold: bin-packing finds nothing
    # and the cadence does NOT full-rewrite (that's the whole point)
    root2 = str(tmp_path / "allbig")
    for lo in (0, 40_000, 80_000):
        TF.commit_append(_payload(spark, lo, lo + 40_000), root2)
    assert TF.maybe_compact(spark, root2, 3, small_bytes=SMALL) is None
    assert TF.latest_version(root2) == 2  # no rewrite version appeared


def test_compact_small_changefeed_passthrough(spark, tmp_path):
    """Change-feed ranges spanning a bin-packing commit stay on the
    O(changes) fast path: only true appends contribute, the merged
    directory is never scanned, and a maintenance-only range is the
    empty feed."""
    root = str(tmp_path / "binpack_cdc")
    TF.commit_append(_payload(spark, 0, 40_000), root)        # v0 (big)
    TF.commit_append(_tiny(spark, 40_000, 40_005), root)      # v1
    TF.commit_append(_tiny(spark, 40_005, 40_010), root)      # v2
    v = TF.compact_small(spark, root, small_bytes=SMALL)      # v3
    assert v == 3
    TF.commit_append(_tiny(spark, 40_010, 40_015), root)      # v4

    feed = _rows(
        TF.table_changes(spark, root, 1, 4).select(
            "k", "_change_type", "_commit_version"
        )
    )
    assert feed == sorted(
        [(k, "insert", 2) for k in range(40_005, 40_010)]
        + [(k, "insert", 4) for k in range(40_010, 40_015)]
    )
    merged = TF._data_list(TF.history(root)[3])[-1]
    touched = TF.table_changes(spark, root, 1, 4).inputFiles()
    assert touched and not any(merged in p for p in touched)
    assert TF.table_changes(spark, root, 2, 3).count() == 0


def test_compact_small_races_appender_without_losing_rows(spark, tmp_path):
    """CAS discipline under a live appender: maintenance rebases on
    lost races, every committed manifest stays readable, and the final
    snapshot is exactly the union of all appended rows."""
    root = str(tmp_path / "binpack_race")
    TF.commit_append(_payload(spark, 0, 40_000), root)

    def appender():
        for i in range(6):
            lo = 40_000 + i * 10
            TF.commit_append(_tiny(spark, lo, lo + 10), root)

    t = threading.Thread(target=appender)
    t.start()
    merges = 0
    for _ in range(4):
        if TF.compact_small(spark, root, small_bytes=SMALL) is not None:
            merges += 1
    t.join()
    # drain whatever tail the race left so the final layout is merged
    if TF.compact_small(spark, root, small_bytes=SMALL) is not None:
        merges += 1
    assert merges >= 1  # at least the post-race drain merged
    got = _rows(TF.read_version(spark, root).select("k"))
    assert got == [(k,) for k in range(40_060)]
    for m in TF.history(root):
        for d in TF._data_list(m):
            # a published manifest may only reference directories that
            # exist (losers clean their orphans; winners' dirs live)
            assert os.path.isdir(os.path.join(root, d)), (
                m["version"], d,
            )
        json.dumps(m)  # round-trips


def test_compact_small_fully_deleted_tail_merges_to_empty_dir(
    spark, tmp_path
):
    """Degenerate tail: every row in the small directories is deleted by
    DVs before the merge. The merged directory is then EMPTY (schema-only
    parquet), the dv entries still fold away, reads stay bit-identical,
    time travel to the pre-merge version still works, and a change feed
    across the merge reports no row changes (data_identical)."""
    root = str(tmp_path / "binpack_empty")
    TF.commit_append(_payload(spark, 0, 40_000), root)        # v0 (big)
    TF.commit_append(_tiny(spark, 40_000, 40_005), root)      # v1
    TF.commit_append(_tiny(spark, 40_005, 40_012), root)      # v2
    TF.delete_where_dv(spark, root, "k >= 40000")             # v3: all tail

    pre = _rows(TF.read_version(spark, root))
    assert len(pre) == 40_000

    v = TF.compact_small(spark, root, small_bytes=SMALL)
    assert v == 4
    m = TF.history(root)[-1]
    assert m["app"]["dirs_merged"] == 2
    assert TF._dv_map(m) == {}  # tail vectors folded into... nothing
    merged = TF._data_list(m)[-1]
    raw = spark.read.parquet(os.path.join(root, merged))
    assert raw.count() == 0 and set(raw.columns) == {"k", "v"}
    assert _rows(TF.read_version(spark, root)) == pre
    assert _rows(TF.read_version(spark, root, 3)) == pre
    # the feed across the merge commit carries zero row changes
    feed = TF.table_changes(spark, root, 3)
    assert feed.count() == 0


def test_maybe_compact_small_bytes_still_bounds_dv_sidecars(
    spark, tmp_path
):
    """An all-large layout pinned at >= max_dirs under live dv-deletes:
    compact_small finds nothing to merge, but the cadence must STILL
    enforce max_dv_sidecars (compact() subsumes consolidation by
    committing vector-free; bin-packing never clears large-dir vectors,
    so without this the scan-time sidecar union grows forever)."""
    root = str(tmp_path / "allbig_hotdv")
    for lo in (0, 40_000, 80_000):
        TF.commit_append(_payload(spark, lo, lo + 40_000), root)
    for k in (3, 40_003, 80_003):
        TF.delete_where_dv(spark, root, f"k = {k}")
    pm = TF.history(root)[-1]
    n_sidecars = len(
        {p for e in TF._dv_map(pm).values() for p in e["paths"]}
    )
    assert n_sidecars == 3
    pre = _rows(TF.read_version(spark, root))

    snaps = {
        d: _dir_snapshot(root, d) for d in TF._data_list(pm)
    }
    v = TF.maybe_compact(
        spark, root, 3, small_bytes=SMALL, max_dv_sidecars=3
    )
    assert v is not None
    m = TF.history(root)[-1]
    assert m["app"]["op"] != "compact"  # never a full rewrite
    folded = len(
        {p for e in TF._dv_map(m).values() for p in e["paths"]}
    )
    assert folded < 3  # the union a scan pays is bounded again
    for d, snap in snaps.items():
        assert _dir_snapshot(root, d) == snap  # data untouched
    assert _rows(TF.read_version(spark, root)) == pre

    # below the sidecar threshold the cadence stays a no-op
    assert (
        TF.maybe_compact(
            spark, root, 3, small_bytes=SMALL, max_dv_sidecars=3
        )
        is None
    )
