"""Minimal versioned-table layer: time travel + atomic commits on plain
parquet, closing the gap the missing Delta/Iceberg jars leave.

The reference upserts into one mutable PostgreSQL table; a Spark
deployment wants MERGE with snapshot isolation. Without a table-format
jar in the environment, this module provides the smallest layout that
gives the load-bearing guarantees:

- **Immutable versions**: every commit writes a fresh parquet directory
  ``data/v{N}/`` plus a manifest ``_versions/v{N}.json``; nothing is
  ever rewritten in place.
- **Atomic visibility**: readers resolve the ``_latest`` pointer file,
  which is updated by ``os.replace`` (atomic on POSIX) strictly AFTER
  the data and manifest are durable. A crash anywhere mid-commit leaves
  the pointer on the previous version — readers never see a torn table,
  and the orphan data directory is harmless (reclaimed by ``vacuum``).
- **Time travel**: ``read_version(spark, root, version=k)`` reads any
  retained snapshot; the manifest records the parent version so history
  is a chain.
- **Idempotent redelivery**: the version number is recomputed from the
  pointer at commit time, so replaying a crashed commit simply writes
  the same next version again (the deterministic-merge property pinned
  by tests/test_persisted_state.py makes the bytes equal too).

At 100 TB the same layout holds: the manifest is one small JSON per
commit, the pointer swap is one rename, and data directories are
written by the cluster in parallel. What a real table format adds on
top — concurrent WRITERS via optimistic manifest CAS, file-level
deletes — is out of scope for this single-writer engine (documented,
not simulated).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def _versions_dir(root: str) -> str:
    return os.path.join(root, "_versions")


def _pointer_path(root: str) -> str:
    return os.path.join(root, "_latest")


def latest_version(root: str) -> int | None:
    """The committed version the pointer names, or None for an empty
    table. Only the pointer decides visibility — orphan data/manifests
    from crashed commits are invisible."""
    try:
        with open(_pointer_path(root)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def commit_version(df: DataFrame, root: str) -> int:
    """Write ``df`` as the next version and atomically publish it.
    Ordering is the crash-safety contract: (1) data parquet, (2)
    manifest json, (3) pointer replace — a crash between any two steps
    leaves the previous version live."""
    parent = latest_version(root)
    version = 0 if parent is None else parent + 1
    data_dir = os.path.join(root, "data", f"v{version:05d}")
    df.write.mode("overwrite").parquet(data_dir)

    os.makedirs(_versions_dir(root), exist_ok=True)
    manifest = {
        "version": version,
        "parent": parent,
        "data": os.path.relpath(data_dir, root),
        "schema": df.schema.jsonValue(),
    }
    man_path = os.path.join(_versions_dir(root), f"v{version:05d}.json")
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, man_path)

    ptr_tmp = _pointer_path(root) + ".tmp"
    with open(ptr_tmp, "w") as f:
        f.write(str(version))
    os.replace(ptr_tmp, _pointer_path(root))
    return version


def read_version(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read the latest committed snapshot, or time-travel to ``version``.
    Raises FileNotFoundError for an empty table and ValueError for a
    version that was never committed or has been vacuumed."""
    if version is None:
        version = latest_version(root)
        if version is None:
            raise FileNotFoundError(f"no committed version at {root}")
    man_path = os.path.join(_versions_dir(root), f"v{version:05d}.json")
    try:
        with open(man_path) as f:
            manifest = json.load(f)
    except FileNotFoundError:
        raise ValueError(
            f"version {version} not present at {root} (never committed, "
            "or removed by vacuum)"
        )
    return spark.read.parquet(os.path.join(root, manifest["data"]))


def history(root: str) -> list[dict]:
    """All retained manifests, oldest first."""
    vdir = _versions_dir(root)
    if not os.path.isdir(vdir):
        return []
    out = []
    for name in sorted(os.listdir(vdir)):
        if name.endswith(".json"):
            with open(os.path.join(vdir, name)) as f:
                out.append(json.load(f))
    return out


def vacuum(root: str, keep: int = 2) -> list[int]:
    """Drop all but the newest ``keep`` versions (never the live one):
    manifests first, then data directories — a reader holding an old
    manifest between the two deletes fails loudly on the manifest (gone)
    rather than silently reading half a data directory. Also reclaims
    orphan data directories from crashed commits (data written, pointer
    never advanced). Returns the removed version numbers."""
    live = latest_version(root)
    if live is None:
        return []
    retained = {
        m["version"] for m in history(root)[-keep:]
    } | {live}
    removed = []
    for m in history(root):
        v = m["version"]
        if v in retained:
            continue
        os.remove(os.path.join(_versions_dir(root), f"v{v:05d}.json"))
        shutil.rmtree(os.path.join(root, m["data"]), ignore_errors=True)
        removed.append(v)
    # orphans: data dirs with no manifest (crashed commits past the live
    # version) — invisible to readers, safe to reclaim
    data_root = os.path.join(root, "data")
    manifested = {m["data"] for m in history(root)}
    if os.path.isdir(data_root):
        for name in os.listdir(data_root):
            rel = os.path.join("data", name)
            if rel not in manifested:
                shutil.rmtree(os.path.join(data_root, name), ignore_errors=True)
    return removed
