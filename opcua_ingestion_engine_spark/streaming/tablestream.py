"""The versioned table as a Structured Streaming SOURCE — Delta's
``spark.readStream.format("delta")`` + ``readChangeFeed`` parity for the
``operators/tablefmt`` layer (TF [EXT]; reference anchor: the Postgres
logical-decoding feed the reference's downstream consumers would attach
to its mutable ``modvalues`` table, ``Services/OpcSubscribeService.cs``
upserts).

``spark.readStream.format("table_changes").option("path", root)`` after
``spark.dataSource.register(TableChangesDataSource)`` yields every
committed change as (table columns + ``_change_type`` +
``_commit_version``) rows:

- **Offsets are commit versions** (the manifest log IS the WAL): a
  micro-batch serves the half-open version range ``(start, end]``.
  Manifests and data files are immutable, so a replayed batch re-reads
  byte-identical rows — exactly-once through the engine's offset log
  with no source-side dedup state.
- **O(changes) per micro-batch, planned from manifests alone**: an
  append step contributes its tail directories as ``insert``
  partitions; a ``delete_where_dv`` step contributes its new sidecar
  addresses as ``delete`` partitions (pre-images recovered from the
  immutable addressed files); a merge-on-read upsert/update step
  contributes BOTH (the delete+insert decomposition of an update, the
  same convention as ``tablefmt.table_changes``' keyless fast path);
  a ``data_identical`` maintenance step (compaction, z-order,
  DV-sidecar consolidation) is pass-through and contributes nothing.
- **One input partition per (step, data FILE)** for inserts and the
  initial snapshot (Delta's per-file split): a monolithic base commit
  whose single directory holds 32 parquet files fans out to 32
  parallel executor reads, each a plain pyarrow scan — no shuffle at
  the source, no SparkSession on the executor path. Delete steps stay
  per touched directory (their payload is the O(deleted rows)
  sidecars, not the data files).
- **Rewrite-class commits refuse loudly** (restore, copy-on-write
  delete/update/upsert rewrites, full_sync touching directories,
  schema evolution): their changes are not recoverable as O(changes)
  from the manifests, so the source raises and the consumer re-seeds
  from a snapshot — Delta's change-feed behavior for
  non-CDF-compatible history, surfaced at plan time instead of as
  wrong rows.

``starting_version`` (option, default: the table's full history — v0's
rows arrive as ``insert`` @ 0) positions the initial offset; a
checkpointed query resumes from the engine's committed offset instead.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

CHANGE_TYPE_COL = "_change_type"
COMMIT_VERSION_COL = "_commit_version"

#: ops whose manifest step the planner can serve as O(changes)
_MOR_OPS = ("upsert_mor", "update_where_dv")


def _read_manifest(root: str, version: int) -> dict:
    from ..operators.tablefmt import _manifest_path

    with open(_manifest_path(root, version)) as f:
        return json.load(f)


def _list_parquet(root: str, dir_rel: str) -> list:
    """Parquet file names of one data directory (driver-side planning
    listing — the same listing Delta's log carries per add-file)."""
    full = os.path.join(root, dir_rel)
    return sorted(n for n in os.listdir(full) if n.endswith(".parquet"))


class _TailPartition(InputPartition):
    """All rows of ONE data file, emitted as ``insert`` @ version
    (``file_name=None`` reads the whole directory — legacy form)."""

    def __init__(
        self, root: str, version: int, dir_rel: str,
        file_name: "str | None" = None,
    ):
        self.root = root
        self.version = version
        self.dir_rel = dir_rel
        self.file_name = file_name


class _DvPartition(InputPartition):
    """One touched directory's tombstoned pre-images, emitted as
    ``delete`` @ version — addresses from the step's new sidecars."""

    def __init__(
        self, root: str, version: int, dir_rel: str, sidecars: list
    ):
        self.root = root
        self.version = version
        self.dir_rel = dir_rel
        self.sidecars = sidecars


class _SnapshotPartition(InputPartition):
    """One data FILE of the INITIAL-SNAPSHOT batch: its live rows
    (deletion vectors subtracted positionally) emitted as ``insert`` @
    the snapshot version — Delta's readStream initial snapshot, split
    per file like Delta's add-file tasks (``file_name=None`` reads the
    whole directory — legacy form)."""

    def __init__(
        self, root: str, version: int, dir_rel: str, dv_paths: list,
        file_name: "str | None" = None,
    ):
        self.root = root
        self.version = version
        self.dir_rel = dir_rel
        self.dv_paths = dv_paths
        self.file_name = file_name


def _plan_steps(root: str, v_from: int, v_to: int) -> list:
    """Classify every manifest step in ``(v_from, v_to]`` into input
    partitions — the driver-side planning pass. Pure manifest reads;
    raises for steps the O(changes) contract cannot serve."""
    from ..operators.tablefmt import _data_list, _dv_map

    parts: list = []
    prev_list: "list | None" = None
    prev_dv: "dict | None" = None
    for v in range(v_from + 1, v_to + 1):
        m = _read_manifest(root, v)
        if m.get("evolved"):
            raise ValueError(
                f"table_changes stream at {root}: version {v} is "
                "schema-evolved — the streaming source serves a single "
                "schema; re-seed the consumer from a snapshot"
            )
        app = m.get("app") or {}
        cur = _data_list(m)
        if app.get("data_identical"):
            prev_list, prev_dv = cur, _dv_map(m)
            continue
        if prev_list is None and v > 0:
            pm = _read_manifest(root, v - 1)
            prev_list, prev_dv = _data_list(pm), _dv_map(pm)
        prev = prev_list or []
        known = {p for e in (prev_dv or {}).values() for p in e["paths"]}
        cur_paths = {p for e in _dv_map(m).values() for p in e["paths"]}
        new_sidecars = sorted(cur_paths - known)
        op = app.get("op")
        is_dv_step = (
            (op == "delete_where_dv" and cur == prev)
            or (op in _MOR_OPS and cur[: len(prev)] == prev)
        )
        if is_dv_step and known <= cur_paths:
            if new_sidecars:
                touched = sorted(
                    d
                    for d, e in _dv_map(m).items()
                    if any(p in new_sidecars for p in e["paths"])
                )
                for d in touched:
                    parts.append(_DvPartition(root, v, d, new_sidecars))
            for d in cur[len(prev):]:
                for name in _list_parquet(root, d):
                    parts.append(_TailPartition(root, v, d, name))
        elif (
            cur[: len(prev)] == prev
            and len(cur) > len(prev)
            and _dv_map(m) == (prev_dv or {})
        ):
            for d in cur[len(prev):]:
                for name in _list_parquet(root, d):
                    parts.append(_TailPartition(root, v, d, name))
        else:
            raise ValueError(
                f"table_changes stream at {root}: version {v} "
                f"(op={op!r}) is a rewrite-class commit — its changes "
                "are not recoverable as O(changes); re-seed the "
                "consumer from a snapshot"
            )
        prev_list, prev_dv = cur, _dv_map(m)
    return parts


def _arrow_with_cdf(
    tbl, change_type: str, version: int, names: list,
    p2l: "dict | None" = None,
):
    """Rename physical file columns to the stream's logical names
    (column mapping — renames never rewrite data files), append the two
    CDF columns, and align to the declared output column order."""
    import pyarrow as pa

    if p2l:
        tbl = tbl.rename_columns(
            [p2l.get(c, c) for c in tbl.column_names]
        )
    n = len(tbl)
    tbl = tbl.append_column(
        CHANGE_TYPE_COL, pa.array([change_type] * n, pa.string())
    )
    tbl = tbl.append_column(
        COMMIT_VERSION_COL, pa.array([version] * n, pa.int64())
    )
    return tbl.select(names)


def _read_partition(partition, names: list, p2l: "dict | None" = None):
    """Executor-side read: plain pyarrow over immutable files — no
    SparkSession, no shuffle. Yields Arrow record batches."""
    import pyarrow.parquet as pq

    full = os.path.join(partition.root, partition.dir_rel)
    one = getattr(partition, "file_name", None)
    files = [one] if one else sorted(
        n for n in os.listdir(full) if n.endswith(".parquet")
    )
    if isinstance(partition, _TailPartition):
        for name in files:
            tbl = pq.read_table(os.path.join(full, name))
            if len(tbl):
                yield from _arrow_with_cdf(
                    tbl, "insert", partition.version, names, p2l
                ).to_batches()
        return
    if isinstance(partition, _SnapshotPartition):
        # initial snapshot: the directory's live rows — subtract its
        # deletion vectors POSITIONALLY (the executor-side twin of
        # _apply_dv's anti join; single-file pyarrow reads are
        # file-ordered, so position == row index)
        import pyarrow as pa

        dead: dict = {}
        if partition.dv_paths:
            dv_files = [
                os.path.join(partition.root, p, n)
                for p in partition.dv_paths
                for n in sorted(
                    os.listdir(os.path.join(partition.root, p))
                )
                if n.endswith(".parquet")
            ]
            dv = pq.read_table(dv_files, columns=["_dv_path", "_dv_pos"])
            prefix = partition.dir_rel + "/"
            for p, pos in zip(
                dv["_dv_path"].to_pylist(), dv["_dv_pos"].to_pylist()
            ):
                if p.startswith(prefix):
                    dead.setdefault(p, set()).add(pos)
        for name in files:
            rel = partition.dir_rel + "/" + name
            tbl = pq.read_table(os.path.join(full, name))
            gone = dead.get(rel)
            if gone:
                keep = [i for i in range(len(tbl)) if i not in gone]
                tbl = tbl.take(pa.array(keep, pa.int64()))
            if len(tbl):
                yield from _arrow_with_cdf(
                    tbl, "insert", partition.version, names, p2l
                ).to_batches()
        return
    # _DvPartition: recover the tombstoned pre-images — addresses are
    # (file path relative to root, row position within the file); a
    # single-file pyarrow read is file-ordered, so position == row index
    import pyarrow as pa

    sidecar_files = [
        os.path.join(partition.root, p, n)
        for p in partition.sidecars
        for n in sorted(os.listdir(os.path.join(partition.root, p)))
        if n.endswith(".parquet")
    ]
    addrs = pq.read_table(sidecar_files, columns=["_dv_path", "_dv_pos"])
    path_col = addrs["_dv_path"].to_pylist()
    pos_col = addrs["_dv_pos"].to_pylist()
    by_file: dict = {}
    prefix = partition.dir_rel + "/"
    for p, pos in zip(path_col, pos_col):
        if p.startswith(prefix):
            by_file.setdefault(p, []).append(pos)
    for rel, positions in sorted(by_file.items()):
        tbl = pq.read_table(os.path.join(partition.root, rel))
        taken = tbl.take(pa.array(sorted(positions), pa.int64()))
        if len(taken):
            yield from _arrow_with_cdf(
                taken, "delete", partition.version, names, p2l
            ).to_batches()


class TableChangesStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, names: list):
        self.root = options.get("path")
        if not self.root:
            raise ValueError(
                "table_changes requires .option('path', <table root>)"
            )
        self._names = names
        # COLUMN MAPPING: files store PHYSICAL names; the stream serves
        # the LOGICAL schema captured at stream start (a rename commit
        # is data_identical pass-through — physical names never change,
        # so one map is correct for rows of every era; a restart picks
        # up post-rename logical names, like any streaming schema)
        from ..operators.tablefmt import _colmap, latest_version as _lv

        live0 = _lv(self.root)
        self._p2l = (
            {
                p: l
                for l, p in _colmap(
                    _read_manifest(self.root, live0)
                ).items()
            }
            if live0 is not None else {}
        )
        start = options.get("starting_version")
        # exclusive lower bound: -1 serves the whole history (v0's rows
        # arrive as inserts @ 0), matching table_changes(v_from=None)
        self._initial = int(start) - 1 if start is not None else -1
        # Delta's readStream initial snapshot: the FIRST micro-batch is
        # the live rows of the anchor version (starting_version, else
        # the latest at stream start) emitted as inserts; the feed then
        # follows from there. This is the in-product form of the
        # rewrite-class refusal's "re-seed from a snapshot".
        self._snapshot = str(
            options.get("initial_snapshot", "false")
        ).lower() in ("true", "1", "yes")
        if self._snapshot:
            from ..operators.tablefmt import latest_version

            if start is not None:
                self._anchor = int(start)
            else:
                live = latest_version(self.root)
                if live is None:
                    raise ValueError(
                        f"initial_snapshot at {self.root}: no committed "
                        "version to snapshot"
                    )
                self._anchor = live

    def initialOffset(self) -> dict:
        if self._snapshot:
            return {"version": self._anchor, "snap": 1}
        return {"version": self._initial}

    def latestOffset(self) -> dict:
        # STATELESS by design (round 11): the snapshot is keyed solely
        # off the ``snap`` marker that ``initialOffset`` plants — which
        # the engine consults only on a fresh, checkpoint-less start —
        # so correctness never rests on engine call-ordering across
        # restarts. Committed offsets are plain {"version": N}.
        from ..operators.tablefmt import latest_version

        live = latest_version(self.root)
        floor = self._anchor if self._snapshot else self._initial
        return {"version": floor if live is None else max(floor, live)}

    def partitions(self, start: dict, end: dict):
        parts: list = []
        if start.get("snap"):
            # the initial-snapshot prefix of the FIRST batch: every
            # live data file of the anchor manifest, DV-subtracted, as
            # one insert partition per file; the same batch then
            # follows with the (anchor, end] change steps below.
            anchor = start["version"]
            m = _read_manifest(self.root, anchor)
            if m.get("evolved"):
                raise ValueError(
                    f"initial_snapshot at {self.root}: version "
                    f"{anchor} is schema-evolved — the streaming "
                    "source serves a single schema"
                )
            from ..operators.tablefmt import _data_list, _dv_map

            dv = _dv_map(m)
            for d in _data_list(m):
                dv_paths = list((dv.get(d) or {}).get("paths", []))
                for name in _list_parquet(self.root, d):
                    parts.append(
                        _SnapshotPartition(
                            self.root, anchor, d, dv_paths, name
                        )
                    )
        parts.extend(
            _plan_steps(self.root, start["version"], end["version"])
        )
        return parts

    def read(self, partition):
        yield from _read_partition(partition, self._names, self._p2l)

    def commit(self, end: dict) -> None:
        pass  # manifests are the WAL; nothing to acknowledge


class TableChangesDataSource(DataSource):
    """``spark.readStream.format("table_changes").option("path", root)``
    after ``spark.dataSource.register(TableChangesDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "table_changes"

    def schema(self):
        from pyspark.sql.types import (
            LongType, StringType, StructField, StructType,
        )

        root = self.options.get("path")
        if not root:
            raise ValueError(
                "table_changes requires .option('path', <table root>)"
            )
        from ..operators.tablefmt import latest_version

        live = latest_version(root)
        if live is None:
            raise ValueError(f"no committed version at {root}")
        base = StructType.fromJson(_read_manifest(root, live)["schema"])
        return StructType(
            list(base.fields)
            + [
                StructField(CHANGE_TYPE_COL, StringType(), False),
                StructField(COMMIT_VERSION_COL, LongType(), False),
            ]
        )

    def streamReader(self, schema) -> TableChangesStreamReader:
        return TableChangesStreamReader(
            self.options, [f.name for f in schema.fields]
        )
