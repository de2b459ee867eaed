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

**Admission control (round 12 — Delta's ``maxFilesPerTrigger`` /
``maxBytesPerTrigger``):** with ``.option("max_files_per_trigger", N)``
or ``.option("max_bytes_per_trigger", B)`` a long backlog or an initial
snapshot drains as BOUNDED micro-batches instead of one unbounded sink
transaction. Offsets step THROUGH commit history — and, within a large
commit or the snapshot, through its stable per-file partition plan:

- ``{"version": N}`` — versions <= N fully served (the clean form every
  pre-round-12 checkpoint carries; old checkpoints resume unchanged).
- ``{"version": N, "part": K}`` — versions <= N served, plus the first
  K partitions of version N+1's deterministic plan.
- ``{"version": A, "snap": 1, "part": K}`` — the first K per-file
  partitions of the initial snapshot served.

Each batch admits whole partitions until the file/byte budget is
reached (always >= 1 partition, so progress is guaranteed; budgets cost
a driver-side ``stat`` per admitted file, the same accounting Delta
reads off its log). The stepping needs the LAST offset, which the
Python streaming API does not pass to ``latestOffset()`` — the reader
learns it from ``initialOffset`` (fresh start), from every
``partitions(start, end)`` plan, and from the engine's restart ping
(``AcceptsLatestSeenOffset`` surfaces the checkpointed offset as a
``partitions(committed, committed)`` call before the first trigger), so
a checkpointed restart is rate-limited from its first micro-batch.
Under ``Trigger.AvailableNow`` the engine captures ONE stepped offset
per run (the wrapper cannot compose opaque offsets), so each
``availableNow`` run drains exactly one bounded batch — use a
processing-time trigger to drain a backlog continuously.
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


def _partition_cost(root: str, p) -> "tuple[int, int]":
    """(files, bytes) one input partition admits against the trigger
    budget — driver-side ``stat`` over the partition's immutable files,
    the same accounting Delta's admission control reads off its log."""
    if isinstance(p, _DvPartition):
        n = b = 0
        for s in p.sidecars:
            full = os.path.join(root, s)
            for name in os.listdir(full):
                if name.endswith(".parquet"):
                    n += 1
                    b += os.path.getsize(os.path.join(full, name))
        return max(n, 1), b
    full = os.path.join(root, p.dir_rel)
    if getattr(p, "file_name", None):
        return 1, os.path.getsize(os.path.join(full, p.file_name))
    n = b = 0  # legacy whole-directory partition
    for name in _list_parquet(root, p.dir_rel):
        n += 1
        b += os.path.getsize(os.path.join(full, name))
    return max(n, 1), b


def _offset_key(off: dict) -> tuple:
    """Total order over the stream's offset forms: snapshot-phase
    offsets precede change-feed offsets; within a phase, (version,
    part) — ``{"version": N, "part": K}`` sits between ``{"version":
    N}`` and ``{"version": N+1}``."""
    if off.get("snap"):
        return (0, off.get("part", 0), 0)
    return (1, off["version"], off.get("part", 0))


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
        # ADMISSION CONTROL (round 12): bound each micro-batch by files
        # and/or bytes. None/None keeps the pre-round-12 behavior
        # (latestOffset returns the live head).
        mft = options.get("max_files_per_trigger")
        mbt = options.get("max_bytes_per_trigger")
        self._max_files = int(mft) if mft is not None else None
        self._max_bytes = int(mbt) if mbt is not None else None
        if self._max_files is not None and self._max_files < 1:
            raise ValueError(
                f"max_files_per_trigger must be >= 1, got {mft}"
            )
        if self._max_bytes is not None and self._max_bytes < 1:
            raise ValueError(
                f"max_bytes_per_trigger must be >= 1, got {mbt}"
            )
        # last offset this reader has seen (initialOffset / every
        # partitions() call, including the engine's restart ping /
        # commit) — the base the admission stepping advances from
        self._pos: "dict | None" = None
        self._plans: dict = {}  # version -> its partition plan (stable)
        self._snap_plan: "list | None" = None
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
        off = (
            {"version": self._anchor, "snap": 1}
            if self._snapshot
            else {"version": self._initial}
        )
        self._pos = off
        return off

    def _version_plan(self, v: int) -> list:
        """Version ``v``'s deterministic partition plan (manifests and
        file listings are immutable, so the plan — and therefore every
        mid-version ``part`` offset — is stable across calls, restarts
        and reader instances). Cached; successes only."""
        if v not in self._plans:
            self._plans[v] = _plan_steps(self.root, v - 1, v)
        return self._plans[v]

    def _snapshot_parts(self, anchor: int) -> list:
        """The initial snapshot's per-file partition plan: every live
        data file of the anchor manifest, DV-subtracted — stable for
        the same reason as ``_version_plan``."""
        if self._snap_plan is None:
            m = _read_manifest(self.root, anchor)
            if m.get("evolved"):
                raise ValueError(
                    f"initial_snapshot at {self.root}: version "
                    f"{anchor} is schema-evolved — the streaming "
                    "source serves a single schema"
                )
            from ..operators.tablefmt import _data_list, _dv_map

            dv = _dv_map(m)
            parts = []
            for d in _data_list(m):
                dv_paths = list((dv.get(d) or {}).get("paths", []))
                for name in _list_parquet(self.root, d):
                    parts.append(
                        _SnapshotPartition(
                            self.root, anchor, d, dv_paths, name
                        )
                    )
            self._snap_plan = parts
        return self._snap_plan

    def latestOffset(self) -> dict:
        # Without admission options this is STATELESS by design (round
        # 11): the snapshot is keyed solely off the ``snap`` marker
        # that ``initialOffset`` plants, and committed offsets are
        # plain {"version": N}. With admission options the stepping
        # needs the last offset — learned from initialOffset/
        # partitions()/commit(), never from engine call-ordering
        # assumptions: a restart teaches it via the engine's
        # latest-seen-offset ping before the first trigger.
        from ..operators.tablefmt import latest_version

        live = latest_version(self.root)
        floor = self._anchor if self._snapshot else self._initial
        head = {"version": floor if live is None else max(floor, live)}
        if self._max_files is None and self._max_bytes is None:
            return head
        pos = self._pos
        if pos is None:
            # the engine may ask for latestOffset BEFORE initialOffset
            # on a fresh start (measured: it does). A fresh start's
            # position is the deterministic initial offset; a RESTART
            # always teaches the committed offset first via the
            # latest-seen-offset ping, so this branch can never step
            # from behind a checkpoint.
            pos = (
                {"version": self._anchor, "snap": 1}
                if self._snapshot
                else {"version": self._initial}
            )
        files = nbytes = 0

        def fits_more() -> bool:
            return (
                self._max_files is None or files < self._max_files
            ) and (self._max_bytes is None or nbytes < self._max_bytes)

        advanced = False
        cur = dict(pos)
        if cur.get("snap"):
            sp = self._snapshot_parts(cur["version"])
            k = cur.get("part", 0)
            while k < len(sp) and fits_more():
                f, b = _partition_cost(self.root, sp[k])
                files += f
                nbytes += b
                k += 1
                advanced = True
            if k < len(sp):
                return {"version": cur["version"], "snap": 1, "part": k}
            cur = {"version": cur["version"]}
        v, k = cur["version"], cur.get("part", 0)
        live_v = head["version"]
        while (v < live_v or k > 0) and (k > 0 or fits_more()):
            try:
                vp = self._version_plan(v + 1)
            except ValueError:
                if advanced:
                    break  # drain what's admitted; the refusal
                    # surfaces on the next trigger's empty step
                raise
            while k < len(vp) and fits_more():
                f, b = _partition_cost(self.root, vp[k])
                files += f
                nbytes += b
                k += 1
                advanced = True
            if k < len(vp):
                return {"version": v, "part": k}
            v += 1
            k = 0
        return {"version": v}

    def partitions(self, start: dict, end: dict):
        # teach the admission stepping the engine's position — this is
        # also how a checkpointed RESTART rate-limits from its first
        # trigger: AcceptsLatestSeenOffset surfaces the committed
        # offset as a partitions(committed, committed) ping
        if self._pos is None or _offset_key(end) > _offset_key(self._pos):
            self._pos = dict(end)
        if start == end:
            return []
        parts: list = []
        cursor = dict(start)
        if cursor.get("snap"):
            sp = self._snapshot_parts(cursor["version"])
            k0 = cursor.get("part", 0)
            if end.get("snap"):
                return sp[k0 : end.get("part", 0)]
            parts.extend(sp[k0:])
            cursor = {"version": cursor["version"]}
        sv, sk = cursor["version"], cursor.get("part", 0)
        ev, ek = end["version"], end.get("part", 0)
        if sk:
            vp = self._version_plan(sv + 1)
            if ev == sv:
                return parts + vp[sk:ek]
            parts.extend(vp[sk:])
            sv += 1
        for v in range(sv + 1, ev + 1):
            parts.extend(self._version_plan(v))
        if ek:
            parts.extend(self._version_plan(ev + 1)[:ek])
        return parts

    def read(self, partition):
        yield from _read_partition(partition, self._names, self._p2l)

    def commit(self, end: dict) -> None:
        # manifests are the WAL; nothing to acknowledge. Keep the
        # admission position current and bound the plan cache to the
        # uncommitted tail (O(backlog), not O(history)).
        if self._pos is None or _offset_key(end) > _offset_key(self._pos):
            self._pos = dict(end)
        done = end["version"] if not end.get("snap") else -1
        for v in [v for v in self._plans if v <= done]:
            del self._plans[v]
        if not end.get("snap") and self._snap_plan is not None:
            self._snap_plan = []  # snapshot fully served


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
