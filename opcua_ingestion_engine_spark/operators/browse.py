"""Browse / tree operators (SURVEY.md §2.9 B1-B4, §2.2 F6/F7, §2.1 S12).

The reference DFS-walks the OPC UA address space from the ObjectsFolder
root (``Helpers/OpcuaBrowse.cs:20-144``, root at ``:191-254``), pruning any
subtree whose DisplayName is in the connection's BrowseExclusionFolders
(``:80-87,216-223`` — F6), requesting only Object|Variable node classes
(``:33-41,196-204`` — F7), labeling each node with its class (``:56`` —
B4) and collapsing the UI display below depth 3 (``:49-53`` — B3), then
serializes a jsTree JSON file (``:256-264`` — S12).

Spark-first: the address space is an edge-list DataFrame; the walk is a
frontier BFS by iterated self-join. The exclusion prune is applied once
to the edge list up front (an excluded node never becomes a child, so its
subtree is unreachable); each level is then exactly ONE join of the
frontier against the pruned edge list — level count is tree depth, not
node count, so a 100 TB edge list costs depth × (one hash join). The
frontier is localCheckpoint'ed per level to keep plans linear (iterative
self-joins otherwise double the plan tree each round — the classic Spark
iterative-algorithm trap).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_BROWSE_DEPTH = 32  # safety bound; reference trees are ~3-5 deep


def browse_tree(
    nodes: DataFrame,
    exclusions: DataFrame,
    max_depth: int = MAX_BROWSE_DEPTH,
    opened_depth: int = 3,
    broadcast_frontier: bool = True,
) -> DataFrame:
    """B1 — expand the hierarchy from each connection's root, one BFS level
    per iteration, with the F6 exclusion prune folded into the one-time
    edge-list build (so an excluded folder's whole subtree is never
    visited) and the F7 node-class predicate.

    ``nodes``: (conn_id, parent_id, node_id, display_name, node_class)
    edge list, roots having parent_id NULL.
    ``exclusions``: (conn_id, folder) display names to prune.

    Returns (conn_id, parent_id, node_id, display_name, node_class, depth,
    opened) — ``opened`` is the B3 depth flag (JsTree ``state.opened``).

    ``broadcast_frontier=False`` switches to the bushy-wide fallback: a
    shuffled join per level keyed on (conn_id, parent_id) for address
    spaces whose frontier outgrows the broadcast threshold — same
    results (pinned by test_browse_shuffled_fallback_matches_broadcast),
    2 exchanges per level instead of 0.
    """
    # Materialize the edge list ONCE before iterating. The fixture derives
    # it from the fact table (events scan + distinct); left lazy, every BFS
    # level-join would recompute that derivation — measured 48s -> ~3s at
    # sf0.1. At scale this is the "cache the graph before iterating" rule
    # every Spark graph algorithm follows.
    #
    # The F6 exclusion prune is applied HERE, once, instead of as an
    # anti-join per level: an excluded node never appears as a child, so
    # its whole subtree is unreachable to the BFS — identical prune, and
    # each level is now exactly ONE join (frontier x edges). Roots are
    # kept unconditionally: the reference applies exclusions while
    # browsing children (Helpers/OpcuaBrowse.cs:80-87,216-223), never to
    # the root itself.
    excl = exclusions.select(
        "conn_id", F.col("folder").alias("display_name")
    ).distinct()
    edges = (
        nodes.filter(F.col("node_class").isin("Object", "Variable"))
        .join(
            F.broadcast(excl.withColumn("_excluded", F.lit(True))),
            ["conn_id", "display_name"],
            "left",
        )
        .filter(F.col("parent_id").isNull() | F.col("_excluded").isNull())
        .drop("_excluded")
        .localCheckpoint(eager=True)
    )

    # The root frontier needs no materialization of its own: it is a plain
    # filter over the already-checkpointed edge blocks, re-evaluated
    # cheaply by each consumer.
    frontier = (
        edges.filter(F.col("parent_id").isNull())
        .select("conn_id", "parent_id", "node_id", "display_name", "node_class")
        .withColumn("depth", F.lit(0))
    )
    result = frontier
    # Per level: ONE BroadcastHashJoin probing the checkpointed (already
    # exclusion-pruned) edge list with the (always-small) frontier key set
    # — zero exchanges per level. Shuffled joins here cost 2 exchanges x
    # depth (the checkpointed frontier has no partitioning metadata, so
    # nothing is co-partitioned) — measured 7.7s -> 2.9s for the whole
    # walk at sf0.1. A frontier too big to broadcast means the graph is
    # bushy-wide, at which point drop this loop for a single shuffled join
    # per level keyed on (conn_id, parent_id) — depth still bounds the
    # iteration count either way.
    #
    # Each level's LAZY localCheckpoint materializes inside the count()
    # that decides termination, so one job per level does both (eager
    # checkpoint + isEmpty was two jobs; at ~0.15s fixed cost per local
    # job that halved the walk's wall time at sf0.1).
    # Visited guard: OPC UA address spaces are reference GRAPHS, not
    # strict trees — a cycle would keep the frontier alive for all
    # max_depth levels and a diamond (multi-parent node) would emit the
    # node once per parent. The guard costs one extra exchange + one
    # broadcast per level, so it is DISPATCHED, not unconditional: if
    # every node has at most one parent edge (one cheap aggregation on
    # the checkpointed edge list), revisits are structurally impossible —
    # a diamond needs two parents, and a 1-parent cycle is a disconnected
    # ring no root can reach — and the walk takes the exchange-free fast
    # path (measured ~2x on tree-shaped data). Multi-parent graphs take
    # the guarded path: per-level child dedup on the node key plus an
    # anti-join against the accumulated visited set, so each node is
    # emitted ONCE at its FIRST (shallowest) depth — standard BFS.
    multi_parent = (
        edges.groupBy("conn_id", "node_id")
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .count()
        > 0
    )
    for _ in range(max_depth):
        fkeys = frontier.select(
            "conn_id", F.col("node_id").alias("parent_id"), "depth"
        )
        children = (
            edges.join(
                F.broadcast(fkeys) if broadcast_frontier else fkeys,
                ["conn_id", "parent_id"],
                "inner",
            )
            .select(
                "conn_id",
                "parent_id",
                "node_id",
                "display_name",
                "node_class",
                (F.col("depth") + 1).alias("depth"),
            )
        )
        if multi_parent:
            visited = result.select("conn_id", "node_id")
            children = children.dropDuplicates(["conn_id", "node_id"]).join(
                F.broadcast(visited) if broadcast_frontier else visited,
                ["conn_id", "node_id"],
                "left_anti",
            )
        children = children.localCheckpoint(eager=False)
        if children.count() == 0:
            break
        result = result.unionByName(children)
        frontier = children
    return result.withColumn("opened", F.col("depth") <= opened_depth)


def jstree_export(tree: DataFrame, conn_id: int) -> list[dict]:
    """S12 — assemble the jsTree-format nested structure for one connection
    (Models/JsTreeExport.cs:36-46; lowercase property naming policy
    Helpers/OpcuaHelperFunctions.cs:13-20).

    Tree assembly is inherently a driver-side O(nodes-of-one-connection)
    step — the reference writes one JSON file per connection; the
    collected slice is the already-pruned browse output, not the raw
    address space.
    """
    rows = (
        tree.filter(F.col("conn_id") == conn_id)
        .select("node_id", "display_name", "node_class", "depth", "opened", "parent_id")
        .collect()
    )
    by_id: dict[str, dict] = {}
    roots: list[dict] = []
    for r in sorted(rows, key=lambda r: (r["depth"], r["node_id"])):
        node = {
            "id": r["node_id"],
            "text": r["display_name"],
            "state": {"opened": bool(r["opened"])},
            "data": {"type": r["node_class"]},
            "children": [],
        }
        by_id[r["node_id"]] = node
        # Only a NULL parent is a root ('' or 0 are legitimate ids); a
        # non-null parent that is absent from the slice is a LOUD error —
        # silently promoting it to a root would emit a wrong hierarchy
        # whenever the caller exports a filtered/depth-capped view.
        if r["parent_id"] is None:
            roots.append(node)
            continue
        parent = by_id.get(r["parent_id"])
        if parent is None:
            raise ValueError(
                f"node {r['node_id']!r} references parent "
                f"{r['parent_id']!r} which is not in the exported slice — "
                "export the full per-connection tree, or filter to a "
                "subtree whose root has parent_id NULL"
            )
        parent["children"].append(node)
    return roots


def jstree_write(
    tree: DataFrame,
    conn_id: int,
    out_dir: str,
    name: str | None = None,
    stale_lock_s: float = 600.0,
) -> str | None:
    """S12 — serialize one connection's assembled jsTree to
    ``<out_dir>/<name>.json`` (Helpers/OpcuaBrowse.cs:156-182,256-264).

    Mirrors the reference's conventions: lowercase property naming
    (OpcuaHelperFunctions.cs:13-20 — jstree_export already emits lowercase
    keys), indented JSON, and the temp-file guard against concurrent jobs
    (:160-171): the writer claims ``<name>.json.tmp`` exclusively, writes,
    then atomically publishes. Returns the final path, or None when
    another job holds the lock.

    Concurrency design (deviation from the reference, which can wedge or
    tear here): the ``.tmp`` file is ONLY a lock marker — content is
    written to a per-writer UNIQUE file and published with one
    ``os.replace`` of that complete file. Consequences, each pinned by
    test: (a) a half-written export can never become visible, no matter
    how lock reclaims interleave — only complete per-writer files are
    ever renamed onto the final path; (b) a stolen lock cannot crash a
    live writer — its publish path doesn't go through the lock file, and
    the lock release tolerates the marker having been reclaimed; (c) a
    lock older than ``stale_lock_s`` is an orphan from a crashed writer
    and is reclaimed via an ATOMIC quarantine rename (exactly one
    recoverer wins; a recoverer that discovers it quarantined a FRESH
    marker — its age check raced another recoverer's reclaim — restores
    it and backs off). Worst-case pathological interleave: two writers
    both publish, each atomically and complete; last one wins.
    """
    import json
    import os
    import threading
    import time

    name = name or f"connection-{conn_id}"
    os.makedirs(out_dir, exist_ok=True)
    lock = os.path.join(out_dir, f"{name}.json.tmp")
    final = os.path.join(out_dir, f"{name}.json")
    token = f"{os.getpid()}.{threading.get_ident()}"

    def _claim() -> bool:
        try:
            os.close(os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
            return True
        except FileExistsError:
            return False

    if not _claim():
        try:
            age = time.time() - os.path.getmtime(lock)
        except FileNotFoundError:
            age = 0.0  # holder just finished; treat as live contention
        if age <= stale_lock_s:
            return None  # concurrent browse job in flight — reference skips
        quarantined = f"{lock}.stale.{token}"
        try:
            os.replace(lock, quarantined)
        except FileNotFoundError:
            return None  # lost the reclaim race to another recoverer
        # Our age check predates the replace — another recoverer may have
        # reclaimed AND re-created the marker in between, so re-check on
        # the quarantined inode: fresh means we stole a live writer's
        # marker — put it back (same inode) and back off.
        try:
            fresh = time.time() - os.path.getmtime(quarantined) <= stale_lock_s
        except FileNotFoundError:
            return None
        if fresh:
            try:
                os.replace(quarantined, lock)
            except OSError:
                pass
            return None
        try:
            os.unlink(quarantined)  # confirmed-stale debris is ours to drop
        except FileNotFoundError:
            pass
        if not _claim():
            return None  # a fresh writer claimed between our steps

    content = os.path.join(out_dir, f"{name}.json.{token}.content")
    try:
        with open(content, "w") as f:
            json.dump(jstree_export(tree, conn_id), f, indent=2)
        os.replace(content, final)  # our own complete file — atomic publish
    finally:
        for leftover in (content, lock):
            try:
                os.unlink(leftover)
            except FileNotFoundError:
                pass  # content published; lock possibly reclaimed — fine
    return final


class BrowseJobRegistry:
    """B5 — driver-side async browse-job bookkeeping
    (Services/BrowseService.cs:14,25-41: ``Task.Run`` per connection +
    ``ConcurrentDictionary<connection, bool>`` job status).

    Jobs are one-per-connection: ``start`` refuses while a job for that
    connection is running (the reference's status flag gate). Driver-side
    by design — job orchestration is control plane, not data plane.
    """

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self._jobs: dict[int, dict] = {}

    def start(self, conn_id: int, fn) -> bool:
        """Launch ``fn()`` for ``conn_id`` on a worker thread. Returns
        False when a job for this connection is already running."""
        import threading

        with self._lock:
            job = self._jobs.get(conn_id)
            if job and job["status"] == "running":
                return False
            self._jobs[conn_id] = {"status": "running", "result": None}

        def run():
            try:
                res = fn()
                with self._lock:
                    self._jobs[conn_id] = {"status": "done", "result": res}
            except Exception as e:  # noqa: BLE001 — status surface, not handling
                with self._lock:
                    self._jobs[conn_id] = {"status": "failed", "result": repr(e)}

        t = threading.Thread(target=run, daemon=True)
        with self._lock:
            self._jobs[conn_id]["thread"] = t
        t.start()
        return True

    def status(self, conn_id: int) -> str:
        with self._lock:
            job = self._jobs.get(conn_id)
            return job["status"] if job else "unknown"

    def join(self, conn_id: int, timeout: float = 60.0) -> str:
        with self._lock:
            t = self._jobs.get(conn_id, {}).get("thread")
        if t is not None:
            t.join(timeout)
        return self.status(conn_id)
