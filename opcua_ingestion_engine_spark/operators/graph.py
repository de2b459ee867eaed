"""[EXT] Iterative graph operators: connected components over the
near-dup pair graph.

LLM curation pipelines cluster near-duplicate PAIRS into components and
keep one representative per component (pair-local greedy rules — like
``curate.curate_corpus``'s drop-if-linked-to-smaller-id — can drop both
endpoints of a chain's middle links). Connected components is the
textbook Spark iterative algorithm: no built-in DataFrame primitive
exists, and the naive self-join recursion doubles the plan per round —
the implementation below follows the same discipline as the browse BFS
(``operators/browse.py``): checkpoint per iteration to keep plans
linear, converge on a count that materializes the iteration's frame
anyway.

Algorithm: min-label propagation. Every node starts labeled with
itself; each round every node takes the min label in its closed
neighborhood. Rounds needed = graph diameter (near-dup components are
shallow — chains of borderline-similar docs — so typically <= ~5);
each round is one shuffle keyed on node id. For adversarial diameters
the alternating large-star/small-star algorithm halves path lengths
per round (O(log n) rounds); the loop structure here is the same, only
the neighbor rule changes — not needed for dedup-shaped graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_CC_ITERATIONS = 50  # safety bound; rounds used = component diameter


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = MAX_CC_ITERATIONS,
) -> DataFrame:
    """Label every node of the undirected pair graph with the minimum node
    id of its connected component. Returns (node, component).

    Only nodes that appear in some pair are returned — callers treat
    absent docs as singleton components (their own id), which is the
    identity and needs no computation.

    Per iteration: ONE groupBy shuffle on node id (the symmetric edge
    list is built once, checkpointed, and re-probed each round with the
    current labels via a broadcast-eligible join on src). Convergence is
    detected by counting label changes — the count materializes the
    round's lazily-checkpointed label frame, so each round is one job
    (same fusion trick as the browse BFS termination count).
    """
    # Symmetric OPEN-neighborhood edge list, built once: (u,v) and
    # (v,u). Self-loops are redundant (round 12 — they doubled the
    # distinct/shuffle input): every endpoint has >= 1 real neighbor,
    # so it survives the propagation join, and its OWN label is folded
    # back in by the F.least in the init and in every merge below.
    # Both init checkpoints are LAZY (round 13, guide §5): round 1's
    # convergence count materializes labels (and, through the propagate
    # join, sym) inside its own job — the loop always runs at least one
    # round, so nothing pays a separate materialization action; later
    # rounds hit the cached partitions.
    fwd = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = (
        fwd.unionByName(fwd.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        # round 1 for free: min over the closed neighborhood = least of
        # the node's own id and its open-neighborhood min
        sym.groupBy("u")
        .agg(F.least(F.min("v"), F.col("u")).alias("lbl"))
        .localCheckpoint(eager=False)
    )
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    for _ in range(max_iter):
        # propagate: node u's new label = min over its closed
        # neighborhood's labels. The node's OWN label rides the same
        # groupBy as a tagged self-row (exactly one per node), so the
        # round needs ONE join + ONE shuffle — the old separate
        # labels-vs-new merge join per round is folded away (round 13,
        # guide §2.4); the change flag falls out of the same aggregate
        # (old label = the self-row's, new = the min).
        prop = sym.join(
            labels.select(F.col("u").alias("v"), F.col("lbl")), "v"
        ).select("u", "lbl", F.lit(None).cast("long").alias("_self"))
        own = labels.select("u", "lbl", F.col("lbl").alias("_self"))
        merged = (
            prop.unionByName(own)
            .groupBy("u")
            .agg(
                F.min("lbl").alias("lbl"),
                (F.min("lbl") < F.max("_self")).cast("long").alias("_chg"),
            )
            .localCheckpoint(eager=False)
        )
        changed = merged.agg(F.sum("_chg")).collect()[0][0] or 0
        labels = merged.drop("_chg")
        if changed == 0:
            break
    else:
        # A component with diameter > max_iter would silently split into
        # several components, corrupting downstream cluster-dedup — fail
        # loudly instead of returning partially-propagated labels.
        raise RuntimeError(
            f"connected_components did not converge within max_iter={max_iter} "
            f"rounds ({changed} labels still changing); raise max_iter — "
            f"rounds needed grow with component diameter, not data size"
        )
    return labels.select(F.col("u").alias("node"), F.col("lbl").alias("component"))
