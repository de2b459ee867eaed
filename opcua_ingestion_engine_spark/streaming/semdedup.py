"""Streaming-incremental SemDeDup (E2, deployment form — round 11).

``operators/similarity.semantic_dedup`` is the one-shot batch operator
(Abbas et al. 2023: cluster the corpus with k-means, generate candidate
pairs only within cells, keep one member per cosine>=eps component). A
continuously ingesting pipeline instead needs per-batch redundancy
decisions WITHOUT re-clustering the corpus. This sink maintains exactly
that, composing the same three layers as the maintained ANN index
(``streaming/annindex.py``):

- **Frozen quantizer**: the coarse k-means centroids train ONCE on the
  first non-empty batch's bounded hash-sample and are persisted with a
  create-exclusive link (one trainer wins; every writer assigns with
  the SAME matrix). Cell assignment is then per-row deterministic, so
  the maintained state is independent of batch arrival order — the
  property the equality pin rests on.
- **Candidate generation is incremental and bucketed**: a new batch
  joins ONLY its cell-mates (existing + in-batch), one bounded-fan-out
  shuffle per batch, never all-pairs. Every within-cell pair is
  generated exactly once across the batch sequence (new-vs-existing at
  the new side's arrival; new-vs-new ordered by id), so the accumulated
  pair table EQUALS the one-shot candidate stage over the final corpus
  under the same frozen centroids.
- **The versioned-table layer** carries the state: ``codes`` (vid,
  unit vector, cell, centroid cosine) and ``pairs`` (vec_a, vec_b) as
  append-structured tables with the batch_id ledger in the codes
  manifests — restart recovery, exactly-once redelivery, multi-writer
  CAS. Pairs commit BEFORE codes (the durability point), so a crash
  between them re-appends the same deterministic pairs on redelivery —
  duplicate edges are harmless to connected components and deduped at
  serve time.

Equality contract (pinned by pytest under arbitrary batch splits):
``survivors()`` == ``semantic_dedup(corpus, centroids=frozen)`` for
both keep rules. The one-shot ``max_cell`` truncation is ORDER-
dependent, so the maintained form refuses instead of truncating: a
cell exceeding ``max_cell`` raises (the same "no silent caps"
discipline — that big a cell means n_cells is undersized).

**Quantizer rebuild (round 12)**: overflow and distribution drift are
an OPERATION, not an outage — ``rebuild()`` re-trains n_cells from the
accumulated codes, re-buckets in one scan, recomputes the within-cell
pair graph, and publishes both as generation-stamped replace commits
(codes last = the atomic switch; an interrupted rebuild leaves a
detectable generation split every ingest/serve path refuses on until
rebuild() is re-run — it is idempotent). ``auto_rebuild=True`` runs it
automatically when a batch overflows a cell; the default keeps the
explicit refusal so the operator chooses the maintenance window.
Equality with the one-shot form under the NEW quantizer is pinned x3
seeds in tests/test_semdedup_rebuild.py.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..operators import similarity as S
from ..operators import tablefmt as TF


def _centroid_path(root: str, gen: int = 0) -> str:
    # gen 0 keeps the round-11 name so existing states load unchanged
    if gen == 0:
        return os.path.join(root, "centroids.npz")
    return os.path.join(root, f"centroids.g{gen}.npz")


def _load_centroids(root: str, gen: int = 0) -> "np.ndarray":
    with np.load(_centroid_path(root, gen)) as z:
        return z["cent"]


def _quant_gen(root: str) -> int:
    """The quantizer GENERATION a table's state was built under: the
    ``quant_gen`` of the highest-version manifest carrying one (rebuild
    commits stamp it), else 0 (the frozen first-batch quantizer era)."""
    gen = 0
    for man in TF.history(root):  # oldest first
        g = man.get("app", {}).get("quant_gen")
        if g is not None:
            gen = g
    return gen


class IncrementalSemDeDupSink:
    """foreachBatch sink: feed micro-batches of (id, vector) rows via
    ``process_batch``; read per-batch / corpus-level redundancy from
    the maintained state via ``pairs``/``survivors``."""

    def __init__(
        self,
        root: str,
        eps: float = 0.45,
        n_cells: int = 16,
        lloyd_iters: int = 8,
        max_cell: int = 4000,
        train_sample: "int | None" = S.DEFAULT_TRAIN_SAMPLE,
        centroids: "np.ndarray | None" = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        auto_compact: "int | None" = 64,
        auto_rebuild: bool = False,
    ):
        self.root = root
        self.codes_root = os.path.join(root, "codes")
        self.pairs_root = os.path.join(root, "pairs")
        self.eps = float(eps)
        self.n_cells = n_cells
        self.lloyd_iters = lloyd_iters
        self.max_cell = max_cell
        self.train_sample = train_sample
        self.id_col = id_col
        self.vec_col = vec_col
        self.auto_compact = auto_compact
        self.auto_rebuild = auto_rebuild
        self._cent = centroids
        # restart recovery: adopt the persisted quantizer GENERATION
        # (0 = the frozen first-batch quantizer; >0 = a rebuild) and
        # the codes manifests' batch_id ledger, so a replayed batch
        # after a restart is skipped exactly like an in-process
        # redelivery
        self._gen = _quant_gen(self.codes_root)
        if os.path.exists(_centroid_path(root, self._gen)):
            self._cent = _load_centroids(root, self._gen)
        self._committed_batch_ids: set = {
            man["app"]["batch_id"]
            for man in TF.history(self.codes_root)
            if "batch_id" in man.get("app", {})
        }
        # per-cell member counts, maintained driver-side (n_cells-sized)
        # so the max_cell audit is O(batch) per ingest instead of an
        # O(corpus) groupBy per batch; rebuilt in one scan on restart
        self._cell_counts: "dict | None" = None

    # -- quantizer lifecycle ------------------------------------------

    def centroids(self) -> "np.ndarray | None":
        """The frozen coarse quantizer (None before the first non-empty
        batch) — pass to ``semantic_dedup(..., centroids=)`` for the
        one-shot equality oracle."""
        return self._cent

    def _ensure_centroids(self, batch: DataFrame) -> None:
        if self._cent is not None:
            self._persist_centroids()
            return
        cent = S._centroid_matrix(
            batch, self.n_cells, self.lloyd_iters,
            self.id_col, self.vec_col, train_sample=self.train_sample,
        )
        if cent is None:
            return  # empty first batch — train on the next non-empty one
        self._cent = cent
        self._persist_centroids()

    def _persist_centroids(self, gen: "int | None" = None) -> None:
        gen = self._gen if gen is None else gen
        final = _centroid_path(self.root, gen)
        if os.path.exists(final):
            self._cent = _load_centroids(self.root, gen)
            return
        os.makedirs(self.root, exist_ok=True)
        tmp = f"{final}.{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "wb") as f:
            np.savez(f, cent=self._cent)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)  # CAS: exactly one trainer publishes
        except FileExistsError:
            self._cent = _load_centroids(self.root, gen)
        os.unlink(tmp)

    def _check_rebuild_coherence(self) -> None:
        """Codes and pairs must carry the SAME quantizer generation —
        a crash between a rebuild's two replace commits leaves them
        split, and serving or ingesting across that split would mix
        cell spaces. Typed refusal; ``rebuild()`` is idempotent and
        restores the invariant."""
        pg = _quant_gen(self.pairs_root)
        cg = _quant_gen(self.codes_root)
        if pg != cg and TF.latest_version(self.pairs_root) is not None:
            raise ValueError(
                f"incremental SemDeDup at {self.root}: interrupted "
                f"quantizer rebuild (pairs at generation {pg}, codes "
                f"at {cg}) — re-run rebuild() to complete it"
            )

    # -- ingest --------------------------------------------------------

    def process_batch(self, vectors: DataFrame, batch_id: int) -> None:
        if batch_id in self._committed_batch_ids:
            return  # foreachBatch redelivery of a committed batch
        self._check_rebuild_coherence()
        spark = vectors.sparkSession
        vectors = vectors.dropDuplicates([self.id_col])
        self._ensure_centroids(vectors)
        if self._cent is None:
            return  # still no quantizer => batch was empty
        new = S._cell_assignment(
            vectors, self._cent, self.id_col, self.vec_col
        )
        # an id seen in a PRIOR commit is a source-level at-least-once
        # duplicate: DROP it (ids never re-cluster — same discipline as
        # the ANN sink's append mode)
        have_codes = TF.latest_version(self.codes_root) is not None
        if have_codes:
            new = new.join(
                TF.read_version(spark, self.codes_root).select("vid"),
                "vid", "left_anti",
            )
        # LAZY checkpoint (round 13): the per-cell count collect right
        # below materializes the assignment + anti-join inside its own
        # job; every later consumer (pair join sides, the codes commit)
        # reuses the cached partitions — the separate eager
        # materialization action per batch is gone (guide §5).
        new = new.localCheckpoint(eager=False)
        # one action instead of two (round 12): the per-cell counts the
        # max_cell audit needs below also answer the emptiness check
        # the separate limit(1).count() used to
        batch_cells = {
            r["cell"]: int(r["n"])
            for r in new.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        if not batch_cells:
            # nothing novel: still record the batch_id for exact-once
            self._commit_codes(spark, new, batch_id)
            return

        # candidate pairs: new-vs-(existing + new) cell-mates, each pair
        # exactly once (existing partners pair unconditionally — they
        # never re-enter as the new side; in-batch partners order by id)
        sides = new.select(
            "vid", "uvec", "cell", F.lit(True).alias("_is_new")
        )
        if have_codes:
            sides = sides.unionByName(
                TF.read_version(spark, self.codes_root).select(
                    "vid", "uvec", "cell", F.lit(False).alias("_is_new")
                )
            )
        x = new.select(
            F.col("vid").alias("_xa"), F.col("uvec").alias("_ua"), "cell"
        )
        y = sides.select(
            F.col("vid").alias("_xb"), F.col("uvec").alias("_ub"),
            "cell", "_is_new",
        )
        new_pairs = (
            x.join(y, "cell")
            .filter(
                (~F.col("_is_new") & (F.col("_xb") != F.col("_xa")))
                | (F.col("_is_new") & (F.col("_xb") > F.col("_xa")))
            )
            .filter(S._dot(F.col("_ua"), F.col("_ub")) >= F.lit(self.eps))
            .select(
                F.least("_xa", "_xb").alias("vec_a"),
                F.greatest("_xa", "_xb").alias("vec_b"),
            )
            # LAZY + full count (round 13): ONE action materializes the
            # cell join into the checkpoint cache AND answers the
            # emptiness gate — the eager checkpoint + limit(1).count()
            # pair it replaces cost two
            .localCheckpoint(eager=False)
        )
        # pairs FIRST, codes last (codes carry the batch_id ledger): a
        # crash in between re-appends the same deterministic pairs on
        # redelivery — duplicate edges are deduped at serve time
        if new_pairs.count() > 0:
            TF.commit_append(
                new_pairs, self.pairs_root, app={"batch_id": batch_id}
            )
            TF.maybe_compact(spark, self.pairs_root, self.auto_compact)
        self._commit_codes(spark, new.select("vid", "uvec", "cell", "cent_sim"), batch_id)

        # no silent caps: the one-shot form truncates oversized cells
        # (order-dependent), so the maintained form REFUSES instead.
        # The audit is O(batch): the driver-side per-cell counter folds
        # this batch's (cell, count) rows (n_cells-sized state; restart
        # pays ONE rebuild scan, not one per batch).
        if self._cell_counts is None:
            if have_codes:
                # restart over prior on-disk state: ONE rebuild scan
                # (runs post-commit, so it already includes this batch)
                self._cell_counts = {
                    r["cell"]: int(r["n"])
                    for r in TF.read_version(spark, self.codes_root)
                    .groupBy("cell")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                }
            else:
                # fresh table: the committed codes ARE this batch — the
                # counts collected above, no scan needed (round 12)
                self._cell_counts = dict(batch_cells)
        else:
            for c, n in batch_cells.items():
                self._cell_counts[c] = self._cell_counts.get(c, 0) + n
        big = [
            (c, n) for c, n in self._cell_counts.items() if n > self.max_cell
        ]
        if big:
            # the batch itself committed; serving stays exact either way
            if self.auto_rebuild:
                self.rebuild(spark)
                return
            c, n = big[0]
            raise ValueError(
                f"incremental SemDeDup cell {c} exceeds "
                f"max_cell={self.max_cell} ({n} members) — n_cells is "
                "undersized for the corpus; call rebuild() (or build "
                "the sink with auto_rebuild=True) to re-train the "
                "quantizer and re-bucket in one maintenance pass "
                "(the batch itself committed; serving stays exact)"
            )

    # -- quantizer rebuild (round 12) ---------------------------------

    def rebuild(self, spark: SparkSession, n_cells: "int | None" = None) -> int:
        """Re-train the coarse quantizer from the ACCUMULATED corpus
        and re-bucket in one maintenance pass (the round-11 verdict's
        overflow-escalation path — at 100 TB under distribution drift
        a frozen undersized quantizer is an outage, not an operation):

        1. train ``n_cells`` new centroids from the codes table
           (default: double the current count, floored at the one-shot
           auto-sizing ``corpus / SEMDEDUP_TARGET_CELL_SIZE``) and
           publish them as generation ``gen+1`` via the same
           create-exclusive CAS (a crashed predecessor's file is
           adopted, so re-running is idempotent);
        2. re-assign every vector (one scan, one Arrow matmul pass)
           and RECOMPUTE the within-cell pair graph under the new
           cells (one bounded shuffle — carrying the old graph would
           keep edges that cross new cell boundaries and break the
           incremental == one-shot equality);
        3. replace pairs FIRST, codes LAST — both stamped with the new
           generation. The codes commit is the atomic switch; a crash
           in between leaves a detectable split that every
           ingest/serve path refuses on (``_check_rebuild_coherence``)
           until rebuild() is re-run.

        The batch_id ledger survives (replace commits keep history).
        Returns the new generation. Mid-batch overflow still REFUSES —
        rebuild is a between-batches maintenance commit, never a
        silent mid-ingest truncation."""
        if TF.latest_version(self.codes_root) is None:
            raise ValueError("nothing to rebuild: no codes committed yet")
        codes = TF.read_version(spark, self.codes_root)
        if n_cells is None:
            n = codes.count()
            # double, but never below the one-shot auto-sizing NOR below
            # 4x the count the max_cell bound implies — k-means does not
            # balance cells, so the bound needs headroom to hold
            n_cells = max(
                self.n_cells * 2,
                n // S.SEMDEDUP_TARGET_CELL_SIZE + 1,
                (4 * n) // max(self.max_cell, 1) + 1,
            )
        new_gen = self._gen + 1
        if os.path.exists(_centroid_path(self.root, new_gen)):
            # a crashed rebuild already published this generation's
            # quantizer — adopt it (any frozen matrix is valid as long
            # as codes+pairs are computed under it)
            cent = _load_centroids(self.root, new_gen)
        else:
            cent = S._centroid_matrix(
                codes, n_cells, self.lloyd_iters, "vid", "uvec",
                train_sample=self.train_sample,
            )
            # publish via the CAS without touching self._cent until the
            # switch commit lands (a failure below must leave the
            # in-memory state at the OLD coherent generation)
            prev = self._cent
            self._cent = cent
            self._persist_centroids(new_gen)
            cent = self._cent  # CAS loser adopts the winner's matrix
            self._cent = prev
        new_codes = S._cell_assignment(
            codes, cent, "vid", "uvec"
        ).localCheckpoint(eager=True)
        x = new_codes.select(
            F.col("vid").alias("_xa"), F.col("uvec").alias("_ua"), "cell"
        )
        y = new_codes.select(
            F.col("vid").alias("_xb"), F.col("uvec").alias("_ub"), "cell"
        )
        new_pairs = (
            x.join(y, "cell")
            .filter(F.col("_xb") > F.col("_xa"))
            .filter(S._dot(F.col("_ua"), F.col("_ub")) >= F.lit(self.eps))
            .select(
                F.col("_xa").alias("vec_a"), F.col("_xb").alias("vec_b")
            )
        )
        TF.commit_version(
            new_pairs, self.pairs_root, app={"quant_gen": new_gen}
        )
        TF.commit_version(
            new_codes, self.codes_root, app={"quant_gen": new_gen}
        )
        self._gen = new_gen
        self._cent = cent
        self.n_cells = int(cent.shape[0])
        self._cell_counts = {
            r["cell"]: int(r["n"])
            for r in new_codes.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        still = [
            (c, n_) for c, n_ in self._cell_counts.items()
            if n_ > self.max_cell
        ]
        if still:
            c, n_ = still[0]
            raise ValueError(
                f"rebuild left cell {c} with {n_} members > "
                f"max_cell={self.max_cell} — the corpus concentrates "
                "past what k-means separates at this n_cells; re-run "
                "rebuild() with an explicit larger n_cells or raise "
                "max_cell (state is coherent; serving stays exact)"
            )
        return new_gen

    def _commit_codes(self, spark, codes: DataFrame, batch_id: int) -> None:
        TF.commit_append(codes, self.codes_root, app={"batch_id": batch_id})
        self._committed_batch_ids.add(batch_id)
        TF.maybe_compact(spark, self.codes_root, self.auto_compact)

    # -- serve -----------------------------------------------------------

    def pairs(self, spark: SparkSession) -> DataFrame:
        """The accumulated cosine>=eps within-cell pair graph (deduped;
        equals the one-shot candidate stage under the frozen
        centroids)."""
        if TF.latest_version(self.pairs_root) is None:
            return spark.createDataFrame([], "vec_a long, vec_b long")
        self._check_rebuild_coherence()
        return TF.read_version(spark, self.pairs_root).distinct()

    def survivors(self, spark: SparkSession, keep: str = "min_id") -> DataFrame:
        """Ids that SURVIVE dedup over the corpus ingested so far —
        equal to ``semantic_dedup(corpus, centroids=frozen,
        keep=...)``'s surviving id set, whatever the batch split."""
        from ..operators.graph import connected_components

        if keep not in ("centroid_far", "min_id"):
            raise ValueError(f"unknown keep rule {keep!r}")
        if TF.latest_version(self.codes_root) is None:
            return spark.createDataFrame([], "vid long")
        codes = TF.read_version(spark, self.codes_root)
        comp = connected_components(self.pairs(spark), "vec_a", "vec_b")
        if keep == "min_id":
            dropped = comp.filter(F.col("node") != F.col("component"))
        else:
            sims = codes.select(F.col("vid").alias("node"), "cent_sim")
            w = W.partitionBy("component").orderBy(
                F.col("cent_sim").asc(), F.col("node").asc()
            )
            dropped = (
                comp.join(sims, "node")
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") > 1)
            )
        return codes.select("vid").join(
            dropped.select(F.col("node").alias("vid")), "vid", "left_anti"
        )
