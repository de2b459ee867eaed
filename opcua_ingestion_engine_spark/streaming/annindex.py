"""Streaming-incremental ANN index maintenance (E3, deployment form).

``ivfpq_write_index`` builds an index in one shot; a continuously
ingesting pipeline instead APPENDS vectors as they arrive. This sink
maintains a serveable IVF-PQ index across micro-batches by composing
three existing layers:

- quantizer training (``operators/similarity``): trained ONCE on the
  first batch's bounded hash-sample and then FROZEN — the standard
  IVF-PQ operating discipline (FAISS trains once and re-trains only by
  offline rebuild; retraining per batch would re-encode the whole
  corpus and make old codes incomparable). The frozen tensors are
  persisted next to the index with a create-exclusive link, so exactly
  one trainer wins and every writer encodes with the SAME quantizers —
  a CAS loser discards its tensors and adopts the winner's.
- encoding (``ivfpq_encode``): per-row deterministic given the frozen
  quantizers, so the incrementally-built codes table equals the
  one-shot build over the same corpus (pinned by pytest).
- the versioned-table layer (``operators/tablefmt``): every batch lands
  as a manifest-CAS commit of (current codes \\ re-ingested ids) ∪ new
  codes — ids UPSERT rather than duplicate. This buys restart recovery
  (a fresh sink resumes from the committed snapshot and re-loads which
  batch_ids landed), exact-once redelivery (a replayed batch_id is
  skipped), multi-writer safety (CAS rebase, not lost update), and time
  travel (searches can be served from any retained index version).

Scale shape: per batch, ONE encode pass over the batch plus a
codes-sized merge (the rewrite cost of plain-parquet versioning; a
file-level table format would make it an append — documented trade).
Searches read the committed codes table and never re-encode the corpus.

Quantizer staleness is real and documented: if the vector distribution
drifts far from the first batch, recall decays and the answer is an
offline rebuild (``ivfpq_write_index``) plus a pointer swap — the same
operational playbook as every IVF deployment.
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import tablefmt as TF
from ..operators import similarity as S


def _quantizer_path(index_root: str) -> str:
    return os.path.join(index_root, "quantizers.npz")


def _load_quantizers(index_root: str):
    with np.load(_quantizer_path(index_root)) as z:
        return z["cent"], z["books"]


def ann_index_search(
    spark: SparkSession,
    index_root: str,
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 8,
    rerank: int = 20,
    version: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    filter_col: "str | None" = None,
) -> DataFrame:
    """Serve a search from a maintained index — any process, no sink
    instance needed. ``vectors`` supplies the true vectors for the exact
    rerank only (candidate-sized read); ``version`` time-travels to an
    earlier committed index state (the rerank still reads CURRENT
    vectors — pass a matching vector snapshot if ids were re-ingested
    with new values since that version). ``filter_col`` serves FILTERED
    search (tenant/domain restriction — the production serving shape):
    the sink must have been built with ``carry_cols=[filter_col]`` so
    the label rides on the codes rows and is pruned inside the ADC
    scan, same contract as ``ivfpq_topk_from_index``."""
    cent, books = _load_quantizers(index_root)
    codes = TF.read_version(spark, os.path.join(index_root, "codes"), version)
    return S.ivfpq_search(
        codes, cent, books, vectors, queries, k, nprobe, rerank,
        id_col, vec_col, filter_col,
    )


class IncrementalAnnIndexSink:
    """foreachBatch sink: feed micro-batches of (id, vector) rows via
    ``process_batch``; serve searches from the committed index via
    ``search`` (or module-level ``ann_index_search``)."""

    def __init__(
        self,
        index_root: str,
        n_cells: int = 16,
        m: int = 8,
        ksub: int = 32,
        lloyd_iters: int = 2,
        train_sample: "int | None" = S.DEFAULT_TRAIN_SAMPLE,
        quantizers=None,
        mode: str = "upsert",
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        auto_compact: int | None = 64,
        carry_cols: "list[str] | None" = None,
    ):
        if mode not in ("upsert", "append"):
            raise ValueError(f"mode must be 'upsert' or 'append', got {mode!r}")
        self.mode = mode
        self.auto_compact = auto_compact
        # label/tenant columns carried onto every committed codes row so
        # the maintained index serves FILTERED search (filter pruned
        # inside the ADC codes scan, never a post-filter) — the batch
        # build's ivfpq_write_index(carry_cols=...) contract, kept
        # identical here so incremental == one-shot INCLUDING labels
        self.carry_cols = list(carry_cols or [])
        self.index_root = index_root
        self.codes_root = os.path.join(index_root, "codes")
        self.geometry = dict(
            n_cells=n_cells, m=m, ksub=ksub, lloyd_iters=lloyd_iters,
            train_sample=train_sample,
        )
        self.id_col = id_col
        self.vec_col = vec_col
        self._cent, self._books = quantizers if quantizers else (None, None)
        self.batches_seen = 0
        # restart recovery: adopt the persisted quantizers and re-load
        # which batch_ids already committed, so a replayed batch after a
        # restart is skipped exactly like an in-process redelivery
        if os.path.exists(_quantizer_path(index_root)):
            self._cent, self._books = _load_quantizers(index_root)
        self._committed_batch_ids: set[int] = {
            man["app"]["batch_id"]
            for man in TF.history(self.codes_root)
            if "batch_id" in man.get("app", {})
        }

    # -- quantizer lifecycle -------------------------------------------------

    def _ensure_quantizers(self, batch: DataFrame) -> None:
        if self._cent is not None:
            self._persist_quantizers()  # caller-provided tensors: publish
            return
        cent = S._centroid_matrix(
            batch, self.geometry["n_cells"], self.geometry["lloyd_iters"],
            self.id_col, self.vec_col,
            train_sample=self.geometry["train_sample"],
        )
        if cent is None:
            return  # empty first batch — train on the next non-empty one
        # residuals of the training batch seed the PQ codebooks, same
        # construction as ivfpq_train_encode
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<double>")
        def resid(vecs: pd.Series) -> pd.Series:
            v = S._unit_rows(np.vstack(vecs.to_numpy()).astype(np.float64))
            cells = np.argmax(v @ cent.T, axis=1)
            return pd.Series(list(v - cent[cells]))

        resid_df = batch.select(
            F.col(self.id_col).alias("_rid"), resid(F.col(self.vec_col)).alias("r")
        )
        books = S._pq_codebooks(
            resid_df, self.geometry["m"], self.geometry["ksub"],
            self.geometry["lloyd_iters"], id_col="_rid", vec_col="r",
            normalize=False, train_sample=self.geometry["train_sample"],
        )
        self._cent, self._books = cent, books
        self._persist_quantizers()

    def _persist_quantizers(self) -> None:
        final = _quantizer_path(self.index_root)
        if os.path.exists(final):
            # another writer (or a prior run) already published — adopt
            # THEIRS so every code in the table shares one quantizer set
            self._cent, self._books = _load_quantizers(self.index_root)
            return
        os.makedirs(self.index_root, exist_ok=True)
        tmp = f"{final}.{uuid.uuid4().hex[:8]}.tmp"
        with open(tmp, "wb") as f:
            np.savez(f, cent=self._cent, books=self._books)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)  # CAS: exactly one trainer publishes
        except FileExistsError:
            self._cent, self._books = _load_quantizers(self.index_root)
        os.unlink(tmp)

    # -- ingest ---------------------------------------------------------------

    def process_batch(self, vectors: DataFrame, batch_id: int) -> None:
        if batch_id in self._committed_batch_ids:
            return  # foreachBatch redelivery of a committed batch
        vectors = vectors.dropDuplicates([self.id_col])
        self._ensure_quantizers(vectors)
        if self._cent is None:
            return  # still no quantizers => batch was empty
        # upsert mode stays EAGER: commit_merge re-runs the merge on a
        # CAS rebase, and the encode must not be re-derived there.
        # Append mode checkpoints LAZILY (round 12): the single consumer
        # is the commit write, so materialization fuses into the write
        # job (one Spark action per batch instead of three) while a CAS
        # retry still reuses the cached partitions. Exactly ONE lazy
        # checkpoint sits on the append path — when the seen-guard
        # anti-join applies, the checkpoint wraps the anti-join output,
        # not the pre-join encode (a stacked inner checkpoint would hold
        # a dead copy of the un-deduped codes for the session's
        # lifetime — round-12 ADVICE).
        codes = S.ivfpq_encode(
            vectors, self._cent, self._books, self.id_col, self.vec_col,
            self.carry_cols,
        )
        if self.mode != "append":
            codes = codes.localCheckpoint(eager=True)
        spark = vectors.sparkSession

        if self.mode == "append":
            # Append-structured commits: O(batch) write amplification via
            # tablefmt.commit_append instead of the upsert's full-table
            # rewrite. An id seen in a PRIOR commit is a source-level
            # at-least-once duplicate and is DROPPED (the same discipline
            # as the other sinks' seen-guards) — appends never shadow; a
            # deployment that re-ingests ids with new vectors runs upsert
            # mode (or an offline rebuild).
            if TF.latest_version(self.codes_root) is not None:
                current_ids = TF.read_version(spark, self.codes_root).select(
                    "neighbor_id"
                )
                codes = codes.join(
                    current_ids, "neighbor_id", "left_anti"
                )
            codes = codes.localCheckpoint(eager=False)
            TF.commit_append(
                codes, self.codes_root, app={"batch_id": batch_id}
            )
            self._committed_batch_ids.add(batch_id)
            self.batches_seen += 1
            # maintenance after the durability point; never vacuums, so
            # the manifests' batch_id ledger survives for recovery
            TF.maybe_compact(spark, self.codes_root, self.auto_compact)
            return
        else:
            def upsert(current: DataFrame | None) -> DataFrame:
                if current is None:
                    return codes
                return current.join(
                    codes.select("neighbor_id"), "neighbor_id", "left_anti"
                ).unionByName(codes)

            TF.commit_merge(
                spark, self.codes_root, upsert,
                app={"batch_id": batch_id},
            )
        self._committed_batch_ids.add(batch_id)
        self.batches_seen += 1

    # -- maintenance -----------------------------------------------------------

    def vacuum(self, keep: int = 2, orphan_grace_s: float = 3600.0) -> list[int]:
        """Reclaim old index versions (and crashed-commit orphans) via
        the table layer's vacuum — the codes table otherwise grows one
        full snapshot per batch (the rewrite cost of plain-parquet
        versioning). Keeps the newest ``keep`` versions; time travel to
        a vacuumed version raises, the live snapshot is never touched."""
        return TF.vacuum(self.codes_root, keep, orphan_grace_s)

    # -- serve ----------------------------------------------------------------

    def search(
        self,
        vectors: DataFrame,
        queries: DataFrame,
        k: int = 5,
        nprobe: int = 8,
        rerank: int = 20,
        version: int | None = None,
        filter_col: "str | None" = None,
    ) -> DataFrame:
        return ann_index_search(
            vectors.sparkSession, self.index_root, vectors, queries,
            k, nprobe, rerank, version, self.id_col, self.vec_col,
            filter_col,
        )


def ann_index_forget(spark: SparkSession, index_root: str, ids) -> None:
    """Remove vectors from the maintained ANN index without a rebuild —
    one merge-on-read delete on the codes table (O(deleted rows)
    sidecar, zero directory rewrites). Every serve path reads the codes
    through ``read_version``, which subtracts the vectors at scan time,
    so forgotten ids can never appear as candidates (and therefore
    never in results — the exact rerank only sees candidates). The
    codes maintenance cadence (compaction) folds the vectors away
    later. Forgetting an id re-opens it for append-mode ingestion (the
    seen-guard reads the live codes table)."""
    from .bm25index import _in_condition

    cond = _in_condition("neighbor_id", ids)
    TF.delete_where_dv(spark, os.path.join(index_root, "codes"), cond)
