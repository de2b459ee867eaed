"""Streaming model-quality gating (E4 trainable gate, streaming twin).

A curation pipeline wants the model-based quality cut applied AS
DOCUMENTS ARRIVE, not in a post-hoc sweep. The classifier is FROZEN for
the life of the stream (exactly the decontamination sink's frozen-
reference discipline — retraining mid-stream would make early and late
batches incomparable; a new model is a new stream + backfill): either a
frozen-vocab export served as the pure-JVM decimal fold
(``quality.score_quality_vocab``) or a hashed ``QualityModel`` served
by the vectorized Arrow kernel (``quality.score_quality``).

Because each document's verdict depends only on (doc, frozen model) —
no doc-vs-doc state — the union of per-batch survivors equals the batch
gate over the union under ANY batch split (pinned in tests). The only
cross-batch state is durability: every batch's kept rows (with their
scores) land as a ``tablefmt.commit_append`` carrying the batch_id, so
a restarted sink recovers its redelivery ledger from the manifests and
the gated corpus is a versioned, time-travelable table downstream
stages read with ``read_version`` — O(batch) write amplification,
``maybe_compact`` keeping the directory list bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import tablefmt as TF
from ..operators.quality import (
    QualityModel,
    score_quality,
    score_quality_vocab,
)


class QualityGateSink:
    """foreachBatch sink: construct with a FROZEN model — either
    ``model=(vocab_dict, bias)`` (pure-JVM scoring, keeps logit > 0) or
    ``model=QualityModel`` (hashed Arrow scoring, keeps score >
    ``threshold``); feed micro-batches via ``process_batch``; read the
    gated corpus via ``snapshot`` (or ``tablefmt.read_version`` on
    ``root`` from any process)."""

    def __init__(
        self,
        root: str,
        model,
        threshold: float = 0.5,
        text_col: str = "text",
        auto_compact: "int | None" = 64,
    ):
        if isinstance(model, QualityModel):
            self._mode = "hashed"
        elif isinstance(model, tuple) and len(model) == 2:
            self._mode = "vocab"
        else:
            raise ValueError(
                "model must be a QualityModel or a (vocab_dict, bias) export"
            )
        self.root = root
        self.model = model
        self.threshold = threshold
        self.text_col = text_col
        self.auto_compact = auto_compact
        self.batches_seen = 0
        # restart recovery: the manifests ARE the redelivery ledger
        self._done_batch_ids: set[int] = {
            man["app"]["batch_id"]
            for man in TF.history(root)
            if "batch_id" in man.get("app", {})
        }

    def _gate(self, docs: DataFrame) -> DataFrame:
        if self._mode == "vocab":
            vocab, bias = self.model
            scored = score_quality_vocab(
                docs, vocab, bias, text_col=self.text_col
            )
            return scored.filter(F.col("keep")).drop("keep")
        scored = score_quality(docs, self.model, text_col=self.text_col)
        return scored.filter(F.col("quality_score") > self.threshold)

    def process_batch(self, docs: DataFrame, batch_id: int) -> None:
        # foreachBatch is at-least-once; a redelivered batch would
        # duplicate survivor rows
        if batch_id in self._done_batch_ids:
            return
        kept = self._gate(docs)
        TF.commit_append(kept, self.root, app={"batch_id": batch_id})
        self._done_batch_ids.add(batch_id)
        self.batches_seen += 1
        # maintenance after the durability point; never vacuums, so the
        # batch_id ledger survives for recovery
        TF.maybe_compact(docs.sparkSession, self.root, self.auto_compact)

    def snapshot(self, spark: SparkSession) -> DataFrame:
        return TF.read_version(spark, self.root)
