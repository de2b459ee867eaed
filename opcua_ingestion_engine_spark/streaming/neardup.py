"""Streaming-incremental near-duplicate detection (E2, streaming form).

An LLM ingest pipeline receives documents continuously; re-running batch
MinHash-LSH over the full corpus per arrival wave is O(corpus) each
time. This sink maintains the LSH state ACROSS micro-batches and does
per-batch work proportional to the batch:

- state 1: the banded signature index (band, bucket, doc_id) of every
  doc seen so far — the same rows batch `lsh_candidate_pairs` builds,
  accumulated instead of rebuilt;
- state 2: the shingle store (doc_id, shingles) for exact-Jaccard
  verification of candidates (at 100 TB this is the corpus table itself,
  re-read by candidate semi-join; here it is accumulated the same way
  the modvalues merge sink accumulates state).

Per batch: new docs are shingled + signed ONCE (the signature depends
only on the text, so incremental banding produces byte-identical bucket
rows to the batch pipeline), candidates = new-vs-index plus
new-vs-new on the same (band, bucket) key, then exact-Jaccard verify.
Each pair is emitted exactly once — in the micro-batch where its LATER
doc arrives — so the union of emissions over any batch split equals the
batch pipeline's output (pinned by
test_incremental_neardup_matches_batch).

Both states grow append-only; only each batch's INCREMENT is eagerly
localCheckpoint'ed (the running unions stay lazy over those checkpointed
leaves — re-checkpointing the whole accumulated state per batch would
copy O(batches^2) historical rows over the stream's life). A real
deployment writes them as bucketed tables (bucket key: (band, bucket)
for the index) so the per-batch candidate join is exchange-free on the
stored side.

Redelivery: ``foreachBatch`` is at-least-once — a fully processed
micro-batch can re-execute after a failure before the checkpoint
commit, with the SAME batch_id. ``process_batch`` therefore skips a
batch_id it has already processed, and the new-vs-index path drops
self-pairs (a redelivered doc meets itself in the index at jaccard
1.0). Both are pinned by the redelivery test in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import dedup as D


class IncrementalNearDupSink:
    """foreachBatch sink: call ``process_batch`` with each micro-batch of
    (doc_id, text[, ...]) rows; verified pairs accumulate in ``pairs``."""

    def __init__(
        self,
        threshold: float = 0.2,
        n: int = 3,
        num_hashes: int = 96,
        bands: int = 32,
        rows_per_band: int = 3,
        state_root: str | None = None,
        auto_compact: int | None = 64,
    ):
        self.state_root = state_root
        self.auto_compact = auto_compact
        self.threshold = threshold
        self.n = n
        self.num_hashes = num_hashes
        self.bands = bands
        self.rows_per_band = rows_per_band
        if bands * rows_per_band > num_hashes:
            raise ValueError(
                f"band geometry {bands}x{rows_per_band} needs "
                f"{bands * rows_per_band} hashes, got num_hashes={num_hashes}"
            )
        self.index: DataFrame | None = None     # (band, bucket, doc_id)
        self.shingles: DataFrame | None = None  # (doc_id, shingles)
        self.pairs: DataFrame | None = None     # (doc_a, doc_b, jaccard)
        self.batches_seen = 0
        self._done_batch_ids: set[int] = set()
        if state_root is not None:
            import os

            from pyspark.sql import SparkSession

            from ..operators import tablefmt as TF

            # durable mode: all three state frames are append-only by
            # construction, so each lands as an append-structured table.
            # Sub-commit order shingles -> index -> pairs (pairs LAST =
            # the batch's durability point); each is batch_id-guarded in
            # its own manifests. A retry after a crash between commits
            # recomputes IDENTICAL increments: the candidate set is
            # least/greatest-normalized and distinct'd, so an index that
            # already contains the batch yields the same pairs, and the
            # shingle store is read from the table alone once its append
            # landed (never table + in-flight union = doubled rows).
            self._roots = {
                k: os.path.join(state_root, k)
                for k in ("shingles", "index", "pairs")
            }
            self._sub_done = {
                k: {
                    m["app"]["batch_id"]
                    for m in TF.history(r)
                    if "batch_id" in m.get("app", {})
                }
                for k, r in self._roots.items()
            }
            self._done_batch_ids = (
                self._sub_done["shingles"]
                & self._sub_done["index"]
                & self._sub_done["pairs"]
            )
            self.batches_seen = len(self._done_batch_ids)
            spark = SparkSession.getActiveSession()
            for attr, key in (
                ("shingles", "shingles"), ("index", "index"), ("pairs", "pairs")
            ):
                if TF.latest_version(self._roots[key]) is not None:
                    setattr(
                        self, attr, TF.read_version(spark, self._roots[key])
                    )

    def process_batch(self, batch_docs: DataFrame, batch_id: int) -> None:
        if batch_id in self._done_batch_ids:
            return  # at-least-once redelivery of a committed batch
        sh_new = batch_docs.select(
            "doc_id",
            F.array_distinct(D.word_ngrams(F.col("text"), self.n)).alias("shingles"),
        ).localCheckpoint(eager=True)
        sig_new = D.minhash_signatures(sh_new, self.num_hashes)
        # the SAME bucketing expression as batch lsh_candidate_pairs —
        # shared code, so incremental and batch bucket rows cannot drift
        banded_new = D.banded_buckets(
            sig_new, self.bands, self.rows_per_band
        ).localCheckpoint(eager=True)

        # new-vs-old: same (band, bucket) against the accumulated index
        cands = None
        if self.index is not None:
            old = self.index.select(
                "band", "bucket", F.col("doc_id").alias("_o")
            )
            new = banded_new.select("band", "bucket", F.col("doc_id").alias("_n"))
            # normalize to (least, greatest) — the batch pipeline's pair
            # orientation — since an earlier-arriving doc may have the
            # larger id
            cands = (
                old.join(new, ["band", "bucket"])
                # drop self-pairs: a doc already present in the index (a
                # duplicate id, or redelivery racing the guard) meets
                # itself at jaccard 1.0 otherwise
                .filter(F.col("_o") != F.col("_n"))
                .select(
                    F.least("_o", "_n").alias("doc_a"),
                    F.greatest("_o", "_n").alias("doc_b"),
                )
            )
        # new-vs-new within this batch (the batch pipeline's self-collision)
        nn = (
            banded_new.groupBy("band", "bucket")
            .agg(F.collect_list("doc_id").alias("ids"))
            .filter(F.size("ids") >= 2)
            .select(
                F.explode(
                    F.flatten(
                        F.transform(
                            F.col("ids"),
                            lambda x: F.transform(
                                F.filter(F.col("ids"), lambda y: y > x),
                                lambda y: F.struct(
                                    x.alias("doc_a"), y.alias("doc_b")
                                ),
                            ),
                        )
                    )
                ).alias("p")
            )
            .select("p.doc_a", "p.doc_b")
        )
        cands = nn if cands is None else cands.unionByName(nn)
        cands = cands.distinct()

        # exact-Jaccard verify against the (old + new) shingle store.
        # Durable retry: once the shingles append landed, the table
        # ALREADY holds the batch — union it again and every verify row
        # (hence every appended pair) would double.
        if (
            self.state_root is not None
            and batch_id in self._sub_done["shingles"]
        ):
            # re-READ the table: the in-memory frame predates the
            # landed append (the commit block that refreshes it never
            # ran on the failed attempt), and verifying against a store
            # missing the batch's shingles would drop its pairs
            from ..operators import tablefmt as TF

            store = TF.read_version(
                batch_docs.sparkSession, self._roots["shingles"]
            )
        else:
            store = (
                sh_new
                if self.shingles is None
                else self.shingles.unionByName(sh_new)
            )
        a = store.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
        b = store.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
        verified = (
            cands.join(a, "doc_a")
            .join(b, "doc_b")
            .withColumn("jaccard", D._jaccard(F.col("sh_a"), F.col("sh_b")))
            .filter(F.col("jaccard") >= self.threshold)
            .select("doc_a", "doc_b", "jaccard")
            .localCheckpoint(eager=True)
        )

        if self.state_root is not None:
            from ..operators import tablefmt as TF

            spark = batch_docs.sparkSession
            for key, frame in (
                ("shingles", sh_new), ("index", banded_new), ("pairs", verified)
            ):
                if batch_id not in self._sub_done[key]:
                    TF.commit_append(
                        frame, self._roots[key], app={"batch_id": batch_id}
                    )
                    self._sub_done[key].add(batch_id)
            self.batches_seen += 1
            self._done_batch_ids.add(batch_id)
            # maintenance after the durability point; never vacuums, so
            # the manifests' batch_id ledger survives for recovery
            for r in self._roots.values():
                TF.maybe_compact(spark, r, self.auto_compact)
            self.shingles = TF.read_version(spark, self._roots["shingles"])
            self.index = TF.read_version(spark, self._roots["index"])
            self.pairs = TF.read_version(spark, self._roots["pairs"])
            return

        # running unions stay LAZY over the per-batch checkpointed
        # increments (sh_new/banded_new/verified): linear O(batch) work
        # per batch; eagerly re-checkpointing the accumulated state here
        # would copy every historical row again each batch (O(batches^2))
        self.pairs = (
            verified if self.pairs is None else self.pairs.unionByName(verified)
        )
        self.index = (
            banded_new
            if self.index is None
            else self.index.unionByName(banded_new)
        )
        self.shingles = store
        self.batches_seen += 1
        self._done_batch_ids.add(batch_id)
