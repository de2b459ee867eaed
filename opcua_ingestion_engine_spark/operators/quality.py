"""[EXT] E4 — trainable model-based quality classifier.

The standard CCNet/C4-style model gate: instead of hand-set threshold
rules (``text.quality_filter``), LEARN a linear classifier over hashed
bag-of-words features from a labeled sample (e.g. "looks like reference
text" vs "looks like crawl spam") and score the whole corpus with it.
fastText's supervised mode is the production archetype; this is the
same model family (bag-of-ngrams -> linear -> sigmoid) trained and
served Spark-native.

Scale shape, by stage:

- **Training** is distributed full-batch gradient descent with the same
  discipline as the BPE trainer (``bpe.py``): each epoch is ONE corpus
  pass where every partition computes a partial gradient over its rows
  via ``mapInPandas`` (emitting one ``n_features``-float row per
  partition, NOT per doc) and the driver reduces partials in partition
  order and takes the step. Labeled training sets are sample-sized
  (100k-ish docs), not corpus-sized — the 100 TB object is what gets
  SCORED, not trained on. Epoch cost: O(|train| x tokens/partition)
  work, O(partitions x n_features) driver reduce, no shuffle.
- **Scoring** (``score_quality``) broadcasts the frozen weight vector
  and maps each Arrow batch through one vectorized kernel — a pure
  projection: no shuffle, no join, column-pruned scan of (id, text).
- **Frozen-vocab scoring** (``score_quality_vocab``) serves a model
  exported to an explicit token->weight map as a PURE JVM Column
  expression (map literal + ``aggregate`` over the token array): fully
  codegen'd, zero Python, zero shuffle — and, with DECIMAL weights,
  bit-identical to the SQL form a warehouse oracle runs (the dot
  product is exact decimal arithmetic on both engines).

Determinism: the feature hash is ``zlib.crc32`` (process- and
platform-stable, unlike Python's salted ``hash``); per-doc gradient
contributions are accumulated in row order within each partition and
partials are reduced in partition-id order on the driver, so training
is bit-reproducible for a fixed input layout — pinned by an exact
model-parity test against a pure-Python reference trainer on a
single-partition input.
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_token(tok: str, n_features: int) -> int:
    """Stable feature-hash slot for a token (crc32 mod n_features)."""
    return zlib.crc32(tok.encode("utf-8")) % n_features


def _doc_features(text: str, n_features: int, memo: dict) -> "tuple":
    """Hashed token-count features of one whitespace-tokenized document:
    (slot indices, counts) with per-partition token->slot memoization.
    NULL text scores as the empty document (zero features), matching the
    rules gate and the vocab path — not a crash (ADVICE r8)."""
    counts: dict[int, int] = {}
    for t in (text.split(" ") if isinstance(text, str) else ()):
        if not t:
            continue
        h = memo.get(t)
        if h is None:
            h = memo[t] = _hash_token(t, n_features)
        counts[h] = counts.get(h, 0) + 1
    idx = np.fromiter(counts.keys(), dtype=np.int64, count=len(counts))
    cnt = np.fromiter(counts.values(), dtype=np.float64, count=len(counts))
    return idx, cnt


def _sigmoid(z: float) -> float:
    """Overflow-safe scalar logistic — the single convention shared by
    the distributed trainer and the pure-Python parity reference."""
    import math

    if z >= 0:
        return 1.0 / (1.0 + math.exp(-z))
    e = math.exp(z)
    return e / (1.0 + e)


@dataclass(frozen=True)
class QualityModel:
    """A trained linear quality model: hashed-ngram weights + bias."""

    weights: np.ndarray  # (n_features,) float64
    bias: float
    n_features: int

    def token_weight(self, tok: str) -> float:
        return float(self.weights[_hash_token(tok, self.n_features)])

    def to_vocab(self, tokens, round_to: int = 6) -> dict:
        """Export an explicit token->weight map for the given tokens
        (e.g. the training corpus's frequent words), rounded for the
        DECIMAL-exact ``score_quality_vocab`` / SQL serving path.
        Tokens sharing a hash slot export the same weight — that IS the
        hashed model's semantics, not an export artifact."""
        return {t: round(self.token_weight(t), round_to) for t in tokens}


def train_quality_classifier(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = 1 << 15,
    epochs: int = 30,
    lr: float = 0.5,
    l2: float = 1e-4,
) -> QualityModel:
    """Train the logistic quality model with distributed full-batch
    gradient descent (see module docstring for the scale shape).
    ``label_col`` holds 0/1 doubles (1 = high quality). Returns the
    frozen model; scoring is a separate, shuffle-free pass.

    Full-batch (not stochastic) is the deliberate choice: every epoch's
    gradient is an exact, order-insensitive sum over partitions, so
    training is deterministic for a fixed input layout and needs no
    cross-partition coordination beyond the one driver reduce per
    epoch."""
    src = docs.select(
        F.col(text_col).alias("_t"), F.col(label_col).cast("double").alias("_y")
    )
    spark = docs.sparkSession
    sc = spark.sparkContext
    w = np.zeros(n_features, dtype=np.float64)
    b = 0.0
    for _ in range(epochs):
        bc = sc.broadcast((w, b))

        def partial(batches):
            from pyspark import TaskContext

            pw, pb = bc.value
            g = np.zeros(len(pw), dtype=np.float64)
            gb = 0.0
            n = 0
            memo: dict = {}
            for pdf in batches:
                for text, y in zip(pdf["_t"], pdf["_y"]):
                    idx, cnt = _doc_features(text, len(pw), memo)
                    z = pb + float(pw[idx] @ cnt)
                    err = _sigmoid(z) - float(y)
                    np.add.at(g, idx, err * cnt)
                    gb += err
                    n += 1
            pid = TaskContext.get().partitionId()
            yield pd.DataFrame(
                {"pid": [pid], "g": [g.tobytes()], "gb": [gb], "n": [n]}
            )

        parts = src.mapInPandas(
            partial, "pid int, g binary, gb double, n long"
        ).collect()
        bc.destroy()
        g = np.zeros(n_features, dtype=np.float64)
        gb, n = 0.0, 0
        for row in sorted(parts, key=lambda r: r["pid"]):
            g += np.frombuffer(row["g"], dtype=np.float64)
            gb += row["gb"]
            n += row["n"]
        if n == 0:
            raise ValueError("empty training set")
        w = w - lr * (g / n + l2 * w)
        b = b - lr * (gb / n)
    return QualityModel(weights=w, bias=float(b), n_features=n_features)


def score_quality(
    docs: DataFrame,
    model: QualityModel,
    text_col: str = "text",
    out_col: str = "quality_score",
) -> DataFrame:
    """Score every document with a trained model: appends ``out_col`` =
    sigmoid(w . counts + b) in [0, 1]. Broadcast weights, one vectorized
    Arrow kernel per batch, no shuffle — the pass that actually runs at
    corpus scale, so it must stay a pure projection."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast((model.weights, model.bias))
    cols = docs.columns

    def score(batches):
        pw, pb = bc.value
        nf = len(pw)
        memo: dict = {}
        for pdf in batches:
            # vectorized per Arrow batch: flatten all tokens, hash each
            # (memoized per partition), gather weights, and segment-sum
            # per document with ONE bincount — no per-document matmul
            # loop on the corpus-scale path
            # NULL text (None/NaN under Arrow) scores NULL, matching the
            # vocab path's SQL semantics (split(NULL) -> NULL logit);
            # previously crashed on txt.split of None (ADVICE r8).
            null_mask = np.fromiter(
                (not isinstance(txt, str) for txt in pdf[text_col]),
                dtype=bool,
                count=len(pdf),
            )
            tok_lists = [
                [t for t in txt.split(" ") if t] if isinstance(txt, str) else []
                for txt in pdf[text_col]
            ]
            n_tok = np.fromiter(
                (len(lst) for lst in tok_lists),
                dtype=np.int64,
                count=len(tok_lists),
            )
            doc_of = np.repeat(np.arange(len(tok_lists)), n_tok)
            slots = np.fromiter(
                (
                    memo[t] if t in memo else memo.setdefault(
                        t, _hash_token(t, nf)
                    )
                    for lst in tok_lists
                    for t in lst
                ),
                dtype=np.int64,
                count=int(n_tok.sum()),
            )
            zs = pb + np.bincount(
                doc_of, weights=pw[slots], minlength=len(tok_lists)
            )
            out = pdf.copy()
            with np.errstate(over="ignore"):
                scores = np.where(
                    zs >= 0,
                    1.0 / (1.0 + np.exp(-zs)),
                    np.exp(zs) / (1.0 + np.exp(zs)),
                )
            # NaN -> NULL under Arrow's from_pandas conversion
            out[out_col] = np.where(null_mask, np.nan, scores)
            yield out

    schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in docs.schema.fields]
        + [f"{out_col} double"]
    )
    return docs.mapInPandas(score, schema).select(*cols, out_col)


def vocab_weight_map(vocab: dict) -> Column:
    """A ``map<string, decimal(10,6)>`` literal from a token->weight
    dict — the broadcast-free frozen-model form (the map rides inside
    the plan itself). Sorted entries so the expression is canonical."""
    entries: list[Column] = []
    for t in sorted(vocab):
        entries.append(F.lit(t))
        entries.append(F.lit(f"{vocab[t]:.6f}").cast("decimal(10,6)"))
    return F.create_map(*entries)


def score_quality_vocab(
    docs: DataFrame,
    vocab: dict,
    bias: float,
    text_col: str = "text",
    logit_col: str = "quality_logit",
    keep_col: str = "keep",
) -> DataFrame:
    """Serve a frozen explicit-vocab linear quality model as a PURE
    Column expression: ``logit = bias + sum(weight[token] * count)``
    over the whitespace tokens, via a map literal + one ``aggregate``
    fold — fully codegen'd JVM execution, zero Python, zero shuffle,
    zero joins (for vocabularies up to a few thousand entries the map
    literal beats an explode + broadcast-join + re-group round trip;
    beyond that, export to a table and join). Weights and bias are
    DECIMAL(10,6); the fold accumulates in DECIMAL(38,6), so the logit
    is EXACT — bit-identical to a SQL warehouse computing the same dot
    product, which is what makes the frozen-model gate
    oracle-checkable. Appends ``logit_col`` (double, cast after the
    exact sum) and ``keep_col`` (logit > 0 — the decision boundary)."""
    wmap = vocab_weight_map(vocab)
    zero = F.lit("0").cast("decimal(38,6)")
    toks = F.split(F.col(text_col), " ")
    logit = F.aggregate(
        toks,
        zero,
        lambda acc, t: acc
        + F.coalesce(
            F.try_element_at(wmap, t), F.lit("0").cast("decimal(10,6)")
        ),
    ) + F.lit(f"{bias:.6f}").cast("decimal(10,6)")
    return docs.withColumn(logit_col, logit.cast("double")).withColumn(
        keep_col, F.col(logit_col) > 0.0
    )
