"""[EXT] Lexical retrieval over the corpus — BM25 top-k.

The retrieval complement of the E3 vector search family: score
documents against a token query with Okapi BM25 (Robertson et al.) and
return the top-k. A training-data pipeline uses this shape for
targeted corpus search (find documents about X for audit/curation) and
as the sparse half of hybrid retrieval next to the ANN index.

Scale shape: the query's terms are a literal handful, so every corpus
pass is FILTERED to them before any shuffle — per-(doc, term) term
frequencies are one filtered explode + groupBy, document lengths are a
pure projection (no explode), and the per-term document frequencies /
corpus totals are term-count-sized aggregates. Scoring is a join
against a broadcast term-parameter table and one groupBy(doc); the
top-k is a TakeOrderedAndProject (per-partition heaps + driver merge,
no global sort).

Determinism: idf and each per-term partial score are quantized to
DECIMAL(38,6) before the per-document sum (the repo's quantized-ln
discipline), so scores add order-independently and match a SQL oracle
bitwise; ties break on doc_id.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def bm25_topk(
    docs: DataFrame,
    query_terms: "list[str]",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 top-k: per matching document,

        score = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*len/avglen))
        idf(t) = ln((N - df + 0.5) / (df + 0.5) + 1)    [RSJ, +1 form]

    with tf the term's count in the doc, len the doc's token count, N
    the corpus size, avglen the mean token count, df the term's
    document frequency. Documents matching no query term never enter
    the scoring join. Returns (id_col, score, rank) for the top ``k``
    (rank ties broken by id ascending)."""
    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    if k <= 0:
        raise ValueError("k must be positive")
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("long")
    lens = docs.select(F.col(id_col), n_tok.alias("_len"))
    # corpus totals: two O(1)-output scalar aggregates (N, total tokens)
    row = lens.agg(
        F.count(F.lit(1)).alias("n"), F.sum("_len").alias("tot")
    ).collect()[0]
    n_docs, total = int(row["n"]), int(row["tot"] or 0)
    if n_docs == 0:
        # derive the id type from the input so the empty result unions
        # cleanly with non-empty results (e.g. rrf_fuse over string-id
        # corpora) — ADVICE r8
        from pyspark.sql.types import IntegerType, StructField, StructType
        from pyspark.sql.types import DoubleType

        src_id = docs.schema[id_col]
        return docs.sparkSession.createDataFrame(
            [],
            StructType(
                [
                    StructField(id_col, src_id.dataType, src_id.nullable),
                    StructField("score", DoubleType(), True),
                    StructField("rank", IntegerType(), False),
                ]
            ),
        )
    avg_len = total / n_docs  # exact-int division: same double everywhere

    hits = (
        docs.select(
            F.col(id_col),
            F.explode(F.split(F.col(text_col), " ")).alias("term"),
        )
        .filter(F.col("term").isin(*terms))  # query-filtered BEFORE shuffle
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        # consumed by df-counts AND scoring; LAZY so the df-count
        # collect materializes it and scoring reuses the cache (one
        # job, not an extra eager materialization — guide §5)
        .localCheckpoint(eager=False)
    )
    return _bm25_score(hits, lens, terms, n_docs, avg_len, k, k1, b, id_col)


def _bm25_score(
    hits: DataFrame,
    lens: "DataFrame | None",
    terms: "list[str]",
    n_docs: int,
    avg_len: float,
    k: int,
    k1: float,
    b: float,
    id_col: str,
) -> DataFrame:
    """The shared BM25 scoring tail: per-(doc, term) ``tf`` hits +
    per-doc ``_len`` lengths + corpus totals -> top-k (id, score, rank).
    One code path for the one-shot ``bm25_topk`` AND the maintained
    index's ``bm25_topk_from_index``, so incremental == one-shot is an
    identity of the arithmetic, not a re-derivation."""
    # per-term document frequency -> idf as a DECIMAL literal map
    dfreq = {
        r["term"]: int(r["n"])
        for r in hits.groupBy("term").agg(
            F.count("*").alias("n")
        ).collect()
    }
    idf_entries: list = []
    for t in terms:
        d = dfreq.get(t, 0)
        idf = math.log((n_docs - d + 0.5) / (d + 0.5) + 1.0)
        idf_entries.append(F.lit(t))
        idf_entries.append(F.lit(f"{idf:.6f}").cast("decimal(38,6)"))
    idf_map = F.create_map(*idf_entries)

    tf = F.col("tf").cast("double")
    denom = tf + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * (F.col("_len").cast("double") / F.lit(avg_len))
    )
    partial = (
        F.try_element_at(idf_map, F.col("term")).cast("double")
        * (tf * F.lit(k1 + 1.0) / denom)
    ).cast("decimal(38,6)")
    # lens=None: hits already carry their per-doc ``_len`` (the
    # maintained index denormalizes doc_len onto postings rows) — the
    # scoring arithmetic is identical either way, only the join goes
    scored_src = hits if lens is None else hits.join(lens, id_col)
    topk = (
        scored_src
        .select(F.col(id_col), partial.alias("_p"))
        .groupBy(id_col)
        .agg(F.sum("_p").cast("double").alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
    # rank assignment runs over the already-reduced k rows — the global
    # window is k-sized, never corpus-sized
    w = W.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return topk.select(id_col, "score", F.row_number().over(w).alias("rank"))


def rrf_fuse(
    ranked: "list[DataFrame]",
    k: int = 10,
    kappa: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al.): fuse N ranked candidate
    lists into one by score = sum over lists of 1/(kappa + rank),
    missing entries contributing 0 — the standard hybrid-retrieval
    combiner (lexical BM25 + vector ANN) because it needs NO score
    calibration between sources, only ranks.

    Exactness: each term is one double division with exact-integer
    operands and the per-document sum has a fixed source order, so the
    fused scores are bit-identical across engines — no quantization
    needed. Candidate lists are top-N-sized (k-scale, not corpus-scale),
    so the outer-join chain is broadcast-trivial; the final top-k is a
    TakeOrderedAndProject."""
    if not ranked:
        raise ValueError("ranked must be non-empty")
    if k <= 0 or kappa <= 0:
        raise ValueError("k and kappa must be positive")
    fused = None
    for i, df in enumerate(ranked):
        part = df.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(kappa) + F.col(rank_col)).cast("double"))
            .alias(f"_r{i}"),
        )
        fused = part if fused is None else fused.join(part, id_col, "full")
    score = None
    for i in range(len(ranked)):
        term = F.coalesce(F.col(f"_r{i}"), F.lit(0.0))
        score = term if score is None else score + term
    w = W.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    return (
        fused.select(F.col(id_col), score.alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "rrf_score", F.row_number().over(w).alias("rank"))
    )
