"""[EXT] E1-E6 registry entries — the LLM-training-data-pipeline operators
(SURVEY.md §2.11; BASELINE.json north star) on the documents / embeddings /
events fixtures.

Oracle notes:
- LSH paths (minhash bands, hyperplane buckets) use engine-native hashing,
  so they get rows-only driver checks; their recall vs the exact paths is
  pinned by tests/test_llm_ops.py instead.
- ANN results compare (query, neighbor, rank) — ranks are integer-stable
  under the ~1e-15 float noise between engines; similarity values are not.
- Everything else is exact: dedup digests via sha256/md5 (identical hex in
  both engines), Jaccard as double division of exact ints, E6 distances in
  DECIMAL end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import catalog as C
from ..operators import dedup as D
from ..operators import multimodal as M
from ..operators import similarity as S
from ..operators import text as T
from .registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.load_table(spark, sf_dir, "embeddings")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.load_table(spark, sf_dir, "events")


# SQL fragment: positional word-3-gram shingles (mirrors text.word_ngrams —
# order preserved, duplicates kept). `{t}` is the text expression.
def _sql_positional_shingles(t: str = "text") -> str:
    w = f"string_split({t}, ' ')"
    return f"""CASE WHEN len({w}) >= 3
        THEN list_transform(range(1, len({w}) - 1),
             i -> {w}[i] || ' ' || {w}[i+1] || ' ' || {w}[i+2])
        ELSE [{t}] END"""


# SQL fragment: distinct word-3-gram shingle set (mirrors text.word_ngrams +
# array_distinct). `{t}` is the text expression.
def _sql_shingles(t: str = "text") -> str:
    return f"list_distinct({_sql_positional_shingles(t)})"


# EN stopword list interpolated from the OPERATOR constant — a literal
# copy here would keep asserting the old list after an edit to
# T.LANG_STOPWORDS (same rule as _HITS_SQL below).
_SW_EN = ", ".join(f"'{w}'" for w in T.LANG_STOPWORDS["en"])
_SQL_POS = ", ".join(f"'{w}'" for w in T.POSITIVE_LEXICON)
_SQL_NEG = ", ".join(f"'{w}'" for w in T.NEGATIVE_LEXICON)


# ---------------------------------------------------------------------------
# E1 — exact dedup
# ---------------------------------------------------------------------------

@register(
    "q_e1_exact_dedup",
    """
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents GROUP BY sha256(text)
    """,
    "E1 — exact dedup grouped on sha256(text) (32-byte shuffle key, not "
    "whole documents), deterministic min-doc_id representative",
)
def q_e1(spark, sf_dir):
    return D.exact_dedup(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# E2 — near-duplicate text dedup
# ---------------------------------------------------------------------------

@register(
    "q_e2_jaccard_neardup",
    f"""
    WITH s AS (
        SELECT doc_id, lang, {_sql_shingles()} AS sh FROM documents
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS inter,
               len(a.sh) AS na, len(b.sh) AS nb
        FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
    FROM pairs
    WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.2
    """,
    "E2 (exact verify path) — language-blocked word-3-gram Jaccard pairs "
    ">= 0.2. Quadratic within block: valid as the verification stage / "
    "test-scale oracle; candidate generation at 100 TB is the LSH entry.",
)
def q_e2_jaccard(spark, sf_dir):
    return D.jaccard_pairs(_docs(spark, sf_dir), threshold=0.2)


@register(
    "q_e2_dedup_clusters",
    f"""
    WITH RECURSIVE s AS (
        SELECT doc_id, lang, {_sql_shingles()} AS sh FROM documents
    ),
    p AS (
        SELECT doc_a, doc_b FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS inter,
                   len(a.sh) AS na, len(b.sh) AS nb
            FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id)
        WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.2
    ),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM p
        UNION SELECT doc_b, doc_a FROM p
    ),
    reach(u, lbl) AS (
        SELECT u, u FROM (SELECT u FROM edges UNION SELECT v FROM edges)
        UNION
        SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.u
    ),
    labels AS (
        SELECT u AS node, min(lbl) AS component FROM reach GROUP BY u
    )
    SELECT node, component,
           count(*) OVER (PARTITION BY component) AS cluster_size
    FROM labels
    """,
    "E2 (cluster stage) — connected components over the exact near-dup "
    "pair graph: min-label propagation, one shuffle per round, rounds = "
    "component diameter (operators/graph.py); the recursive-CTE oracle "
    "computes the same transitive closure",
)
def q_e2_dedup_clusters(spark, sf_dir):
    from pyspark.sql.window import Window as W

    from ..operators.graph import connected_components

    pairs = D.jaccard_pairs(_docs(spark, sf_dir), threshold=0.2)
    cc = connected_components(pairs)
    return cc.withColumn(
        "cluster_size", F.count("*").over(W.partitionBy("component"))
    )


@register(
    "q_e2_cross_corpus_neardup",
    f"""
    WITH a AS (
        SELECT doc_id, {_sql_shingles()} AS sh FROM documents
        WHERE doc_id % 2 = 1
    ),
    b AS (
        SELECT doc_id, {_sql_shingles()} AS sh FROM documents
        WHERE doc_id % 2 = 0
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS inter,
               len(a.sh) AS na, len(b.sh) AS nb
        FROM a JOIN b ON len(list_filter(a.sh, x -> list_contains(b.sh, x))) > 0
    )
    SELECT doc_a, doc_b,
           CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
    FROM pairs
    WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5
    """,
    "E2 (cross-corpus, exact path) — the decontamination join: near-dup "
    "pairs ACROSS two corpora only (fixture stand-in: odd vs even "
    "doc_ids), via a two-sided inverted shingle index — |A∩B| from a "
    "groupBy on the shingle-keyed posting join, never doc-x-doc, no "
    "within-corpus pairs. The scale mode is the banded-MinHash twin "
    "(candidates='minhash'), pinned equal on planted dups in pytest.",
)
def q_e2_cross_corpus(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return D.cross_corpus_neardup_pairs(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
        threshold=0.5,
        candidates="exact",
    )


@register(
    "q_e2_decontaminate",
    None,  # engine-native hashing in the LSH stage — rows-only; exact-
    # vs-minhash planted equality pinned in pytest
    "E8-grade fuzzy decontamination — drop every corpus doc whose text "
    "near-duplicates (jaccard >= 0.5) any benchmark doc (fixture "
    "stand-in: doc_id % 97 = 0), via the cross-corpus banded-MinHash "
    "join + exact verify: catches paraphrased benchmark leakage the "
    "exact-8-gram contamination flags miss",
)
def q_e2_decontaminate(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return D.decontaminate(corpus, bench).select("doc_id", "lang", "source")


@register(
    "q_e2_incremental_decontaminate",
    None,  # engine-native hashing — rows-only; union-equals-batch under
    # any split + redelivery skip pinned in tests/test_streaming.py
    "E8-grade decontamination, streaming form — the reference corpus's "
    "signature index is built ONCE and frozen at sink construction; "
    "each micro-batch signs only its own docs, meets the frozen "
    "buckets, exact-verifies, and anti-joins its hits: drop "
    "contaminated docs AS THEY ARRIVE, per-batch work O(batch)",
)
def q_e2_incremental_decontaminate(spark, sf_dir):
    from ..streaming.decontam import StreamingDecontaminateSink

    docs = _docs(spark, sf_dir).select("doc_id", "text", "lang", "source")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    sink = StreamingDecontaminateSink(bench.select("doc_id", "text"))
    for i in range(3):
        sink.process_batch(
            corpus.select("doc_id", "text").filter(F.col("doc_id") % 3 == i),
            i,
        )
    return sink.kept.join(corpus, ["doc_id", "text"]).select(
        "doc_id", "lang", "source"
    )


@register(
    "q_e2_minhash_neardup",
    None,  # engine-native hashing — rows-only; recall pinned in pytest
    "E2 (scale path) — MinHash-LSH: shingle -> 96-hash signature -> 32x3 "
    "banded buckets -> candidate join -> exact-Jaccard verify >= 0.2. "
    "No all-pairs crossJoin at any stage.",
)
def q_e2_minhash(spark, sf_dir):
    return D.minhash_neardup_pairs(_docs(spark, sf_dir), threshold=0.2)


@register(
    "q_e2_incremental_neardup",
    None,  # engine-native hashing — rows-only; batch-equality pinned in
    # test_incremental_neardup_matches_batch
    "E2 (streaming-incremental form, batch-driven here) — documents fed "
    "in 3 id-interleaved waves through streaming/neardup.py's maintained "
    "LSH index; per-wave work is O(wave), and the accumulated pair set "
    "equals the batch MinHash pipeline exactly",
)
def q_e2_incremental(spark, sf_dir):
    from ..streaming.neardup import IncrementalNearDupSink

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    sink = IncrementalNearDupSink(threshold=0.2)
    for i in range(3):
        sink.process_batch(docs.filter(F.col("doc_id") % 3 == i), i)
    return sink.pairs


# Shared by the batch span report and its streaming-incremental twin —
# the sink's accumulated report equals the batch answer under any
# batching (window counts are additive), so both check against this SQL.
_REPEATED_SPANS_SQL = """
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
        WHERE len(string_split(text, ' ')) >= 15
    ),
    wins AS (
        SELECT doc_id, u.s AS start,
               md5(array_to_string(w[u.s + 1 : u.s + 15], ' ')) AS g
        FROM toks,
             LATERAL unnest(list_transform(range(0, len(w) - 15 + 1),
                                           i -> {'s': i})) AS t(u)
    ),
    hot AS (
        SELECT g FROM wins GROUP BY g HAVING count(*) >= 2
    ),
    spans AS (
        SELECT w.doc_id, w.start, w.start + 15 AS end_
        FROM wins w JOIN hot USING (g)
    ),
    marked AS (
        SELECT doc_id, start, end_,
               CASE WHEN max(end_) OVER (PARTITION BY doc_id ORDER BY start
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                        IS NULL
                      OR start > max(end_) OVER (PARTITION BY doc_id
                        ORDER BY start
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    THEN 1 ELSE 0 END AS new_island
        FROM spans
    ),
    islands AS (
        SELECT doc_id, start, end_,
               sum(new_island) OVER (PARTITION BY doc_id ORDER BY start
                   ROWS UNBOUNDED PRECEDING) AS island
        FROM marked
    )
    SELECT doc_id, CAST(min(start) AS INT) AS span_start,
           CAST(max(end_) AS INT) AS span_end
    FROM islands GROUP BY doc_id, island
    """


@register(
    "q_e2_repeated_spans",
    _REPEATED_SPANS_SQL,
    "E2 (substring level) — maximal token spans covered by a 15-token "
    "window repeated >= 2x corpus-wide (Lee et al. span dedup: doc-level "
    "dedup misses boilerplate repeated across distinct documents). "
    "Positional window -> md5 digest (16-byte shuffle key, "
    "engine-portable) -> frequency semi join -> gaps-and-islands merge "
    "per doc; linear in corpus tokens, no pairwise stage",
)
def q_e2_repeated_spans(spark, sf_dir):
    out = D.repeated_spans(_docs(spark, sf_dir), k=15, min_repeats=2)
    return out.select(
        "doc_id",
        F.col("span_start").cast("int").alias("span_start"),
        F.col("span_end").cast("int").alias("span_end"),
    )


@register(
    "q_e2_incremental_spans",
    _REPEATED_SPANS_SQL,
    "E2 (substring level, streaming-incremental form, batch-driven here) "
    "— documents fed in 3 id-interleaved waves through "
    "streaming/spans.py's maintained window index (per-batch work "
    "O(batch): postings append as checkpointed frames, only the "
    "digest-count state re-folds); window counts are additive, so the "
    "accumulated report equals the batch operator under any batching "
    "and shares its DuckDB oracle",
)
def q_e2_incremental_spans(spark, sf_dir):
    from ..streaming.spans import IncrementalSpanDedupSink

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    sink = IncrementalSpanDedupSink(k=15, min_repeats=2)
    for i in range(3):
        sink.process_batch(docs.filter(F.col("doc_id") % 3 == i), i)
    return sink.result().select(
        "doc_id",
        F.col("span_start").cast("int").alias("span_start"),
        F.col("span_end").cast("int").alias("span_end"),
    )


# Shared by the one-shot batch trim and the streaming-incremental
# trim-on-read (the sink's maintained index yields the same hot-window
# set once it has ingested the same corpus — window counts are additive).
_SPAN_TRIM_SQL = """
    WITH toks0 AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    wins AS (
        SELECT toks.doc_id, u.s AS start,
               md5(array_to_string(w[u.s + 1 : u.s + 15], ' ')) AS g
        FROM (SELECT * FROM toks0 WHERE len(w) >= 15) toks,
             LATERAL unnest(list_transform(range(0, len(w) - 15 + 1),
                                           i -> {'s': i})) AS t(u)
    ),
    hot AS (
        SELECT g FROM wins GROUP BY g HAVING count(*) >= 2
    ),
    spans AS (
        SELECT w.doc_id, w.start, w.start + 15 AS end_
        FROM wins w JOIN hot USING (g)
    ),
    agg AS (
        SELECT doc_id, list({'s': start, 'e': end_}) AS sps
        FROM spans GROUP BY doc_id
    ),
    joined AS (
        SELECT k.doc_id, k.w, a.sps FROM toks0 k LEFT JOIN agg a USING (doc_id)
    ),
    kept AS (
        SELECT doc_id, w,
               CASE WHEN sps IS NULL THEN w
                    ELSE list_transform(
                           list_filter(
                             list_transform(range(1, len(w) + 1),
                                            i -> {'t': w[i], 'i': i - 1}),
                             x -> len(list_filter(
                                    sps, b -> x.i >= b.s AND x.i < b.e)) = 0),
                           x -> x.t)
               END AS surv
        FROM joined
    )
    SELECT doc_id,
           -- array_to_string([]) is NULL in DuckDB; Spark's concat_ws
           -- gives '' for a fully-trimmed doc — align on ''
           coalesce(array_to_string(surv, ' '), '') AS text,
           CAST(len(w) - len(surv) AS BIGINT) AS n_tokens_removed
    FROM kept
    """


@register(
    "q_e2_durable_spans",
    _REPEATED_SPANS_SQL,
    "E2 (substring level, DURABLE streaming form, batch-driven here) — "
    "documents fed in 3 id-interleaved waves through the span sink's "
    "durable mode: window postings land as an append-structured "
    "versioned table (tablefmt.commit_append — O(batch) write "
    "amplification, the manifest's directory list replaces the "
    "in-memory LSM tiers) plus an O(docs) seen table; the report is "
    "computed from the committed state alone, so it equals the batch "
    "operator under any batching and shares its oracle",
)
def q_e2_durable_spans(spark, sf_dir):
    from ..streaming.spans import IncrementalSpanDedupSink
    from .scratch import scratch_root

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    root = scratch_root("spansink")
    sink = IncrementalSpanDedupSink(k=15, min_repeats=2, state_root=root)
    for i in range(3):
        sink.process_batch(docs.filter(F.col("doc_id") % 3 == i), i)
    # a FRESH instance proves the report derives from the committed
    # tables alone (restart recovery), not this process's memory
    served = IncrementalSpanDedupSink(k=15, min_repeats=2, state_root=root)
    return served.result().select(
        "doc_id",
        F.col("span_start").cast("int").alias("span_start"),
        F.col("span_end").cast("int").alias("span_end"),
    )


@register(
    "q_e2_span_trim",
    _SPAN_TRIM_SQL,
    "E2 (substring level, apply step) — trim every corpus-repeated "
    "15-token-window span from each document; returns the cleaned text "
    "and tokens-removed count. Span report is output-sized and joins "
    "back to the corpus; the trim is a codegen higher-order filter over "
    "token positions (no Python)",
)
def q_e2_span_trim(spark, sf_dir):
    return D.trim_repeated_spans(_docs(spark, sf_dir), k=15, min_repeats=2)


@register(
    "q_e2_incremental_span_trim",
    _SPAN_TRIM_SQL,
    "E2 (substring level, streaming trim-on-read, batch-driven here) — "
    "documents fed in 3 id-interleaved waves through streaming/spans.py's "
    "maintained window index, then the CURRENT corpus trimmed against the "
    "accumulated span report (the deployment shape: the index ingests "
    "continuously; consumers trim any shard on read). Window counts are "
    "additive, so once the sink has seen the corpus the hot-window set "
    "equals the one-shot batch computation and this shares its oracle",
)
def q_e2_incremental_span_trim(spark, sf_dir):
    from ..streaming.spans import IncrementalSpanDedupSink

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    sink = IncrementalSpanDedupSink(k=15, min_repeats=2)
    for i in range(3):
        sink.process_batch(docs.filter(F.col("doc_id") % 3 == i), i)
    return sink.trim(docs)


@register(
    "q_e2_embedding_neardup",
    """
    WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 500)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
    """,
    "E2 variant — embedding-cosine near-dup pairs >= 0.45 (exact verify "
    "form over a capped slice; id-only output is selection-stable — the "
    "fixture's closest cosine-to-threshold gap is ~5e-4 vs ~1e-7 "
    "cross-engine float noise). Scale path: hyperplane-LSH candidates + "
    "this cosine predicate as the rerank filter.",
)
def q_e2_embedding(spark, sf_dir):
    return S.embedding_neardup_pairs(_emb(spark, sf_dir), threshold=0.45)


@register(
    "q_e2_simhash",
    None,  # xxhash64-based — engine-specific by construction
    "E2 variant — 64-bit SimHash per document (near-dup = small hamming "
    "distance on bit-prefix buckets)",
)
def q_e2_simhash(spark, sf_dir):
    return D.simhash64(_docs(spark, sf_dir))


@register(
    "q_e2_simhash_neardup",
    None,  # xxhash64-based fingerprints — engine-specific; exactness of
    # the banded search vs brute-force hamming is pinned in pytest
    "E2 (SimHash path) — pairs with hamming(simhash64) <= 3 via the "
    "Manku-style banded search: 4x16-bit bands, pigeonhole-exact "
    "candidates, bit_count verify; single-shuffle scale shape with the "
    "documented max_bucket mega-bucket guard",
)
def q_e2_simhash_neardup(spark, sf_dir):
    # max_bucket=2000: the saturated-vocab corpus concentrates simhash
    # bits, so band buckets grow SUPER-linearly (measured max 179 at
    # sf0.1 -> 1728 at sf1 -> 17647 at sf10); an uncapped 17.6k bucket
    # expands to 155M in-bucket pairs inside one task and OOMed a 48 GB
    # heap in the sf10 sweep. 2000 is above every bucket through sf1
    # (results unchanged at correctness scales) and skips only sf10's
    # mega-buckets — the documented recall tradeoff pinned by the
    # skew-stress tests.
    return D.simhash_neardup_pairs(_docs(spark, sf_dir), max_bucket=2000)


@register(
    "q_e2_semantic_dedup",
    """
    WITH RECURSIVE e AS (SELECT vec_id, embedding, label FROM embeddings
               WHERE vec_id < 400),
    p AS (
        SELECT a.vec_id AS u, b.vec_id AS v
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
    ),
    edges AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
    reach(u, lbl) AS (
        SELECT u, u FROM (SELECT u FROM edges UNION SELECT v FROM edges)
        UNION
        SELECT e2.v, r.lbl FROM reach r JOIN edges e2 ON e2.u = r.u
    ),
    comp AS (SELECT u AS vec_id, min(lbl) AS component FROM reach GROUP BY u)
    SELECT e.vec_id, e.label FROM e
    WHERE e.vec_id NOT IN
        (SELECT vec_id FROM comp WHERE vec_id <> component)
    """,
    "E2 — SemDeDup (Abbas et al. 2023): drop all but one member of every "
    "semantic-duplicate component (cosine >= eps pair graph), exact mode "
    "(n_cells=1, keep=min_id) over a capped slice so the recursive-CTE "
    "oracle can reproduce it. The 100 TB mode is the same operator with "
    "n_cells ∝ corpus size — candidates only within k-means cells "
    "(~n·(n/k) work), paper keep-rule centroid_far — equality with this "
    "exact form on planted duplicates is pinned in pytest.",
)
def q_e2_semantic_dedup(spark, sf_dir):
    return S.semantic_dedup(
        _emb(spark, sf_dir).filter(F.col("vec_id") < 400),
        eps=0.45,
        n_cells=1,
        keep="min_id",
    ).select("vec_id", "label")


@register(
    "q_e2_semantic_dedup_clustered",
    None,  # k-means cells + centroid_far keep are engine-side numpy —
    # rows-only; precision-1.0/recall>=0.9 vs the exact form and the
    # keep rule itself are pinned in pytest
    "E2 — SemDeDup, 100 TB mode: candidates only within k-means cells "
    "(n_cells ∝ corpus ⇒ ~n·(n/k) work), survivors keep each "
    "component's centroid_far member (the paper's diversity-preserving "
    "rule). Measured 4.2-9.5×/decade sf0.1→sf10 with cells scaled to "
    "the corpus.",
)
def q_e2_semantic_dedup_clustered(spark, sf_dir):
    return S.semantic_dedup(
        _emb(spark, sf_dir), eps=0.45, n_cells=8, keep="centroid_far"
    ).select("vec_id", "label")


@register(
    "q_e2_embedding_neardup_lsh",
    None,  # hyperplane buckets are engine-side numpy — rows-only; recall
    # vs the exact capped pair set pinned in pytest
    "E2 (embedding scale path) — cosine >= 0.45 near-dup pairs via "
    "random-hyperplane LSH self-join (16x4 tables, single-shuffle "
    "collect_list candidates, exact JVM cosine verify; linear in corpus, "
    "no crossJoin)",
)
def q_e2_embedding_lsh(spark, sf_dir):
    return S.embedding_neardup_lsh(_emb(spark, sf_dir))


# ---------------------------------------------------------------------------
# E3 — vector similarity search
# ---------------------------------------------------------------------------

@register(
    "q_e3_ann_cosine_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
    scored AS (
        SELECT query_id, neighbor_id,
               list_cosine_similarity(qv, cv) AS cos_sim
        FROM q, c WHERE query_id <> neighbor_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
        ) AS nn_rank
        FROM scored
    )
    SELECT query_id, neighbor_id, nn_rank FROM ranked WHERE nn_rank <= 5
    """,
    "E3 (exact baseline) — brute-force cosine top-5 for 10 query vectors; "
    "rank-only compare (integer-stable under cross-engine float noise). "
    "Dot products run as zip_with/aggregate in strict index order.",
)
def q_e3_brute(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    out = S.brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    # long cast: Spark row_number is int32, DuckDB int64
    return out.withColumnRenamed("rank", "nn_rank").withColumn(
        "nn_rank", F.col("nn_rank").cast("long")
    )


@register(
    "q_e3_filtered_ann",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label AS cl
          FROM embeddings),
    scored AS (
        SELECT query_id, neighbor_id,
               list_cosine_similarity(qv, cv) AS cos_sim
        FROM q JOIN c ON cl = ql AND query_id <> neighbor_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC
        ) AS nn_rank
        FROM scored
    )
    SELECT query_id, neighbor_id, nn_rank FROM ranked WHERE nn_rank <= 5
    """,
    "E3 (filtered search) — exact top-5 cosine neighbors restricted to "
    "the query's OWN label (the pgvector/Qdrant filtered-ANN shape: "
    "same-domain retrieval). Filter-THEN-search: candidates are pruned "
    "by label before scoring, never a post-filter of unfiltered top-k. "
    "Rank-only compare, same float-noise argument as the exact path.",
)
def q_e3_filtered(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    out = S.filtered_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    return out.withColumnRenamed("rank", "nn_rank").withColumn(
        "nn_rank", F.col("nn_rank").cast("long")
    )


# Explicit 64-term left-associated chains: SQL `a+b+c` parses as
# ((a+b)+c), exactly the fold order Spark's aggregate() uses, so the
# double arithmetic is bit-identical across engines (list_cosine_
# similarity would NOT be — its summation order is implementation-
# defined, which is why the ANN oracle above compares ranks only).
_DIM = 64
_DOT_EC = " + ".join(
    f"CAST(e.embedding[{i}] AS DOUBLE) * cv[{i}]" for i in range(1, _DIM + 1)
)
_NORM_E = " + ".join(
    f"CAST(e.embedding[{i}] AS DOUBLE) * CAST(e.embedding[{i}] AS DOUBLE)"
    for i in range(1, _DIM + 1)
)
_NORM_C = " + ".join(f"cv[{i}] * cv[{i}]" for i in range(1, _DIM + 1))


@register(
    "q_e3_domain_diversity",
    f"""
    WITH pe AS (
        SELECT label, i AS pos, embedding[i] AS v
        FROM embeddings, range(1, {_DIM + 1}) r(i)
    ),
    cp AS (
        SELECT label, pos,
               CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE)
                   / count(*) AS c
        FROM pe GROUP BY label, pos
    ),
    cent AS (SELECT label, list(c ORDER BY pos) AS cv FROM cp GROUP BY label),
    scored AS (
        SELECT e.label,
               ({_DOT_EC}) / (sqrt({_NORM_E}) * sqrt({_NORM_C})) AS cs
        FROM embeddings e JOIN cent USING (label)
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CAST(cs AS DECIMAL(38,6))) AS DOUBLE) / count(*)
               AS mean_cos_to_centroid
    FROM scored GROUP BY label
    """,
    "E3 analytics — per-domain embedding coherence: exact group centroid "
    "(DECIMAL-quantized component sums) and mean member cosine to it — "
    "the SemDeDup-style redundancy signal a training-mix recipe uses. "
    "One dim-exploded map-side-combined pass for centroids (config-"
    "sized result, broadcast back), one fold-scored corpus pass.",
)
def q_e3_domain_diversity(spark, sf_dir):
    return S.domain_diversity(_emb(spark, sf_dir))


@register(
    "q_e3_lsh_ann",
    None,  # hyperplanes from xxhash64 — rows-only; recall pinned in pytest
    "E3 (scale path) — random-hyperplane LSH bucketing (8 sign bits) + "
    "exact rerank within buckets; shuffle on signature, no crossJoin",
)
def q_e3_lsh(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    out = S.lsh_bucket_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    return out.withColumnRenamed("rank", "nn_rank")


@register(
    "q_e3_ivf_ann",
    None,  # data-dependent quantizer — rows-only; recall pinned in pytest
    "E3 (scale path, IVF variant) — deterministic k-means coarse "
    "quantizer, nprobe-cell candidate generation, exact rerank within "
    "probed cells; candidates ~ corpus x nprobe/n_cells, no crossJoin",
)
def q_e3_ivf(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    out = S.ivf_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    return out.withColumnRenamed("rank", "nn_rank")


@register(
    "q_e3_pq_ann",
    None,  # data-dependent codebooks — rows-only; recall pinned in pytest
    "E3 (scale path, PQ variant) — product-quantized ADC scan: corpus "
    "stored as m sub-codes (m*log2(ksub) bits/vector), per-query lookup "
    "tables score codes without touching vectors, local top-k before the "
    "exchange, exact rerank of the broadcast-sized candidate set",
)
def q_e3_pq(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    out = S.pq_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    return out.withColumnRenamed("rank", "nn_rank")


@register(
    "q_e3_ivfpq_ann",
    None,  # data-dependent quantizers — rows-only; recall pinned in pytest
    "E3 (scale path, IVF+PQ composition) — inverted-file cell pruning + "
    "product-quantized RESIDUAL codes scored by asymmetric distance "
    "(q.c offset per probed cell + cell-independent residual LUTs), "
    "local top-k before the exchange, broadcast-sized exact rerank",
)
def q_e3_ivfpq(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    out = S.ivfpq_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    return out.withColumnRenamed("rank", "nn_rank")


# Serving geometry for the persisted-index query + its recall pin + the
# bench headline row. NOTE rerank counts candidates PER RESULT SLOT
# (ivfpq_search: take = k * rerank), so k=5/rerank=200 exact-reranks up
# to 1000 ADC candidates per query — that depth is what holds recall@5
# >= 0.9 against this corpus's coarse m=8/ksub=32 codes (measured 0.98
# at sf0.01 / 0.94 at sf0.1; pinned in tests/test_llm_ops.py).
# train_sample participates in the cache tag: switching the training
# backend (sampled driver-side vs full-corpus distributed) changes the
# quantizer tensors, so a cached index built the other way must not be
# served against in-plan rebuilds.
IVFPQ_INDEX_GEOMETRY = {"n_cells": 16, "m": 8, "ksub": 32,
                        "train_sample": 32768}
IVFPQ_SERVE = {"k": 5, "nprobe": 14, "rerank": 200}


# The filtered-serve index carries the label on every codes row (a few
# bytes next to the m=8 sub-codes) so the candidate scan can prune by
# the query's label without touching the vector table. Its own cache
# tag: an unfiltered index lacks the carried column and must not be
# served filtered (the serve refuses loudly).
IVFPQ_FILTERED_GEOMETRY = {**IVFPQ_INDEX_GEOMETRY, "carry_cols": ("label",)}


def ivfpq_index_path(sf_dir: str, geometry: dict | None = None) -> str:
    """Deterministic per-corpus index location OUTSIDE the repo tree.
    The cache tag fingerprints the SOURCE DATA (embeddings parquet
    mtime + size) as well as the path and geometry, so regenerating the
    corpus at the same path invalidates the cached index instead of
    silently serving neighbors from stale codes. Training is
    deterministic, so a missing index is rebuilt identically
    (ivfpq_topk_from_index == in-plan ivfpq_topk, pinned by test)."""
    import hashlib
    import os
    import tempfile

    geometry = IVFPQ_INDEX_GEOMETRY if geometry is None else geometry
    try:
        st = os.stat(os.path.join(sf_dir, "embeddings.parquet"))
        fingerprint = f"{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        fingerprint = "absent"
    tag = hashlib.md5(
        f"{sf_dir}|{fingerprint}|{sorted(geometry.items())}".encode()
    ).hexdigest()[:12]
    return f"{tempfile.gettempdir()}/spark_graft_ivfpq_{tag}"


@register(
    "q_e3_ivfpq_from_index",
    None,  # data-dependent quantizers — rows-only; recall + rebuild
    # identity pinned in pytest
    "E3 (deployment path) — IVF-PQ search served from the PERSISTED index "
    "(codes table repartitioned by cell + .npy quantizer tensors): the "
    "corpus-sized work is one cell-pruned scan of the codes parquet "
    "(a fraction of the vector bytes at m=8), vectors read only for the "
    "exact rerank of up to k*rerank=1000 ADC candidates; recall@5 >= 0.9 "
    "at nprobe=14/16",
)
def q_e3_ivfpq_from_index(spark, sf_dir):
    import os

    path = ivfpq_index_path(sf_dir)
    if not os.path.exists(os.path.join(path, "cent.npy")):
        S.ivfpq_write_index(_emb(spark, sf_dir), path, **IVFPQ_INDEX_GEOMETRY)
    emb = _emb(spark, sf_dir)
    out = S.ivfpq_topk_from_index(
        spark, path, emb, emb.filter(F.col("vec_id") < 10), **IVFPQ_SERVE
    )
    return out.withColumnRenamed("rank", "nn_rank")


@register(
    "q_e3_filtered_ivfpq",
    None,  # data-dependent quantizers — rows-only; same-label invariant
    # + recall vs the exact filtered search pinned in pytest
    "E3 (filtered deployment path) — label-filtered IVF-PQ served from a "
    "persisted index whose codes rows CARRY the label: within each "
    "probed cell a query ADC-scores only same-label rows, so the "
    "k*rerank candidate cut is taken over eligible rows (pre-filter "
    "semantics — a post-filter would under-fill k when the label is "
    "selective) and the vector table is touched only by the already-"
    "filtered rerank. The filtered-vector-search shape of pgvector/"
    "Qdrant, at the index layer.",
)
def q_e3_filtered_ivfpq(spark, sf_dir):
    import os

    path = ivfpq_index_path(sf_dir, IVFPQ_FILTERED_GEOMETRY)
    if not os.path.exists(os.path.join(path, "cent.npy")):
        geo = dict(IVFPQ_FILTERED_GEOMETRY)
        geo["carry_cols"] = list(geo["carry_cols"])
        S.ivfpq_write_index(_emb(spark, sf_dir), path, **geo)
    emb = _emb(spark, sf_dir)
    out = S.ivfpq_topk_from_index(
        spark, path, emb, emb.filter(F.col("vec_id") < 10),
        filter_col="label", **IVFPQ_SERVE
    )
    return out.withColumnRenamed("rank", "nn_rank")


@register(
    "q_e3_incremental_ann_index",
    None,  # data-dependent quantizers — rows-only; equality to the
    # one-shot build + restart/redelivery/upsert pinned in pytest
    "E3 (streaming-incremental form, batch-driven here) — vectors fed in "
    "3 id-interleaved waves through streaming/annindex.py's maintained "
    "IVF-PQ index (quantizers trained on the first wave and FROZEN, "
    "per-batch encode committed via the manifest-CAS versioned table), "
    "then served at the standard geometry. Encode is per-row "
    "deterministic given the frozen quantizers, so the accumulated codes "
    "table equals the one-shot build over the same corpus",
)
def q_e3_incremental_ann_index(spark, sf_dir):
    from ..streaming.annindex import IncrementalAnnIndexSink
    from .scratch import scratch_root

    emb = _emb(spark, sf_dir)
    root = scratch_root("annsink")
    sink = IncrementalAnnIndexSink(root, **IVFPQ_INDEX_GEOMETRY)
    for i in range(3):
        sink.process_batch(emb.filter(F.col("vec_id") % 3 == i), i)
    out = sink.search(emb, emb.filter(F.col("vec_id") < 10), **IVFPQ_SERVE)
    return out.withColumnRenamed("rank", "nn_rank")


@register(
    "q_e3_incremental_filtered_ann",
    None,  # data-dependent quantizers — rows-only; incremental==one-shot
    # equality WITH labels + same-label invariant + label-upsert
    # visibility pinned in pytest (test_incremental_filtered_ann_index)
    "E3 (filtered maintained index — the production serving shape: "
    "tenant/domain search over a live corpus) — vectors fed in 3 "
    "id-interleaved waves through streaming/annindex.py with "
    "carry_cols=['label'], so every committed codes row carries the "
    "filter label and a filtered search is pruned INSIDE the ADC codes "
    "scan (filter-then-search, k never under-fills; never a "
    "post-filter). Served at the standard geometry restricted to each "
    "query's own label.",
)
def q_e3_incremental_filtered_ann(spark, sf_dir):
    from ..streaming.annindex import IncrementalAnnIndexSink
    from .scratch import scratch_root

    emb = _emb(spark, sf_dir)
    root = scratch_root("fannsink")
    sink = IncrementalAnnIndexSink(
        root, carry_cols=["label"], **IVFPQ_INDEX_GEOMETRY
    )
    for i in range(3):
        sink.process_batch(emb.filter(F.col("vec_id") % 3 == i), i)
    out = sink.search(
        emb, emb.filter(F.col("vec_id") < 10), filter_col="label",
        **IVFPQ_SERVE,
    )
    return out.withColumnRenamed("rank", "nn_rank")


# ---------------------------------------------------------------------------
# E4 — text analysis
# ---------------------------------------------------------------------------

@register(
    "q_e4_text_stats",
    f"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
               / len(string_split(text, ' ')) AS mean_word_len,
           CAST(len(list_filter(string_split(text, ' '),
                    w -> w IN ({_SW_EN}))) AS DOUBLE)
               / len(string_split(text, ' ')) AS stopword_ratio,
           CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                AS DOUBLE) / greatest(length(text), 1) AS punct_ratio,
           CAST(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))
                AS DOUBLE) / greatest(length(text), 1) AS upper_ratio
    FROM documents
    """,
    "E4 — per-document quality metrics (C4/Gopher-style filters): length, "
    "tokens, mean word length, stopword/punct/upper ratios. Pure "
    "projection — no shuffle at any scale.",
)
def q_e4_stats(spark, sf_dir):
    return T.quality_metrics(_docs(spark, sf_dir))


_LANGS = sorted(T.LANG_STOPWORDS)
_HITS_SQL = ",\n           ".join(
    f"""CAST(len(list_filter(string_split(text, ' '),
                w -> w IN ({', '.join(f"'{w}'" for w in T.LANG_STOPWORDS[lang])})))
           AS BIGINT) AS hits_{lang}"""
    for lang in _LANGS
)
_GUESS_SQL = "CASE " + " ".join(
    f"WHEN hits_{lang} = best AND best > 0 THEN '{lang}'" for lang in _LANGS
) + " ELSE 'und' END"

@register(
    "q_e4_lang_id",
    f"""
    WITH scored AS (
        SELECT doc_id, lang,
           {_HITS_SQL}
        FROM documents
    ),
    best AS (
        SELECT *, greatest({', '.join('hits_' + lang for lang in _LANGS)}) AS best
        FROM scored
    )
    SELECT doc_id, lang, {_GUESS_SQL} AS lang_guess,
           {', '.join('hits_' + lang for lang in _LANGS)}
    FROM best
    """,
    "E4 — stopword-lexicon language ID with deterministic argmax "
    "(max hits, lexicographic tie-break, 'und' on zero hits)",
)
def q_e4_lang(spark, sf_dir):
    return T.lang_id(_docs(spark, sf_dir))


@register(
    "q_e4_quality_filter",
    f"""
    WITH m AS (
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                   / len(string_split(text, ' ')) AS mean_word_len,
               CAST(len(list_filter(string_split(text, ' '),
                        w -> w IN ({_SW_EN}))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS stopword_ratio,
               CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                    AS DOUBLE) / greatest(length(text), 1) AS punct_ratio
        FROM documents
    )
    SELECT doc_id, n_tokens, mean_word_len, stopword_ratio, punct_ratio
    FROM m
    WHERE n_tokens >= 20 AND mean_word_len <= 12.0
      AND stopword_ratio >= 0.005 AND punct_ratio <= 0.2
    """,
    "E4 — composed C4/Gopher-style KEEP filter: the thresholded form of "
    "the quality metrics (what a training-data pipeline actually runs); "
    "one scan, pure predicate, no shuffle",
)
def q_e4_filter(spark, sf_dir):
    return T.quality_filter(_docs(spark, sf_dir))


# Frozen model for the oracle-checked model-quality gate: weights from a
# train_quality_classifier run on the sf0.01 documents with planted
# labels (count('fast') > count('slow') — the separable signal the
# fixtures carry), exported via QualityModel.to_vocab and rounded to
# 6dp. Frozen so the SAME dot product is computable in ANSI SQL: the
# scoring operator accumulates DECIMAL(10,6) weights exactly, so both
# engines produce bit-identical logits. The top-magnitude tokens are
# kept; the trainer recovered the planted direction (fast +3.38, slow
# -3.15) with everything else near zero.
MODEL_QUALITY_VOCAB = {
    "fast": 3.381092,
    "slow": -3.146358,
    "hash": -0.719917,
    "a": -0.612955,
    "column": -0.602261,
    "merge": -0.572154,
    "scan": -0.522407,
    "value": -0.520058,
    "table": -0.49248,
    "join": -0.47545,
    "the": -0.468479,
    "filter": -0.449693,
}
MODEL_QUALITY_BIAS = -0.418861

_VOCAB_SQL = ",\n        ".join(
    f"('{t}', CAST({w:.6f} AS DECIMAL(10,6)))"
    for t, w in sorted(MODEL_QUALITY_VOCAB.items())
)


@register(
    "q_e4_model_quality",
    f"""
    WITH vocab AS (
        SELECT * FROM (VALUES
        {_VOCAB_SQL}
        ) AS v(token, w)
    ),
    tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    s AS (
        SELECT t.doc_id, SUM(v.w) AS sw
        FROM tok t JOIN vocab v ON v.token = t.token
        GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(s.sw, 0)
                + CAST({MODEL_QUALITY_BIAS:.6f} AS DECIMAL(10,6)) AS DOUBLE)
               AS quality_logit,
           (COALESCE(s.sw, 0)
                + CAST({MODEL_QUALITY_BIAS:.6f} AS DECIMAL(10,6))) > 0 AS keep
    FROM documents d LEFT JOIN s USING (doc_id)
    """,
    "E4 — trained model-based quality gate (CCNet/C4-style): a frozen "
    "hashed-ngram logistic-regression export scored as a PURE JVM Column "
    "expression — map-literal weights + one aggregate fold over the "
    "token array, zero Python / joins / shuffles, exact DECIMAL dot "
    "product (bit-identical to the SQL oracle's unnest+join form). "
    "Training provenance and the distributed trainer live in "
    "operators/quality.py (AUC + bit-parity pinned in tests/"
    "test_quality.py).",
)
def q_e4_model_quality(spark, sf_dir):
    from ..operators.quality import score_quality_vocab

    return score_quality_vocab(
        _docs(spark, sf_dir).select("doc_id", "text"),
        MODEL_QUALITY_VOCAB,
        MODEL_QUALITY_BIAS,
    ).select("doc_id", "quality_logit", "keep")


@register(
    "q_e4_incremental_model_quality",
    f"""
    WITH vocab AS (
        SELECT * FROM (VALUES
        {_VOCAB_SQL}
        ) AS v(token, w)
    ),
    tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    s AS (
        SELECT t.doc_id, SUM(v.w) AS sw
        FROM tok t JOIN vocab v ON v.token = t.token
        GROUP BY t.doc_id
    ),
    scored AS (
        SELECT d.doc_id,
               CAST(COALESCE(s.sw, 0)
                    + CAST({MODEL_QUALITY_BIAS:.6f} AS DECIMAL(10,6))
                    AS DOUBLE) AS quality_logit
        FROM documents d LEFT JOIN s USING (doc_id)
    )
    SELECT doc_id, quality_logit FROM scored WHERE quality_logit > 0
    """,
    "E4 (streaming twin) — the frozen-model quality gate applied ON "
    "INGEST: documents fed in 3 id-interleaved waves through "
    "streaming/qualitygate.py's durable sink (each batch's survivors "
    "commit_append'ed with the batch_id ledger), then the gated corpus "
    "read back from the versioned table. The verdict is stateless per "
    "doc under the frozen model, so the union of per-batch survivors "
    "equals the one-shot batch gate — this query shares q_e4_model_"
    "quality's oracle restricted to kept rows.",
)
def q_e4_incremental_model_quality(spark, sf_dir):
    from ..streaming.qualitygate import QualityGateSink
    from .scratch import scratch_root

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    sink = QualityGateSink(
        scratch_root("qgate"),
        model=(MODEL_QUALITY_VOCAB, MODEL_QUALITY_BIAS),
    )
    for i in range(3):
        sink.process_batch(docs.filter(F.col("doc_id") % 3 == i), i)
    return sink.snapshot(spark).select("doc_id", "quality_logit")


@register(
    "q_e4_winnowing",
    f"""
    WITH h AS (
        SELECT doc_id,
               list_transform({_sql_positional_shingles()}, g -> md5(g)) AS hs
        FROM documents
    ),
    mins AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   range(1, greatest(len(hs) - 4 + 1, 1) + 1),
                   i -> list_min(hs[i : i + 4 - 1]))) AS fps
        FROM h
    )
    SELECT doc_id, unnest(fps) AS fp FROM mins
    """,
    "E4 — winnowing fingerprints (Schleimer/MOSS rolling-hash scheme): "
    "per-window minimum of word-3-gram md5 hashes, window w=4; any "
    "shared >= w+k-1 word run yields a shared fingerprint",
)
def q_e4_winnowing(spark, sf_dir):
    return T.winnowing_fingerprints(_docs(spark, sf_dir))


@register(
    "q_e4_sentiment",
    f"""
    WITH m AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split(text, ' '),
                        w -> w IN ({_SQL_POS}))) AS BIGINT) AS n_pos,
               CAST(len(list_filter(string_split(text, ' '),
                        w -> w IN ({_SQL_NEG}))) AS BIGINT) AS n_neg,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents
    )
    SELECT doc_id, n_pos, n_neg,
           CAST(n_pos - n_neg AS DOUBLE) / n_tok AS sentiment,
           CASE WHEN n_pos > n_neg THEN 'positive'
                WHEN n_pos < n_neg THEN 'negative'
                ELSE 'neutral' END AS label
    FROM m
    """,
    "E4 — lexicon sentiment-style scoring: (pos-neg)/n_tokens + 3-way "
    "label; pure higher-order Column exprs, one scan, no shuffle",
)
def q_e4_sentiment(spark, sf_dir):
    return T.sentiment_score(_docs(spark, sf_dir))


@register(
    "q_e7_curation_pipeline",
    f"""
    WITH m AS (
        SELECT doc_id, lang, text,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                   / len(string_split(text, ' ')) AS mean_word_len,
               CAST(len(list_filter(string_split(text, ' '),
                        w -> w IN ({_SW_EN}))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS stopword_ratio,
               CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                    AS DOUBLE) / greatest(length(text), 1) AS punct_ratio
        FROM documents
    ),
    s1 AS (
        SELECT * FROM m
        WHERE n_tokens >= 20 AND mean_word_len <= 12.0
          AND stopword_ratio >= 0.005 AND punct_ratio <= 0.2
    ),
    reps AS (
        SELECT min(doc_id) AS doc_id FROM s1 GROUP BY sha256(text)
    ),
    repsm AS (
        SELECT s1.doc_id, s1.lang, s1.n_tokens FROM s1 JOIN reps USING (doc_id)
    ),
    sh AS (
        SELECT d.doc_id, d.lang, {_sql_shingles()} AS sh
        FROM documents d JOIN reps USING (doc_id)
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS inter,
               len(a.sh) AS na, len(b.sh) AS nb
        FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id
    ),
    dropd AS (
        SELECT DISTINCT doc_b AS doc_id FROM pairs
        WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5
    )
    SELECT r.doc_id, r.lang, r.n_tokens
    FROM repsm r ANTI JOIN dropd d ON r.doc_id = d.doc_id
    """,
    "[EXT] composed corpus-curation pipeline: E4 quality gate -> E1 exact "
    "dedup (sha256 representative) -> E2 near-dup removal (language-blocked "
    "exact Jaccard >= 0.5, greedy-by-id) — the end-to-end LLM training-data "
    "prep shape, chaining the standalone operators",
)
def q_e7_curation(spark, sf_dir):
    from ..operators.curate import curate_corpus

    return curate_corpus(_docs(spark, sf_dir))


@register(
    "q_e7_curation_clustered",
    f"""
    WITH RECURSIVE m AS (
        SELECT doc_id, lang, text,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                   / len(string_split(text, ' ')) AS mean_word_len,
               CAST(len(list_filter(string_split(text, ' '),
                        w -> w IN ({_SW_EN}))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS stopword_ratio,
               CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                    AS DOUBLE) / greatest(length(text), 1) AS punct_ratio
        FROM documents
    ),
    s1 AS (
        SELECT * FROM m
        WHERE n_tokens >= 20 AND mean_word_len <= 12.0
          AND stopword_ratio >= 0.005 AND punct_ratio <= 0.2
    ),
    reps AS (
        SELECT min(doc_id) AS doc_id FROM s1 GROUP BY sha256(text)
    ),
    repsm AS (
        SELECT s1.doc_id, s1.lang, s1.n_tokens FROM s1 JOIN reps USING (doc_id)
    ),
    sh AS (
        SELECT d.doc_id, d.lang, {_sql_shingles()} AS sh
        FROM documents d JOIN reps USING (doc_id)
    ),
    p AS (
        SELECT doc_a, doc_b FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS inter,
                   len(a.sh) AS na, len(b.sh) AS nb
            FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id)
        WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5
    ),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM p
        UNION SELECT doc_b, doc_a FROM p
    ),
    reach(u, lbl) AS (
        SELECT u, u FROM (SELECT u FROM edges UNION SELECT v FROM edges)
        UNION
        SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.u
    ),
    comp AS (
        SELECT u AS doc_id, min(lbl) AS component FROM reach GROUP BY u
    ),
    cluster_reps AS (
        SELECT min(doc_id) AS doc_id FROM comp GROUP BY component
    )
    SELECT r.doc_id, r.lang, r.n_tokens
    FROM repsm r
    WHERE r.doc_id IN (SELECT doc_id FROM cluster_reps)
       OR r.doc_id NOT IN (SELECT doc_id FROM comp)
    """,
    "[EXT] cluster-mode curation: quality gate -> exact dedup -> connected "
    "components over the near-dup pair graph -> min-id representative per "
    "cluster (operators/curate.curate_corpus_clustered) — the transitive "
    "rule production dedup uses where greedy-by-id over- or under-drops "
    "along chains",
)
def q_e7_curation_clustered(spark, sf_dir):
    from ..operators.curate import curate_corpus_clustered

    return curate_corpus_clustered(_docs(spark, sf_dir))


@register(
    "q_e7_curation_quality_rep",
    f"""
    WITH RECURSIVE m AS (
        SELECT doc_id, lang, text,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                   / len(string_split(text, ' ')) AS mean_word_len,
               CAST(len(list_filter(string_split(text, ' '),
                        w -> w IN ({_SW_EN}))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS stopword_ratio,
               CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                    AS DOUBLE) / greatest(length(text), 1) AS punct_ratio
        FROM documents
    ),
    s1 AS (
        SELECT * FROM m
        WHERE n_tokens >= 20 AND mean_word_len <= 12.0
          AND stopword_ratio >= 0.005 AND punct_ratio <= 0.2
    ),
    reps AS (
        SELECT min(doc_id) AS doc_id FROM s1 GROUP BY sha256(text)
    ),
    repsm AS (
        SELECT s1.doc_id, s1.lang, s1.n_tokens, s1.stopword_ratio
        FROM s1 JOIN reps USING (doc_id)
    ),
    sh AS (
        SELECT d.doc_id, d.lang, {_sql_shingles()} AS sh
        FROM documents d JOIN reps USING (doc_id)
    ),
    p AS (
        SELECT doc_a, doc_b FROM (
            SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS inter,
                   len(a.sh) AS na, len(b.sh) AS nb
            FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id)
        WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5
    ),
    edges AS (
        SELECT doc_a AS u, doc_b AS v FROM p
        UNION SELECT doc_b, doc_a FROM p
    ),
    reach(u, lbl) AS (
        SELECT u, u FROM (SELECT u FROM edges UNION SELECT v FROM edges)
        UNION
        SELECT e.v, r.lbl FROM reach r JOIN edges e ON e.u = r.u
    ),
    comp AS (
        SELECT u AS doc_id, min(lbl) AS component FROM reach GROUP BY u
    ),
    cluster_reps AS (
        SELECT doc_id FROM (
            SELECT c.doc_id,
                   row_number() OVER (
                       PARTITION BY c.component
                       ORDER BY r.stopword_ratio DESC, c.doc_id ASC
                   ) AS rn
            FROM comp c JOIN repsm r USING (doc_id)
        ) WHERE rn = 1
    )
    SELECT r.doc_id, r.lang, r.n_tokens
    FROM repsm r
    WHERE r.doc_id IN (SELECT doc_id FROM cluster_reps)
       OR r.doc_id NOT IN (SELECT doc_id FROM comp)
    """,
    "[EXT] quality-representative curation: same stages as the clustered "
    "mode, but each near-dup cluster keeps its HIGHEST-quality member "
    "(stopword share, tie min doc_id) instead of the min-id one — keep "
    "the cleanest copy of duplicated content, not the first-crawled "
    "(operators/curate.curate_corpus_quality_rep)",
)
def q_e7_curation_quality_rep(spark, sf_dir):
    from ..operators.curate import curate_corpus_quality_rep

    return curate_corpus_quality_rep(_docs(spark, sf_dir))


@register(
    "q_e7_curation_minhash",
    None,  # engine-native hashing in the LSH stage — rows-only; equality
    # with the exact mode on planted dups is pinned in pytest
    "[EXT] curation pipeline, 100 TB mode: same quality gate + exact dedup, "
    "but the near-dup stage uses banded MinHash-LSH candidates + exact "
    "verify instead of the inverted-index all-pairs join. The exact join's "
    "candidate volume is Theta(sum df^2) — measured 28.9M pairs / 53 s at "
    "sf1 on the saturated 31-word-vocab fixtures, where neither prefix "
    "filtering nor df caps can prune (no rare shingles) — while LSH "
    "candidates scale with true similarity (sf1: ~16 s end-to-end)",
)
def q_e7_curation_minhash(spark, sf_dir):
    from ..operators.curate import curate_corpus

    return curate_corpus(_docs(spark, sf_dir), candidates="minhash")


@register(
    "q_e4_token_count",
    r"""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens_ws,
           CAST(len(regexp_extract_all(text,
                '''([a-z]+)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'))
                AS BIGINT) AS n_tokens_bpe,
           CAST(len(list_distinct(regexp_extract_all(text,
                '''([a-z]+)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')))
                AS BIGINT) AS n_unique_bpe
    FROM documents
    """,
    "E4 — token counting: whitespace tokens vs BPE-ish regex pretokens "
    "(GPT-2-style contraction/letter/digit/punct runs) + distinct-pretoken "
    "count; pure projection, no shuffle",
)
def q_e4_tokens(spark, sf_dir):
    return T.token_counts(_docs(spark, sf_dir))


@register(
    "q_e4_fingerprint",
    f"""
    SELECT doc_id, md5(text) AS md5_digest,
           list_min(list_transform({_sql_shingles()}, g -> md5(g)))
               AS shingle_fingerprint
    FROM documents
    """,
    "E4 — document fingerprinting: md5 digest + 1-permutation MinHash "
    "(min md5 over word-3-gram shingles); portable hex hashes",
)
def q_e4_fingerprint(spark, sf_dir):
    return T.fingerprint(_docs(spark, sf_dir))


# ---------------------------------------------------------------------------
# E5 — multimodal columns
# ---------------------------------------------------------------------------

@register(
    "q_e5_multimodal_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST((doc_id * 7) % 640 + 16 AS INT) AS width,
           CAST((doc_id * 13) % 480 + 16 AS INT) AS height,
           3 AS channels,
           'fake8' AS fmt
    FROM documents
    """,
    "E5 — multimodal column convention: binary payload + typed metadata "
    "struct (flattened for the oracle); payload size via octet_length",
)
def q_e5_meta(spark, sf_dir):
    mm = M.attach_payload(_docs(spark, sf_dir))
    return mm.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.channels").alias("channels"),
        F.col("meta.fmt").alias("fmt"),
    )


@register(
    "q_e5_decode_features",
    None,  # decode is Python-side (Arrow mapInPandas) — rows-only; the
    # deterministic features are asserted in tests/test_llm_ops.py
    "E5 — image decode via Arrow-batched mapInPandas over a mixed corpus: "
    "every 7th doc carries a real PNG payload decoded by the pure-stdlib "
    "decoder (real pixel stats from IHDR/IDAT), every 5th remaining doc a "
    "real JPEG decoded by the pure-numpy T.81 codec (round 11; round 12 "
    "cycles every third JPEG row as PROGRESSIVE SOF2 — 4:4:4/4:2:0, "
    "restart intervals, multi-scan successive approximation all rotate "
    "through the corpus), the rest the deterministic fake8 byte stream. "
    "Compressed audio/video stay behind the documented "
    "NotImplementedError guard.",
)
def q_e5_decode(spark, sf_dir):
    return M.multimodal_features(_docs(spark, sf_dir), png_every=7, jpeg_every=5)


@register(
    "q_e5_frame_sample",
    """
    WITH b AS (SELECT doc_id, text AS payload, length(text) AS n
               FROM documents),
    f AS (
        SELECT doc_id, payload,
               unnest(range(0, CAST(ceil(n/256.0) AS BIGINT))) AS i
        FROM b
    )
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           md5(substring(payload, CAST(i*256+1 AS BIGINT), 256)) AS frame_md5,
           CAST(length(substring(payload, CAST(i*256+1 AS BIGINT), 256))
                AS BIGINT) AS frame_bytes
    FROM f
    WHERE i % 4 = 0
    """,
    "E5 — video-style frame sampling: payload as fixed-256-byte frames, "
    "every 4th emitted (fan-out mapInPandas, one row -> many frames); "
    "frames compared by md5. Oracle slices VARCHAR because DuckDB can't "
    "slice BLOBs — byte-exact here (fixture corpus is pure ASCII; the "
    "Spark side is byte-true regardless).",
)
def q_e5_frames(spark, sf_dir):
    out = M.sample_frames(_docs(spark, sf_dir), frame_size=256, stride=4)
    return out.select(
        "doc_id",
        "frame_idx",
        F.md5("frame").alias("frame_md5"),
        F.octet_length("frame").cast("long").alias("frame_bytes"),
    )


@register(
    "q_e5_audio_features",
    None,  # WAV synthesis + decode are Python-side (Arrow mapInPandas) —
    # rows-only; determinism and numpy-exact features pinned in
    # tests/test_llm_ops.py
    "E5 (audio) — real RIFF/PCM WAV decode via the stdlib wave module "
    "inside mapInPandas: every 5th doc carries a deterministic PCM signal, "
    "features are duration/RMS/peak over the decoded samples. Compressed "
    "audio stays behind the NotImplementedError codec guard.",
)
def q_e5_audio(spark, sf_dir):
    return M.audio_features(_docs(spark, sf_dir), wav_every=5)


@register(
    "q_e5_image_neardup",
    None,  # perceptual hashing is Python-side (Arrow mapInPandas) —
    # rows-only; planted re-encode/perturb/distinct cases pinned in
    # tests/test_llm_ops.py
    "E5 x E2 — image near-dup: perceptual aHash per payload (real 8x8 "
    "grid hash on decoded PNG and JPEG rows — one pixel hash space, so "
    "cross-container re-encodes pair; byte-profile hash on fake8) fed "
    "through the shared banded hamming search. Catches re-encoded and "
    "lightly perturbed images byte-exact dedup misses; pixels touched "
    "once.",
)
def q_e5_image_neardup(spark, sf_dir):
    return M.image_neardup_pairs(_docs(spark, sf_dir), png_every=7, jpeg_every=5)


@register(
    "q_e5_video_features",
    None,  # Y4M decode is Python-side (Arrow mapInPandas) — rows-only;
    # codec roundtrip and hand-computed features pinned in
    # tests/test_llm_ops.py
    "E5 (video) — real uncompressed-video decode: every 9th doc carries "
    "a deterministic YUV4MPEG2 clip parsed by the pure-stdlib Y4M codec "
    "(header walk + raw C420 planes); features are dimensions, frame "
    "count, duration, mean luma, and inter-frame motion. Compressed "
    "containers stay behind the NotImplementedError guard.",
)
def q_e5_video(spark, sf_dir):
    return M.video_features(_docs(spark, sf_dir), y4m_every=9)


@register(
    "q_e5_video_frame_hashes",
    None,  # decode + perceptual hash are Python-side — rows-only;
    # frame-identity and cross-clip collision pinned in pytest
    "E5 (video -> image bridge) — true frame sampling: decode the Y4M "
    "stream, re-encode every 2nd luma frame as a standalone PNG, and "
    "fingerprint each with the 8x8 average hash — the composition that "
    "feeds video frames into the image near-dup machinery.",
)
def q_e5_video_frames(spark, sf_dir):
    frames = M.sample_video_frames(_docs(spark, sf_dir), y4m_every=9, stride=2)
    return M.frame_ahash(frames)


@register(
    "q_e5_video_neardup",
    None,  # frame hashing is Python-side — rows-only; planted
    # shared-frame clips pinned in pytest
    "E5 x E2 — clip-level near-dup: two clips pair when they share >= 2 "
    "distinct frame fingerprints (re-posted/re-cut footage detection). "
    "Inverted index on the frame hash — one shuffle, never clip x clip; "
    "max_freq drops non-discriminative hashes (intro cards, black "
    "frames) like stopword shingles.",
)
def q_e5_video_neardup(spark, sf_dir):
    frames = M.frame_ahash(
        M.sample_video_frames(_docs(spark, sf_dir), y4m_every=9, stride=1)
    )
    return M.clip_pairs_by_shared_frames(frames, min_shared=2)


@register(
    "q_e5_audio_neardup",
    None,  # WAV decode + energy hashing are Python-side — rows-only;
    # amplitude-invariance and planted-pair cases pinned in pytest
    "E5 x E2 (audio) — near-dup clips: per-clip 64-window RMS energy "
    "profile thresholded against its mean (amplitude-invariant — "
    "volume-normalized re-encodes collide with their source), fed "
    "through the shared banded hamming search.",
)
def q_e5_audio_neardup(spark, sf_dir):
    return M.audio_neardup_pairs(_docs(spark, sf_dir), wav_every=5)


# ---------------------------------------------------------------------------
# E6 — time-series similarity
# ---------------------------------------------------------------------------

@register(
    "q_e6_timeseries_similarity",
    """
    WITH prof AS (
        SELECT user_id, date_trunc('hour', ts) AS bucket,
               sum(CAST(value AS DECIMAL(38,6))) AS hour_sum
        FROM events WHERE user_id < 40 GROUP BY 1, 2
    ),
    d AS (
        SELECT a.user_id AS user_a, b.user_id AS user_b,
               sum(abs(a.hour_sum - b.hour_sum)) AS dist,
               count(*) AS n_common
        FROM prof a JOIN prof b USING (bucket)
        WHERE a.user_id < b.user_id
        GROUP BY 1, 2
        HAVING count(*) >= 3
    ),
    sym AS (
        SELECT user_a, user_b, dist FROM d
        UNION ALL
        SELECT user_b AS user_a, user_a AS user_b, dist FROM d
    ),
    ranked AS (
        SELECT user_a, user_b, CAST(dist AS DOUBLE) AS dist,
               row_number() OVER (PARTITION BY user_a
                                  ORDER BY dist ASC, user_b ASC) AS nn_rank
        FROM sym
    )
    SELECT user_a, user_b, nn_rank, dist FROM ranked WHERE nn_rank <= 3
    """,
    "E6 — time-series similarity: per-user hourly DECIMAL profiles, "
    "Manhattan distance on co-active hours, top-3 nearest per user. "
    "Exact decimal end-to-end (order-independent sums).",
)
def q_e6(spark, sf_dir):
    out = S.timeseries_similarity_topk(_events(spark, sf_dir), k=3, max_users=40)
    # long cast: Spark row_number is int32, DuckDB int64
    return out.withColumnRenamed("rank", "nn_rank").select(
        "user_a", "user_b", F.col("nn_rank").cast("long").alias("nn_rank"), "dist"
    )


@register(
    "q_e6_dtw_rerank",
    None,  # DTW is not SQL-expressible; properties pinned in pytest
    "E6 variant — two-stage similarity: Manhattan-on-common-hours "
    "candidates reranked by banded DTW over dense 24-h profiles "
    "(phase-shift-tolerant); DTW cost scales with the candidate list, "
    "never the corpus",
)
def q_e6_dtw(spark, sf_dir):
    out = S.dtw_rerank_topk(_events(spark, sf_dir), k=3, max_users=40)
    return out


@register(
    "q_e3_pca_reduce",
    None,  # SVD basis is data-dependent — rows-only; orthonormality,
    # determinism, exact-projection, k==dim roundtrip, and recall on a
    # planted low-rank corpus pinned in pytest
    "E3 — PCA dimensionality reduction (the standard pre-ANN "
    "compression: cut the embedding dim before indexing): a k=16 basis "
    "trained driver-side on the deterministic hash-sample (corpus-size-"
    "independent, SVD sign-fixed so the basis is reproducible), then "
    "every vector projected (x - mean) @ V.T via one broadcast + one "
    "numpy matmul per Arrow batch — no shuffle. Output keeps the "
    "(vec_id, embedding) shape so it drops into every downstream "
    "consumer (ANN, SemDeDup, domain diversity) unchanged.",
)
def q_e3_pca_reduce(spark, sf_dir):
    out = S.pca_reduce(_emb(spark, sf_dir), k=16)
    # rows-only driver check wants a stable scalar-ish projection:
    # report per-vector the reduced dim and the first component value
    return out.select(
        "vec_id",
        F.size("embedding").alias("reduced_dim"),
        F.round(F.col("embedding")[0], 6).alias("pc1"),
    )


@register(
    "q_e3_embedding_profile",
    """
    WITH e AS (
        SELECT unnest(embedding) AS v,
               generate_subscripts(embedding, 1) - 1 AS pos
        FROM embeddings
    )
    SELECT pos, COUNT(*) AS n,
           CAST(SUM(CAST(CAST(v AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(*) AS mean_v,
           MIN(CAST(v AS DOUBLE)) AS min_v,
           MAX(CAST(v AS DOUBLE)) AS max_v
    FROM e GROUP BY pos
    """,
    "E3 diagnostics — per-dimension embedding-corpus profile (count, "
    "exact mean, min, max): dead-dimension / biased-encoder / scale-"
    "drift checks, the first pass over any new embedding dump. One "
    "posexplode + one map-side-combined groupBy on the dimension index "
    "— dim-sized output, DECIMAL-quantized means for bit-exact "
    "cross-engine parity.",
)
def q_e3_embedding_profile(spark, sf_dir):
    return S.embedding_profile(_emb(spark, sf_dir))


@register(
    "q_e3_random_projection",
    None,  # the projection matrix is seed-derived, not SQL-expressible —
    # rows-only; JL recall on the ISOTROPIC fixture corpus (where PCA
    # legitimately fails) pinned in pytest
    "E3 — Johnson-Lindenstrauss random projection (seeded Gaussian "
    "matrix, 1/sqrt(k) scale, frozen legacy-RandomState generator so "
    "the matrix reproduces from the seed alone): distance-preserving "
    "dimensionality reduction for ANY distribution — the complement of "
    "PCA, which needs low-rank structure. One broadcast + one numpy "
    "matmul per Arrow batch, no shuffle.",
)
def q_e3_random_projection(spark, sf_dir):
    out = S.random_project(_emb(spark, sf_dir), k=24)
    return out.select(
        "vec_id",
        F.size("embedding").alias("reduced_dim"),
        F.round(F.col("embedding")[0], 6).alias("rp1"),
    )


@register(
    "q_e2_incremental_semdedup",
    None,  # k-means cells + union-find survivorship are engine-side —
    # rows-only; the REAL check runs in-query: the maintained state's
    # survivor set is asserted EQUAL to the one-shot operator under the
    # same frozen quantizer, and equality under arbitrary batch splits
    # is pinned in tests/test_incremental_semdedup.py
    "E2 — incrementally-MAINTAINED SemDeDup (round 11, deployment "
    "form): embeddings ingested as three micro-batches into a "
    "versioned codes+pairs state under a frozen first-batch quantizer "
    "(one bounded within-cell candidate shuffle per batch, never "
    "all-pairs); survivors served via union-find over the accumulated "
    "pair graph. In-query assert: maintained survivors == one-shot "
    "semantic_dedup(centroids=frozen) over the same corpus; a replayed "
    "batch is skipped exactly-once. The one-shot audit is gated by "
    "SPARK_GRAFT_SEMDEDUP_AUDIT (default on): bench.py turns it off so "
    "the headline measures the maintained build+serve, not its own "
    "oracle (round-11 verdict 'wrong #1'); the equality stays pinned "
    "x3 seeds in tests/test_incremental_semdedup.py and driver-checked "
    "via this query's default-on form.",
)
def q_e2_incremental_semdedup(spark, sf_dir):
    import os as _os

    from ..streaming.semdedup import IncrementalSemDeDupSink
    from .scratch import scratch_root

    emb = _emb(spark, sf_dir).select("vec_id", "embedding", "label")
    root = scratch_root("incremental_semdedup")
    # n_cells ∝ corpus (the paper's discipline, same knob as the batch
    # form's auto-sizing): bounded in-cell quadratic work at every SF
    n_cells = max(8, emb.count() // S.SEMDEDUP_TARGET_CELL_SIZE)
    sink = IncrementalSemDeDupSink(
        root, eps=0.45, n_cells=n_cells, max_cell=100_000
    )
    for bid in range(3):
        sink.process_batch(
            emb.filter(F.col("vec_id") % 3 == bid).select(
                "vec_id", "embedding"
            ),
            bid,
        )
    sink.process_batch(  # redelivery: must be a no-op
        emb.filter(F.col("vec_id") % 3 == 1).select("vec_id", "embedding"), 1
    )
    surv = sink.survivors(spark, keep="min_id")
    if _os.environ.get("SPARK_GRAFT_SEMDEDUP_AUDIT", "1") != "0":
        want = S.semantic_dedup(
            emb, eps=0.45, keep="min_id", centroids=sink.centroids()
        ).select(F.col("vec_id").alias("vid"))
        n_sym_diff = (
            surv.join(want, "vid", "full_outer")
            .filter(surv["vid"].isNull() | want["vid"].isNull())
            .count()
        )
        assert n_sym_diff == 0, (
            f"maintained survivors diverge from one-shot by {n_sym_diff} ids"
        )
    return surv.join(
        emb.select(F.col("vec_id").alias("vid"), "label"), "vid"
    ).select("vid", "label")


@register(
    "q_e2_semdedup_serve",
    """
    WITH RECURSIVE e AS (SELECT vec_id, embedding, label FROM embeddings
               WHERE vec_id < 400),
    p AS (
        SELECT a.vec_id AS u, b.vec_id AS v
        FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
    ),
    edges AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
    reach(u, lbl) AS (
        SELECT u, u FROM (SELECT u FROM edges UNION SELECT v FROM edges)
        UNION
        SELECT e2.v, r.lbl FROM reach r JOIN edges e2 ON e2.u = r.u
    ),
    comp AS (SELECT u AS vec_id, min(lbl) AS component FROM reach GROUP BY u)
    SELECT e.vec_id AS vid, e.label FROM e
    WHERE e.vec_id NOT IN
        (SELECT vec_id FROM comp WHERE vec_id <> component)
    """,
    "E2 — maintained SemDeDup, SERVE-scoped and ORACLE-checked (round "
    "12): the same 3-micro-batch build + exactly-once redelivery skip "
    "+ union-find serve as q_e2_incremental_semdedup, but over the "
    "exact-mode slice (vec_id < 400, single cell) so the survivors "
    "are RELATIONALLY reproducible — the recursive-CTE connected-"
    "components oracle q_e2_semantic_dedup uses, verbatim. This puts "
    "the maintained pipeline's end state under the driver's DuckDB "
    "value-hash (the full-corpus clustered form is rows-only by "
    "necessity; its incremental==one-shot equality is asserted "
    "in-query there and pinned x3 seeds in pytest).",
)
def q_e2_semdedup_serve(spark, sf_dir):
    from ..streaming.semdedup import IncrementalSemDeDupSink
    from .scratch import scratch_root

    emb = (
        _emb(spark, sf_dir)
        .filter(F.col("vec_id") < 400)
        .select("vec_id", "embedding", "label")
    )
    root = scratch_root("semdedup_serve")
    sink = IncrementalSemDeDupSink(
        root, eps=0.45, n_cells=1, max_cell=100_000
    )
    for bid in range(3):
        sink.process_batch(
            emb.filter(F.col("vec_id") % 3 == bid).select(
                "vec_id", "embedding"
            ),
            bid,
        )
    sink.process_batch(  # redelivery: must be a no-op
        emb.filter(F.col("vec_id") % 3 == 2).select("vec_id", "embedding"), 2
    )
    surv = sink.survivors(spark, keep="min_id")
    return surv.join(
        emb.select(F.col("vec_id").alias("vid"), "label"), "vid"
    ).select("vid", "label")
