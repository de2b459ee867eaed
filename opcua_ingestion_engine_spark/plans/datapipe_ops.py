"""E8 — dataset-assembly queries (operators/datapipe.py) with DuckDB
oracles. All four are exactly reproducible in ANSI SQL because the
operators hash with md5 (portable) and express fractions as hex-prefix
thresholds — the oracle embeds the SAME threshold literals computed by
``frac_hex`` at registration time, so Spark and DuckDB compare the same
strings against the same hashes."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401 (parity with sibling modules)

from .. import catalog as C
from ..operators import datapipe as DP
from ..operators.text import LANG_STOPWORDS as _T_STOPWORDS
from .registry import register


def _docs(spark, sf_dir):
    return C.load_table(spark, sf_dir, "documents")


_SALT = "split-v1"
_SAMPLE_SALT = "sample-v1"
_RATES = {"en": 0.25, "de": 1.0, "fr": 0.5}
_DEFAULT_RATE = 0.1


_SW_EN = ", ".join(f"'{w}'" for w in _T_STOPWORDS["en"])


def _sql_bucket(salt: str) -> str:
    return f"substr(md5('{salt}' || ':' || CAST(doc_id AS VARCHAR)), 1, 4)"


# 8-gram SQL mirror of text.word_ngrams(n=8): docs shorter than 8 words
# collapse to a single whole-text gram on both sides.
def _sql_8grams(t: str = "text") -> str:
    w = f"string_split({t}, ' ')"
    parts = " || ' ' || ".join(f"{w}[i+{j}]" for j in range(8))
    return f"""CASE WHEN len({w}) >= 8
        THEN list_transform(range(1, len({w}) - 6), i -> {parts})
        ELSE [{t}] END"""


@register(
    "q_e8_split_assignment",
    f"""
    SELECT doc_id,
           CASE WHEN {_sql_bucket(_SALT)} < '{DP.frac_hex(0.8)}' THEN 'train'
                WHEN {_sql_bucket(_SALT)} < '{DP.frac_hex(0.9)}' THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    "E8 — deterministic train/val/test split (80/10/10) by md5(salt, "
    "doc_id) hex-prefix buckets; pure projection, assignment stable under "
    "corpus growth",
)
def q_e8_split(spark, sf_dir):
    return DP.split_assign(_docs(spark, sf_dir), salt=_SALT, train=0.8, val=0.1)


@register(
    "q_e8_stratified_sample",
    f"""
    SELECT doc_id, lang FROM documents
    WHERE {_sql_bucket(_SAMPLE_SALT)} <
          CASE lang
               WHEN 'de' THEN '{DP.frac_hex(1.0)}'
               WHEN 'en' THEN '{DP.frac_hex(0.25)}'
               WHEN 'fr' THEN '{DP.frac_hex(0.5)}'
               ELSE '{DP.frac_hex(_DEFAULT_RATE)}' END
    """,
    "E8 — stratified corpus mixing: per-language keep rates (keep all de, "
    "half fr, quarter en, 10% otherwise) via the same deterministic "
    "buckets; projection + filter, no shuffle",
)
def q_e8_sample(spark, sf_dir):
    return DP.stratified_sample(
        _docs(spark, sf_dir), _RATES, salt=_SAMPLE_SALT, default_rate=_DEFAULT_RATE
    )


@register(
    "q_e8_contamination",
    f"""
    WITH bench AS (
        SELECT DISTINCT unnest(list_distinct({_sql_8grams()})) AS g
        FROM documents WHERE doc_id % 97 = 0
    ),
    corpus AS (
        SELECT doc_id, list_distinct({_sql_8grams()}) AS gs
        FROM documents WHERE doc_id % 97 <> 0
    ),
    hits AS (
        SELECT DISTINCT c.doc_id
        FROM corpus c, bench b
        WHERE list_contains(c.gs, b.g)
    )
    SELECT c.doc_id, (h.doc_id IS NOT NULL) AS contaminated
    FROM corpus c LEFT JOIN hits h ON c.doc_id = h.doc_id
    """,
    "E8 — benchmark-contamination flags: corpus docs sharing any word-"
    "8-gram with the benchmark set (fixture stand-in: doc_id % 97 = 0). "
    "Inverted-index semi-join on the gram — never doc-x-doc",
)
def q_e8_contamination(spark, sf_dir):
    return DP.contamination_flags(_docs(spark, sf_dir), n=8, bench_mod=97)


@register(
    "q_e8_leakage_free_split",
    f"""
    WITH RECURSIVE s AS (
        SELECT doc_id, lang,
               CASE WHEN len(string_split(text, ' ')) >= 3
                    THEN list_distinct(list_transform(
                         range(1, len(string_split(text, ' ')) - 1),
                         i -> string_split(text, ' ')[i] || ' ' ||
                              string_split(text, ' ')[i+1] || ' ' ||
                              string_split(text, ' ')[i+2]))
                    ELSE [text] END AS sh
        FROM documents
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
    comp AS (
        SELECT u AS doc_id, min(lbl) AS component FROM reach GROUP BY u
    ),
    keyed AS (
        SELECT d.doc_id, coalesce(c.component, d.doc_id) AS rep
        FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
    )
    SELECT doc_id,
           CASE WHEN substr(md5('{_SALT}' || ':' || CAST(rep AS VARCHAR)), 1, 4)
                     < '{DP.frac_hex(0.8)}' THEN 'train'
                WHEN substr(md5('{_SALT}' || ':' || CAST(rep AS VARCHAR)), 1, 4)
                     < '{DP.frac_hex(0.9)}' THEN 'val'
                ELSE 'test' END AS split
    FROM keyed
    """,
    "E8 — LEAKAGE-FREE split assignment: the prevention half of the "
    "split_leakage audit. Near-dup clusters (connected components over "
    "the >= 0.2 Jaccard pair graph) are split as UNITS — the md5 bucket "
    "keys on the cluster representative, so no near-dup pair can "
    "straddle train/test by construction. Singletons hash exactly like "
    "split_assignment; joining a cluster adopts its assignment.",
)
def q_e8_leakage_free_split(spark, sf_dir):
    return DP.split_assign_cluster_safe(
        _docs(spark, sf_dir), salt=_SALT, train=0.8, val=0.1, threshold=0.2
    )


@register(
    "q_e8_pack_chunks",
    """
    SELECT doc_id, lang,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(sum(len(string_split(text, ' ')))
                    OVER (PARTITION BY lang ORDER BY doc_id)
                - len(string_split(text, ' ')) AS BIGINT) AS start_offset,
           CAST(floor((sum(len(string_split(text, ' ')))
                    OVER (PARTITION BY lang ORDER BY doc_id)
                - len(string_split(text, ' '))) / 2048.0) AS BIGINT) AS chunk_id
    FROM documents
    """,
    "E8 — concat-and-chunk packing: per-language running token offsets "
    "cut into 2048-token training chunks (one window sort per shard; "
    "the global single-stream order is deliberately avoided — a whole-"
    "corpus window is a single-partition sort at scale)",
)
def q_e8_pack(spark, sf_dir):
    return DP.pack_chunks(_docs(spark, sf_dir), max_tokens=2048)


# The oracle embeds the SAME pattern objects the operator executes
# (operators/text.PII_PATTERNS) — an independent literal copy here would
# silently keep checking the old pattern after an operator-side edit.
from ..operators.text import PII_PATTERNS as _PII  # noqa: E402

_PII_EMAIL, _PII_IP, _PII_PHONE = (p for _n, p, _r in _PII)


@register(
    "q_e4_pii_redact",
    f"""
    WITH s0 AS (SELECT doc_id, text AS t0 FROM documents),
    s1 AS (SELECT doc_id, t0,
                  regexp_replace(t0, '{_PII_EMAIL}', '<EMAIL>', 'g') AS t1
           FROM s0),
    s2 AS (SELECT doc_id, t0, t1,
                  regexp_replace(t1, '{_PII_IP}', '<IP>', 'g') AS t2
           FROM s1)
    SELECT doc_id,
           regexp_replace(t2, '{_PII_PHONE}', '<PHONE>', 'g') AS clean_text,
           CAST(len(regexp_extract_all(t0, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(t1, '{_PII_IP}')) AS BIGINT) AS n_ip,
           CAST(len(regexp_extract_all(t2, '{_PII_PHONE}')) AS BIGINT) AS n_phone
    FROM s2
    """,
    "E4 — PII redaction: emails, IPv4s, and phone-like digit runs replaced "
    "with typed placeholders; per-class counts on the text each pattern "
    "actually sees. Patterns restricted to the Java/RE2-identical regex "
    "subset; chained regexp_replace stays in whole-stage codegen, one "
    "scan, no shuffle.",
)
def q_e4_pii(spark, sf_dir):
    from ..operators.text import redact_pii

    return redact_pii(_docs(spark, sf_dir))


# Positional 2-gram mirror of text.word_ngrams(n=2).
def _sql_2grams(t: str = "text") -> str:
    w = f"string_split({t}, ' ')"
    return f"""CASE WHEN len({w}) >= 2
        THEN list_transform(range(1, len({w})), i -> {w}[i] || ' ' || {w}[i+1])
        ELSE [{t}] END"""


@register(
    "q_e4_repetition",
    f"""
    WITH w AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n,
               unnest(string_split(text, ' ')) AS g
        FROM documents
    ),
    wc AS (SELECT doc_id, n, g, count(*) AS c FROM w GROUP BY doc_id, n, g),
    wm AS (SELECT doc_id, max(n) AS n_tokens, max(c) AS m FROM wc GROUP BY doc_id),
    b AS (
        SELECT doc_id, len(bg) AS nb, unnest(bg) AS g
        FROM (SELECT doc_id, {_sql_2grams()} AS bg FROM documents)
    ),
    bc AS (SELECT doc_id, nb, g, count(*) AS c FROM b GROUP BY doc_id, nb, g),
    bm AS (SELECT doc_id, max(nb) AS nb, max(c) AS mb FROM bc GROUP BY doc_id)
    SELECT wm.doc_id,
           CAST(wm.n_tokens AS BIGINT) AS n_tokens,
           CAST(wm.m AS DOUBLE) / wm.n_tokens AS top_word_frac,
           CAST(bm.mb AS DOUBLE) / bm.nb AS top_bigram_frac
    FROM wm JOIN bm ON wm.doc_id = bm.doc_id
    """,
    "E4 — Gopher-style repetition signals: fraction of tokens taken by "
    "the most frequent word / of bigram slots by the most frequent "
    "bigram. Two explode->count->max pipelines on (doc_id, gram) keys "
    "(high cardinality, map-side partial counts), joined on doc_id.",
)
def q_e4_repetition(spark, sf_dir):
    from ..operators.text import repetition_metrics

    return repetition_metrics(_docs(spark, sf_dir))


_HH_FRAC = 0.002

@register(
    "q_e4_heavy_hitters",
    f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    )
    SELECT token, CAST(count(*) AS BIGINT) AS cnt
    FROM toks
    GROUP BY token
    HAVING count(*) > {_HH_FRAC} * (SELECT count(*) FROM toks)
    """,
    "E4 — corpus heavy hitters (tokens above 0.2% of all tokens), EXACT "
    "via sketch-then-verify: per-partition Misra-Gries summaries bound "
    "the candidate set (no full-vocabulary shuffle), then an exact "
    "recount of candidates only. The oracle recomputes the answer the "
    "naive way; equality proves the sketch pruned nothing it shouldn't.",
)
def q_e4_heavy_hitters(spark, sf_dir):
    from ..operators.text import frequent_tokens

    return frequent_tokens(_docs(spark, sf_dir), min_frac=_HH_FRAC)


@register(
    "q_e4_unigram_logprob",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    vocab AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
    tot AS (SELECT sum(cnt) AS total FROM vocab)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           -CAST(sum(CAST(ln(v.cnt / tot.total) AS DECIMAL(38,6))) AS DOUBLE)
               / count(*) AS nll
    FROM toks t JOIN vocab v USING (token), tot
    GROUP BY t.doc_id
    """,
    "E4 — unigram-LM quality score: per-doc mean negative log-probability "
    "of its tokens under the corpus's own unigram distribution (the cheap "
    "stand-in for perplexity filtering). Addends cast to DECIMAL(38,6) "
    "before the per-doc sum (order-independent, oracle-exact); vocab "
    "shuffle-joined on token, never assumed broadcastable.",
)
def q_e4_unigram_logprob(spark, sf_dir):
    from ..operators.text import unigram_logprob

    return unigram_logprob(_docs(spark, sf_dir))


@register(
    "q_e4_bpe_train",
    None,  # iterative (one argmax per round) — not SQL-expressible;
    # exact equality vs a pure-Python reference model pinned in pytest
    "E4 — BPE tokenizer induction (Sennrich-style merges) over the "
    "distinct-word frequency table: corpus-size-independent state, one "
    "pair-count shuffle + one vectorized merge application per round, "
    "ONE argmax row to the driver per round",
)
def q_e4_bpe_train(spark, sf_dir):
    from ..operators import bpe as B

    merges = B.bpe_train(_docs(spark, sf_dir), n_merges=8)
    return spark.createDataFrame(
        [(i, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "rank int, left string, right string, weighted_count long",
    )


@register(
    "q_e4_bpe_segment",
    None,  # depends on the learned merge table — rows-only; model parity
    # and fertility bounds pinned in pytest
    "E4 — apply learned BPE merges to every document (greedy lowest-rank "
    "merging per word, merge table in the Arrow UDF closure): per-doc "
    "whitespace vs BPE token counts + fertility ratio",
)
def q_e4_bpe_segment(spark, sf_dir):
    from ..operators import bpe as B

    docs = _docs(spark, sf_dir)
    return B.bpe_segment(docs, B.bpe_train(docs, n_merges=8))


@register(
    "q_e4_incremental_heavy_hitters",
    f"""
    WITH toks AS (
        SELECT unnest(string_split(text, ' ')) AS token FROM documents
    )
    SELECT token, CAST(count(*) AS BIGINT) AS cnt
    FROM toks
    GROUP BY token
    HAVING count(*) > {_HH_FRAC} * (SELECT count(*) FROM toks)
    """,
    "E4 (streaming-incremental form, batch-driven here) — documents fed "
    "through the Misra-Gries foreachBatch sink in 3 interleaved "
    "micro-batches; the merged sketch's candidates are exact-verified "
    "over the accumulated corpus, so the answer EQUALS the batch "
    "operator's (same oracle) no matter how the stream was batched",
)
def q_e4_incremental_hh(spark, sf_dir):
    from ..streaming.heavyhitters import IncrementalHeavyHittersSink

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    sink = IncrementalHeavyHittersSink(capacity=1000)
    for i in range(3):
        sink.process_batch(docs.filter(F.col("doc_id") % 3 == i), i)
    return sink.result(min_frac=_HH_FRAC)


@register(
    "q_e4_token_entropy",
    """
    WITH c AS (
        SELECT doc_id, token, count(*) AS c
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents)
        GROUP BY doc_id, token
    ),
    d AS (SELECT doc_id, sum(c) AS n, count(*) AS nd FROM c GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(d.n AS BIGINT) AS n_tokens,
           CAST(d.nd AS BIGINT) AS n_distinct,
           -CAST(sum(CAST((c.c / d.n) * ln(c.c / d.n) AS DECIMAL(38,6)))
                 AS DOUBLE) AS entropy
    FROM c JOIN d USING (doc_id)
    GROUP BY d.doc_id, d.n, d.nd
    """,
    "E4 — per-doc Shannon entropy of the token distribution (nats): the "
    "diversity signal that catches even-cycle repetition the top-word "
    "fraction misses. One explode + (doc,token) count + per-doc "
    "aggregate; p*ln(p) terms quantized to DECIMAL(38,6) before the "
    "(order-independent) sum",
)
def q_e4_token_entropy(spark, sf_dir):
    from ..operators.text import token_entropy

    return token_entropy(_docs(spark, sf_dir))


@register(
    "q_e8_split_leakage",
    f"""
    WITH sp AS (
        SELECT doc_id,
               CASE WHEN {_sql_bucket(_SALT)} < '{DP.frac_hex(0.8)}' THEN 'train'
                    WHEN {_sql_bucket(_SALT)} < '{DP.frac_hex(0.9)}' THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    ),
    s AS (
        SELECT doc_id, lang,
               CASE WHEN len(string_split(text, ' ')) >= 3
                    THEN list_distinct(list_transform(
                         range(1, len(string_split(text, ' ')) - 1),
                         i -> string_split(text, ' ')[i] || ' ' ||
                              string_split(text, ' ')[i+1] || ' ' ||
                              string_split(text, ' ')[i+2]))
                    ELSE [text] END AS sh
        FROM documents
    ),
    pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS inter,
               len(a.sh) AS na, len(b.sh) AS nb
        FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id
    )
    SELECT p.doc_a, p.doc_b, sa.split AS split_a, sb.split AS split_b,
           CAST(p.inter AS DOUBLE) / (p.na + p.nb - p.inter) AS jaccard
    FROM pairs p
    JOIN sp sa ON sa.doc_id = p.doc_a
    JOIN sp sb ON sb.doc_id = p.doc_b
    WHERE CAST(p.inter AS DOUBLE) / (p.na + p.nb - p.inter) >= 0.2
      AND sa.split <> sb.split
    """,
    "E8 — train/test LEAKAGE audit: near-duplicate pairs whose members "
    "land in different splits (the contamination an id-hash split cannot "
    "prevent when near-dups share no id). Composes the deterministic "
    "split assignment with the exact Jaccard pair stage; the split "
    "frames ride the pair output as broadcast joins. The fix pipeline "
    "is E2 dedup BEFORE splitting — this query is the detector that "
    "proves you need it",
)
def q_e8_split_leakage(spark, sf_dir):
    from ..operators.dedup import jaccard_pairs

    docs = _docs(spark, sf_dir)
    splits = DP.split_assign(docs, salt=_SALT, train=0.8, val=0.1)
    pairs = jaccard_pairs(docs, threshold=0.2)
    sa = splits.select(F.col("doc_id").alias("doc_a"),
                       F.col("split").alias("split_a"))
    sb = splits.select(F.col("doc_id").alias("doc_b"),
                       F.col("split").alias("split_b"))
    return (
        pairs.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("doc_a", "doc_b", "split_a", "split_b", "jaccard")
    )


_MIX_SALT = "mix-v1"
_MIX_TOTAL = 120


@register(
    "q_e8_domain_mix",
    f"""
    WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
    d AS (SELECT CAST(sum(CAST(power(n, 0.5) AS DECIMAL(38,6))) AS DOUBLE) AS d
          FROM counts),
    quotas AS (
        SELECT source, CAST(floor(power(n, 0.5) / d.d * {_MIX_TOTAL}) AS BIGINT)
               AS quota
        FROM counts, d
    ),
    ranked AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('{_MIX_SALT}' || ':' || CAST(doc_id AS VARCHAR)),
                            doc_id) AS rk
        FROM documents
    )
    SELECT r.doc_id, r.source
    FROM ranked r JOIN quotas q USING (source)
    WHERE r.rk <= q.quota
    """,
    "E8 — temperature-scaled domain mixing (count^0.5 weights, the "
    "multilingual up/down-sampling recipe): per-source quotas filled in "
    "deterministic md5-bucket order. One config-sized groupBy for counts "
    "(broadcast back), one window sort per domain.",
)
def q_e8_domain_mix(spark, sf_dir):
    return DP.domain_mix_quota(
        _docs(spark, sf_dir), alpha=0.5, total=_MIX_TOTAL,
        strata_col="source", salt=_MIX_SALT,
    )


_SHUF_SALT = "shuffle-v1"
_N_SHARDS = 8


@register(
    "q_e8_global_shuffle",
    f"""
    WITH h AS (
        SELECT doc_id,
               md5('{_SHUF_SALT}' || ':' || CAST(doc_id AS VARCHAR)) AS hx
        FROM documents
    )
    SELECT doc_id,
           CAST(('0x' || substr(hx, 1, 4))::BIGINT % {_N_SHARDS} AS BIGINT)
               AS shard,
           CAST(row_number() OVER (
                    PARTITION BY ('0x' || substr(hx, 1, 4))::BIGINT % {_N_SHARDS}
                    ORDER BY hx, doc_id) - 1 AS BIGINT) AS position
    FROM h
    """,
    "E8 — deterministic corpus-scale shuffle into training shards: the "
    "dataloader permutation precomputed at corpus-build time. Shard = "
    "hash bucket, position = hash rank within shard; each shard sorts "
    "independently — never a global single-partition sort.",
)
def q_e8_global_shuffle(spark, sf_dir):
    return DP.global_shuffle(
        _docs(spark, sf_dir), n_shards=_N_SHARDS, salt=_SHUF_SALT
    )


@register(
    "q_e8_quality_topk",
    f"""
    WITH scored AS (
        SELECT doc_id, source,
               CAST(len(list_filter(string_split(text, ' '),
                        w -> w IN ({_SW_EN}))) AS DOUBLE)
                   / len(string_split(text, ' ')) AS score
        FROM documents
    )
    SELECT doc_id, source, score FROM (
        SELECT doc_id, source, score,
               cume_dist() OVER (PARTITION BY source
                                 ORDER BY score DESC, doc_id) AS cd
        FROM scored
    ) WHERE cd <= 0.25
    """,
    "E8 — per-domain quality selection (FineWeb-Edu-style): score every "
    "document, keep the top 25% WITHIN each domain so no domain crowds "
    "out the rest. One scoring projection + one window per domain.",
)
def q_e8_quality_topk(spark, sf_dir):
    return DP.quality_topk_per_domain(
        _docs(spark, sf_dir), keep_frac=0.25, strata_col="source"
    )


_EPOCH_SALT = "epoch-v1"
_REPEATS = {"src1": 2.25, "src2": 0.5, "src3": 0.0}


@register(
    "q_e8_epoch_expand",
    f"""
    WITH c AS (
        SELECT doc_id, source,
               CASE source WHEN 'src1' THEN 2 WHEN 'src2' THEN 0
                           WHEN 'src3' THEN 0 ELSE 1 END
             + CASE WHEN substr(md5('{_EPOCH_SALT}' || ':' ||
                                    CAST(doc_id AS VARCHAR)), 1, 4) <
                         CASE source WHEN 'src1' THEN '{DP.frac_hex(0.25)}'
                                     WHEN 'src2' THEN '{DP.frac_hex(0.5)}'
                                     WHEN 'src3' THEN '{DP.frac_hex(0.0)}'
                                     ELSE '{DP.frac_hex(0.0)}' END
                    THEN 1 ELSE 0 END AS n
        FROM documents
    )
    SELECT doc_id, source, CAST(unnest(range(0, n)) AS BIGINT) AS epoch
    FROM c WHERE n > 0
    """,
    "E8 — up-sampling with repetition (epoch expansion): src1 repeated "
    "2.25x (every doc twice, a deterministic hash-quarter thrice), src2 "
    "halved, src3 dropped, everything else kept once. Bounded explode, "
    "no shuffle; each (doc_id, epoch) row is an independent training "
    "sample for the downstream shuffle/packing stages.",
)
def q_e8_epoch_expand(spark, sf_dir):
    return DP.epoch_expand(
        _docs(spark, sf_dir), _REPEATS, strata_col="source",
        default_repeat=1.0, salt=_EPOCH_SALT,
    )


_CORPUS_BUILD_SQL = f"""
    WITH dd AS (
        SELECT doc_id, text, source,
               row_number() OVER (PARTITION BY sha256(text)
                                  ORDER BY doc_id) AS rn
        FROM documents
    ),
    q AS (
        SELECT doc_id, text, source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM dd
        WHERE rn = 1 AND doc_id % 97 <> 0
          AND len(string_split(text, ' ')) >= 20
          AND CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
                  / len(string_split(text, ' ')) <= 12.0
          AND CAST(len(list_filter(string_split(text, ' '),
                       w -> w IN ({_SW_EN}))) AS DOUBLE)
                  / len(string_split(text, ' ')) >= 0.005
          AND CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                   AS DOUBLE) / greatest(length(text), 1) <= 0.2
    ),
    bench AS (
        SELECT DISTINCT unnest(list_distinct({_sql_8grams()})) AS g
        FROM documents WHERE doc_id % 97 = 0
    ),
    cg AS (
        SELECT doc_id, source, n_tokens,
               unnest(list_distinct({_sql_8grams()})) AS g
        FROM q
    ),
    fl AS (
        SELECT cg.doc_id, cg.source, cg.n_tokens,
               count(b.g) > 0 AS contam
        FROM cg LEFT JOIN bench b USING (g)
        GROUP BY cg.doc_id, cg.source, cg.n_tokens
    )
    SELECT doc_id, source, n_tokens
    FROM fl
    WHERE NOT contam
      AND {_sql_bucket(_SALT)} < '{DP.frac_hex(0.8)}'
    """


@register(
    "q_e8_corpus_build",
    _CORPUS_BUILD_SQL,
    "E8 capstone — the composed corpus build: exact dedup (min-id copy "
    "per sha256 digest) -> C4/Gopher quality gates -> benchmark "
    "decontamination (shared word-8-grams vs the held-out set) -> "
    "deterministic train-split manifest. Exactly TWO corpus scans "
    "(candidate lineage + benchmark grams); the contamination flag "
    "aggregates with the payload riding the gram shuffle, so no "
    "join-back re-scan.",
)
def q_e8_corpus_build(spark, sf_dir):
    from pyspark.sql.window import Window as PW

    from ..operators.text import quality_filter, word_ngrams

    docs = _docs(spark, sf_dir)
    w = PW.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    dd = (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    cand = quality_filter(dd, extra=("text", "source")).filter(
        F.col("doc_id") % 97 != 0
    )
    grams = F.array_distinct(word_ngrams(F.col("text"), 8))
    bench = (
        docs.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode(grams).alias("g"))
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
    flags = (
        cand.select("doc_id", "source", "n_tokens", F.explode(grams).alias("g"))
        .join(bench, "g", "left")
        .groupBy("doc_id", "source", "n_tokens")
        .agg(F.coalesce(F.bool_or("_hit"), F.lit(False)).alias("_contam"))
    )
    h = DP._bucket_hex(F.col("doc_id"), _SALT)
    return (
        flags.filter(~F.col("_contam"))
        .filter(h < F.lit(DP.frac_hex(0.8)))
        .select("doc_id", "source", "n_tokens")
    )


@register(
    "q_e8_incremental_corpus_build",
    _CORPUS_BUILD_SQL,
    "E8 capstone (streaming-incremental form, batch-driven here) — the "
    "corpus build maintained across 3 doc_id-ordered micro-batches "
    "through the foreachBatch sink: cross-batch exact dedup via a "
    "digest-only state table, quality gates, decontamination against "
    "the pinned benchmark gram set, split filter. The final manifest "
    "EQUALS the one-shot batch answer (same oracle) because first-seen "
    "== min-id under ordered ingest.",
)
def q_e8_incremental_corpus_build(spark, sf_dir):
    from ..streaming.corpusbuild import IncrementalCorpusBuildSink

    docs = _docs(spark, sf_dir).select("doc_id", "text", "source")
    hi = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    step = hi // 3 + 1
    sink = IncrementalCorpusBuildSink(
        docs.filter(F.col("doc_id") % 97 == 0)
    )
    for i in range(3):
        sink.process_batch(
            docs.filter(
                (F.col("doc_id") >= i * step)
                & (F.col("doc_id") < (i + 1) * step)
            ),
            i,
        )
    return sink.result()


@register(
    "q_e8_durable_corpus_build",
    _CORPUS_BUILD_SQL,
    "E8 capstone (DURABLE streaming form, batch-driven here) — the "
    "corpus build maintained across 3 doc_id-ordered micro-batches "
    "through the sink's durable mode: the training manifest and the "
    "content-digest dedup guard each land as append-structured "
    "versioned tables (tablefmt.commit_append, batch_id-guarded "
    "sub-commits, digests LAST so a mid-batch crash retries to the "
    "exact state). The manifest is served by a FRESH sink instance — "
    "restart recovery from the committed tables alone — and equals the "
    "one-shot batch answer, sharing its oracle.",
)
def q_e8_durable_corpus_build(spark, sf_dir):
    from ..streaming.corpusbuild import IncrementalCorpusBuildSink
    from .scratch import scratch_root

    docs = _docs(spark, sf_dir).select("doc_id", "text", "source")
    hi = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    step = hi // 3 + 1
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    root = scratch_root("corpussink")
    sink = IncrementalCorpusBuildSink(bench, state_root=root)
    for i in range(3):
        sink.process_batch(
            docs.filter(
                (F.col("doc_id") >= i * step)
                & (F.col("doc_id") < (i + 1) * step)
            ),
            i,
        )
    # a FRESH instance proves the manifest derives from the committed
    # tables alone (restart recovery), not this process's memory
    served = IncrementalCorpusBuildSink(bench, state_root=root)
    return served.result()


# ---------------------------------------------------------------------------
# Versioned-table change feed (operators/tablefmt.py snapshot_diff /
# table_changes) — the CDC surface downstream incremental consumers read
# instead of re-scanning snapshots. The reference's consumers get the
# same effect from Postgres logical decoding over its mutable upsert
# table (Services/OpcSubscribeService.cs:608-612); here it is derived
# from the manifest chain: appends serve O(changes) from tail
# directories, rewrites serve from ONE keyed full-outer diff.
# ---------------------------------------------------------------------------


@register(
    "q_tf_change_feed",
    """
    WITH v0 AS (
        SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 3 <> 0
    ), v1 AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END
                 AS o_orderstatus
        FROM orders WHERE o_orderkey % 5 <> 0
    )
    SELECT n.o_orderkey, n.o_orderstatus,
           'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
    FROM v1 n LEFT JOIN v0 o ON n.o_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT o.o_orderkey, o.o_orderstatus, 'delete', CAST(1 AS BIGINT)
    FROM v0 o LEFT JOIN v1 n ON n.o_orderkey = o.o_orderkey
    WHERE n.o_orderkey IS NULL
    UNION ALL
    SELECT o.o_orderkey, o.o_orderstatus, 'update_preimage', CAST(1 AS BIGINT)
    FROM v0 o JOIN v1 n ON n.o_orderkey = o.o_orderkey
    WHERE o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
    UNION ALL
    SELECT n.o_orderkey, n.o_orderstatus, 'update_postimage',
           CAST(1 AS BIGINT)
    FROM v0 o JOIN v1 n ON n.o_orderkey = o.o_orderkey
    WHERE o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
    """,
    "Table-layer CDC, keyed-diff path — two committed snapshots of an "
    "orders-derived upsert table (v1 drops the %5 keys, flips %7 keys' "
    "status) diffed into a Delta-CDF-shaped change feed: inserts, "
    "deletes, and update pre+post image pairs from ONE full-outer "
    "shuffle on the key with a codegen null-safe struct compare. The "
    "oracle rebuilds the same feed relationally from the two snapshot "
    "definitions.",
)
def q_tf_change_feed(spark, sf_dir):
    from ..operators import tablefmt as TF
    from .scratch import scratch_root

    orders = C.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    v0 = orders.filter(F.col("o_orderkey") % 3 != 0)
    v1 = orders.filter(F.col("o_orderkey") % 5 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    root = scratch_root("cdc")
    TF.commit_version(v0, root)
    TF.commit_version(v1, root)
    return TF.table_changes(spark, root, 0, 1, keys=["o_orderkey"])


@register(
    "q_tf_pruned_read",
    """
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
           MIN(event_id) AS min_id, MAX(event_id) AS max_id
    FROM events
    WHERE event_id >= (SELECT (max(event_id) + 1) * 7 // 10 FROM events)
    GROUP BY event_type
    """,
    "Table-layer data skipping — events committed as four append batches "
    "of contiguous event_id ranges, then an id-range aggregate served "
    "through read_version(prune=): the manifest's per-directory parquet-"
    "footer [min,max] stats drop every directory provably outside the "
    "range driver-side (the Delta add-file-stats discipline), and the "
    "real predicate runs on the one surviving directory. The oracle is "
    "the plain filtered aggregate over the whole table — pruning is an "
    "I/O optimization and must never change the answer.",
)
def q_tf_pruned_read(spark, sf_dir):
    from ..operators import tablefmt as TF
    from .scratch import scratch_root

    ev = C.load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    hi = ev.agg(F.max("event_id")).collect()[0][0] + 1
    step = hi // 4 + 1
    root = scratch_root("pruned_read")
    for i in range(4):
        TF.commit_append(
            ev.filter(
                (F.col("event_id") >= i * step)
                & (F.col("event_id") < (i + 1) * step)
            ),
            root,
        )
    # scale-relative bound (top 30% of the id space) so the prune
    # keeps exactly the tail directories at every SF
    lo = (hi * 7) // 10
    pruned = TF.read_version(spark, root, prune={"event_id": (lo, None)})
    return (
        pruned.filter(F.col("event_id") >= lo)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double").alias("sum_value"),
            F.min("event_id").alias("min_id"),
            F.max("event_id").alias("max_id"),
        )
    )


@register(
    "q_tf_change_feed_append",
    """
    SELECT o_orderkey, o_orderstatus, 'insert' AS _change_type,
           CAST(o_orderkey % 3 AS BIGINT) AS _commit_version
    FROM orders
    """,
    "Table-layer CDC, append fast path — orders committed in three "
    "append-structured batches (key % 3), then the full change feed "
    "served from the manifests' tail directories alone: O(changes) "
    "I/O, zero joins, per-commit version attribution (the oracle "
    "recovers each row's commit from the batch predicate).",
)
def q_tf_change_feed_append(spark, sf_dir):
    from ..operators import tablefmt as TF
    from .scratch import scratch_root

    orders = C.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus"
    )
    root = scratch_root("cdcapp")
    for i in range(3):
        TF.commit_append(
            orders.filter(F.col("o_orderkey") % 3 == i), root
        )
    return TF.table_changes(spark, root, None)


@register(
    "q_tf_minmax_view",
    """
    WITH final AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN 'X'
                    ELSE o_orderstatus END AS o_orderstatus,
               o_totalprice
        FROM orders
        WHERE o_orderkey % 5 <> 0 AND o_totalprice < 250000.0
    )
    SELECT o_orderstatus, COUNT(*) AS n,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM final GROUP BY o_orderstatus
    """,
    "Materialized view with NON-additive MIN/MAX maintenance — an "
    "orders-derived source committed three ways (initial rewrite, pure "
    "append, then an upsert that deletes the %5 keys AND truncates "
    "every price >= 250k — guaranteeing each group loses its stored "
    "maximum — while moving %7 keys to a new status group), with a "
    "per-status COUNT/MIN/MAX view refreshed after every commit. "
    "Appends fold extrema monotonically with zero source reads; the "
    "delete-the-max commit re-aggregates ONLY the dirty groups via a "
    "broadcast semi join on the source snapshot. The oracle recomputes "
    "from the final snapshot definition — incremental must equal "
    "recompute exactly.",
)
def q_tf_minmax_view(spark, sf_dir):
    from ..operators import tablefmt as TF
    from ..operators.matview import MaterializedAggView
    from .scratch import scratch_root

    orders = C.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    src = scratch_root("mv_minmax_src")
    view = MaterializedAggView(
        src,
        scratch_root("mv_minmax_view"),
        group_keys=["o_orderstatus"],
        row_keys=["o_orderkey"],
        min_cols=["o_totalprice"],
        max_cols=["o_totalprice"],
    )
    TF.commit_version(orders.filter(F.col("o_orderkey") % 3 != 0), src)
    view.refresh(spark)
    TF.commit_append(orders.filter(F.col("o_orderkey") % 3 == 0), src)
    view.refresh(spark)
    moved = F.col("o_orderkey") % 7 == 0
    TF.commit_version(
        orders.filter(
            (F.col("o_orderkey") % 5 != 0)
            & (F.col("o_totalprice") < 250000.0)
        ).withColumn(
            "o_orderstatus",
            F.when(moved, F.lit("X")).otherwise(F.col("o_orderstatus")),
        ),
        src,
    )
    view.refresh(spark)
    return view.result(spark).select(
        "o_orderstatus",
        "n",
        F.col("min_o_totalprice").alias("min_price"),
        F.col("max_o_totalprice").alias("max_price"),
    )


@register(
    "q_tf_incremental_view",
    """
    WITH final AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN 'X'
                    ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1000.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 5 <> 0
    )
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             AS sum_price
    FROM final GROUP BY o_orderstatus
    """,
    "Incremental materialized view (operators/matview.py) — an "
    "orders-derived source table committed three ways (initial rewrite, "
    "pure append, then an upsert that deletes the %5 keys and moves the "
    "%7 keys into a new status group with a price bump), with a "
    "GROUP-BY-status COUNT/SUM view refreshed after EVERY commit from "
    "the change feed alone: two refreshes ride the O(changes) append "
    "fast path, the third folds a keyed endpoint diff with group-moving "
    "updates. The oracle recomputes the aggregate from scratch over the "
    "final snapshot definition — incremental must equal recompute at "
    "hash level (DECIMAL(38,6) addends make the fold order-exact).",
)
def q_tf_incremental_view(spark, sf_dir):
    from ..operators import tablefmt as TF
    from ..operators.matview import MaterializedAggView
    from .scratch import scratch_root

    orders = C.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    src = scratch_root("mv_src")
    view = MaterializedAggView(
        src,
        scratch_root("mv_view"),
        group_keys=["o_orderstatus"],
        sum_cols=["o_totalprice"],
        row_keys=["o_orderkey"],
    )
    TF.commit_version(orders.filter(F.col("o_orderkey") % 3 != 0), src)
    view.refresh(spark)
    TF.commit_append(orders.filter(F.col("o_orderkey") % 3 == 0), src)
    view.refresh(spark)
    moved = F.col("o_orderkey") % 7 == 0
    TF.commit_version(
        orders.filter(F.col("o_orderkey") % 5 != 0)
        .withColumn(
            "o_orderstatus",
            F.when(moved, F.lit("X")).otherwise(F.col("o_orderstatus")),
        )
        .withColumn(
            "o_totalprice",
            F.when(moved, F.col("o_totalprice") + 1000.0).otherwise(
                F.col("o_totalprice")
            ),
        ),
        src,
    )
    view.refresh(spark)
    return view.result(spark).select(
        "o_orderstatus",
        "n",
        F.col("sum_o_totalprice").cast("double").alias("sum_price"),
    )


@register(
    "q_tf_delete_where",
    """
    WITH s AS (SELECT max(o_orderkey) // 3 + 1 AS step FROM orders)
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             AS sum_price,
           MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
    FROM orders, s
    WHERE NOT (o_orderkey BETWEEN s.step AND 2 * s.step - 1
               AND o_totalprice >= 150000.0)
    GROUP BY o_orderstatus
    """,
    "Predicate DELETE on the versioned-table layer — orders committed "
    "as three append batches of contiguous o_orderkey ranges, then "
    "delete_where removes the expensive orders of the MIDDLE key range "
    "with bounds={o_orderkey: range}: the manifest's footer stats prove "
    "the first and last directories disjoint driver-side, so they ride "
    "into the new version BY REFERENCE (copy-on-write at directory "
    "granularity, the Delta DELETE discipline — at 100 TB a key-ranged "
    "delete rewrites the intersecting directories, not the table). The "
    "oracle is the NOT(predicate) aggregate over the plain table; the "
    "query also asserts the carried/rewritten split it claims.",
)
def q_tf_delete_where(spark, sf_dir):
    import json

    from ..operators import tablefmt as TF
    from .scratch import scratch_root

    orders = C.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    hi = orders.agg(F.max("o_orderkey")).collect()[0][0]
    step = hi // 3 + 1
    root = scratch_root("tf_delete")
    for i in range(3):
        TF.commit_append(
            orders.filter(
                (F.col("o_orderkey") >= i * step)
                & (F.col("o_orderkey") < (i + 1) * step)
            ),
            root,
        )
    v = TF.delete_where(
        spark,
        root,
        f"o_orderkey BETWEEN {step} AND {2 * step - 1} "
        "AND o_totalprice >= 150000.0",
        bounds={"o_orderkey": (step, 2 * step - 1)},
    )
    with open(TF._manifest_path(root, v)) as f:
        m = json.load(f)
    # the stats-pruned split is part of the contract, not just the answer
    assert m["app"]["carried_dirs"] == 2 and m["app"]["rewritten_dirs"] == 1
    return (
        TF.read_version(spark, root, v)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_price"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
    )


@register(
    "q_tf_update_where",
    """
    WITH s AS (SELECT max(o_orderkey) // 2 + 1 AS cut FROM orders)
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(
               CASE WHEN o_orderkey >= s.cut AND o_orderstatus = 'F'
                    THEN o_totalprice + 1000.0
                    ELSE o_totalprice END AS DECIMAL(38,6))) AS DOUBLE)
             AS sum_price
    FROM orders, s
    GROUP BY o_orderstatus
    """,
    "Predicate UPDATE on the versioned-table layer — orders committed "
    "as two contiguous-key append batches, then update_where raises "
    "o_totalprice for the high key range's 'F' orders with "
    "bounds={o_orderkey: (cut, None)}: the low directory is carried by "
    "reference (stats-proven disjoint), only the high directory is "
    "rewritten, and the SET result is cast back to the committed column "
    "type so the schema cannot drift. Oracle: the equivalent CASE WHEN "
    "recompute over the plain table.",
)
def q_tf_update_where(spark, sf_dir):
    import json

    from ..operators import tablefmt as TF
    from .scratch import scratch_root

    orders = C.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    hi = orders.agg(F.max("o_orderkey")).collect()[0][0]
    cut = hi // 2 + 1
    root = scratch_root("tf_update")
    TF.commit_append(orders.filter(F.col("o_orderkey") < cut), root)
    TF.commit_append(orders.filter(F.col("o_orderkey") >= cut), root)
    v = TF.update_where(
        spark,
        root,
        f"o_orderkey >= {cut} AND o_orderstatus = 'F'",
        {"o_totalprice": "o_totalprice + 1000.0"},
        bounds={"o_orderkey": (cut, None)},
    )
    with open(TF._manifest_path(root, v)) as f:
        m = json.load(f)
    assert m["app"]["carried_dirs"] == 1 and m["app"]["rewritten_dirs"] == 1
    return (
        TF.read_version(spark, root, v)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@register(
    "q_tf_restore",
    """
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             AS sum_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    "Delta-style RESTORE — orders committed, a quarter of the keys "
    "deleted, then restore() rolls the table back by committing a "
    "manifest that lists the pre-delete version's data directories BY "
    "REFERENCE: no data read, copied, or rewritten (O(1) metadata work "
    "at any table size), history preserved. The oracle is the plain "
    "aggregate over the untouched table — a restore must reproduce the "
    "target snapshot exactly; the query also asserts the directory "
    "list was reused verbatim.",
)
def q_tf_restore(spark, sf_dir):
    import json

    from ..operators import tablefmt as TF
    from .scratch import scratch_root

    orders = C.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = scratch_root("tf_restore")
    TF.commit_version(orders, root)
    TF.delete_where(spark, root, "o_orderkey % 4 = 0")
    v = TF.restore(root, 0)
    with open(TF._manifest_path(root, 0)) as f:
        target = json.load(f)
    with open(TF._manifest_path(root, v)) as f:
        m = json.load(f)
    assert TF._data_list(m) == TF._data_list(target)
    return (
        TF.read_version(spark, root, v)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@register(
    "q_tf_schema_evolution",
    """
    SELECT o_orderstatus, COUNT(*) AS n,
           COUNT(CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END)
             AS n_with_priority
    FROM orders
    GROUP BY o_orderstatus
    """,
    "Schema evolution on append commits — even keys committed WITHOUT "
    "the o_orderpriority column, odd keys appended WITH it via "
    "commit_append(evolve=True): the manifest schema becomes the "
    "by-name union and read_version resolves every directory against "
    "it, so pre-evolution rows read NULL for the new column (the Delta "
    "mergeSchema discipline). Oracle: COUNT over a CASE that nulls the "
    "column for exactly the pre-evolution rows.",
)
def q_tf_schema_evolution(spark, sf_dir):
    from ..operators import tablefmt as TF
    from .scratch import scratch_root

    orders = C.load_table(spark, sf_dir, "orders")
    root = scratch_root("tf_evolve")
    TF.commit_append(
        orders.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_orderstatus"
        ),
        root,
    )
    TF.commit_append(
        orders.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_orderstatus", "o_orderpriority"
        ),
        root,
        evolve=True,
    )
    return (
        TF.read_version(spark, root)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.count("o_orderpriority").alias("n_with_priority"),
        )
    )


@register(
    "q_tf_upsert_partial",
    """
    WITH s AS (SELECT max(o_orderkey) // 3 + 1 AS step FROM orders)
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             AS sum_price
    FROM (
        SELECT o_orderkey,
               CASE WHEN o_orderkey BETWEEN s.step AND 2 * s.step - 1
                         AND o_orderkey % 7 = 0
                    THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderkey BETWEEN s.step AND 2 * s.step - 1
                         AND o_orderkey % 7 = 0
                    THEN o_totalprice + 5000.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders, s
    )
    GROUP BY o_orderstatus
    """,
    "Partial MERGE (commit_upsert) — orders committed as three "
    "contiguous-key append batches, then a batch of middle-range key "
    "updates upserted: the batch's own key [min,max] proves the first "
    "directory disjoint (stats carry), the LIMIT-1 key probe clears "
    "the third, and ONLY the middle directory is rewritten (anti-join "
    "matched keys + union batch as one tail dir) — O(touched dirs + "
    "batch) write amplification instead of commit_merge's O(table). "
    "Oracle: the CASE-WHEN recompute; the carried/rewritten split is "
    "asserted in-query.",
)
def q_tf_upsert_partial(spark, sf_dir):
    return _tf_upsert(spark, sf_dir, mor=False)


@register(
    "q_tf_upsert_mor",
    """
    WITH s AS (SELECT max(o_orderkey) // 3 + 1 AS step FROM orders)
    SELECT o_orderstatus, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
             AS sum_price
    FROM (
        SELECT o_orderkey,
               CASE WHEN o_orderkey BETWEEN s.step AND 2 * s.step - 1
                         AND o_orderkey % 7 = 0
                    THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderkey BETWEEN s.step AND 2 * s.step - 1
                         AND o_orderkey % 7 = 0
                    THEN o_totalprice + 5000.0
                    ELSE o_totalprice END AS o_totalprice
        FROM orders, s
    )
    GROUP BY o_orderstatus
    """,
    "Merge-on-read MERGE (commit_upsert(mor=True), Delta's DV-enabled "
    "MERGE) — the same middle-range keyed update as q_tf_upsert_partial "
    "but with ZERO directory rewrites: matched rows are tombstoned via "
    "a deletion-vector sidecar (O(matched) new bytes) and the batch "
    "appended as one tail; the in-query audit pins rewritten_dirs == 0 "
    "and all parent directories carried. Shares the copy-on-write "
    "twin's oracle verbatim — both forms must produce the identical "
    "table.",
)
def q_tf_upsert_mor(spark, sf_dir):
    return _tf_upsert(spark, sf_dir, mor=True)


def _tf_upsert(spark, sf_dir, mor: bool):
    import json

    from ..operators import tablefmt as TF
    from .scratch import scratch_root

    orders = C.load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    hi = orders.agg(F.max("o_orderkey")).collect()[0][0]
    step = hi // 3 + 1
    root = scratch_root("tf_upsert_mor" if mor else "tf_upsert")
    for i in range(3):
        TF.commit_append(
            orders.filter(
                (F.col("o_orderkey") >= i * step)
                & (F.col("o_orderkey") < (i + 1) * step)
            ),
            root,
        )
    batch = (
        orders.filter(
            (F.col("o_orderkey") >= step)
            & (F.col("o_orderkey") < 2 * step)
            & (F.col("o_orderkey") % 7 == 0)
        )
        .withColumn("o_orderstatus", F.lit("X"))
        .withColumn("o_totalprice", F.col("o_totalprice") + 5000.0)
    )
    v = TF.commit_upsert(spark, root, batch, keys=["o_orderkey"], mor=mor)
    with open(TF._manifest_path(root, v)) as f:
        m = json.load(f)
    if mor:
        # merge-on-read: every parent directory carried, zero rewrites,
        # the only new data is the batch tail + the DV sidecar
        assert m["app"]["op"] == "upsert_mor", m["app"]
        assert m["app"]["rewritten_dirs"] == 0, m["app"]
        assert m["app"]["carried_dirs"] == 3, m["app"]
        assert m["app"]["dv_rows"] > 0, m["app"]
    else:
        assert (
            m["app"]["carried_dirs"] == 2
            and m["app"]["rewritten_dirs"] == 1
        )
    return (
        TF.read_version(spark, root, v)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@register(
    "q_tf_avg_view",
    """
    WITH final AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN 'X'
                    ELSE o_orderstatus END AS o_orderstatus,
               CASE WHEN o_orderkey % 11 = 0 THEN NULL
                    ELSE o_totalprice END AS price
        FROM orders WHERE o_orderkey % 5 <> 0
    )
    SELECT o_orderstatus, COUNT(*) AS n, COUNT(price) AS cnt_price,
           CAST(SUM(CAST(price AS DECIMAL(38,6))) AS DOUBLE)
             / CAST(COUNT(price) AS DOUBLE) AS avg_price
    FROM final GROUP BY o_orderstatus
    """,
    "Incremental materialized AVG view (operators/matview.py avg_cols) "
    "— an orders-derived source whose %11 keys carry NULL prices (so "
    "SQL AVG's NULL-skipping denominator is pinned: the state keeps a "
    "per-column NON-NULL count cnt_price next to the DECIMAL(38,6) "
    "sum, and avg = sum/cnt is derived at READ time, never stored), "
    "committed three ways (initial rewrite, pure append, then a "
    "rewrite that deletes the %5 keys and moves the %7 keys to a new "
    "status group) with a refresh after every commit. Purely additive "
    "state — deletes fold as signed addends, no dirty-group recompute. "
    "The oracle recomputes from the final snapshot; the double "
    "division of identical decimal sum and bigint count is "
    "IEEE-deterministic on both engines.",
)
def q_tf_avg_view(spark, sf_dir):
    from ..operators import tablefmt as TF
    from ..operators.matview import MaterializedAggView
    from .scratch import scratch_root

    orders = C.load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 11 != 0, F.col("o_totalprice"))
        .alias("price"),
    )
    src = scratch_root("mv_avg_src")
    view = MaterializedAggView(
        src,
        scratch_root("mv_avg_view"),
        group_keys=["o_orderstatus"],
        avg_cols=["price"],
        row_keys=["o_orderkey"],
    )
    TF.commit_version(orders.filter(F.col("o_orderkey") % 3 != 0), src)
    view.refresh(spark)
    TF.commit_append(orders.filter(F.col("o_orderkey") % 3 == 0), src)
    view.refresh(spark)
    moved = F.col("o_orderkey") % 7 == 0
    TF.commit_version(
        orders.filter(F.col("o_orderkey") % 5 != 0).withColumn(
            "o_orderstatus",
            F.when(moved, F.lit("X")).otherwise(F.col("o_orderstatus")),
        ),
        src,
    )
    view.refresh(spark)
    return view.result(spark).select(
        "o_orderstatus",
        "n",
        F.col("cnt_price").alias("cnt_price"),
        F.col("avg_price"),
    )


@register(
    "q_tf_distinct_view",
    """
    WITH final AS (
        SELECT event_id, event_type, user_id % 199 AS ub
        FROM events WHERE event_id % 5 <> 0
    )
    SELECT event_type, COUNT(*) AS n,
           COUNT(DISTINCT ub) AS distinct_users
    FROM final GROUP BY event_type
    """,
    "Incremental materialized APPROX_COUNT_DISTINCT view "
    "(operators/matview.py approx_distinct_cols) — an events-derived "
    "source (event_id key, user bucket user_id % 199) committed three "
    "ways (initial rewrite, pure append, then a rewrite deleting the "
    "%5 keys), with a per-event-type Datasketches HLL sketch column "
    "maintained from the change feed: appends fold monotonically via "
    "hll_sketch_agg + hll_union with ZERO source reads; the delete "
    "commit dirties every group that lost a value and re-sketches ONLY "
    "those from the snapshot (sketches cannot subtract). The bucket "
    "bounds per-group cardinality at 199 AT ANY SCALE FACTOR, inside "
    "the sketch's coupon-exact range, so the estimate equals the "
    "oracle's exact COUNT(DISTINCT) deterministically.",
)
def q_tf_distinct_view(spark, sf_dir):
    from ..operators import tablefmt as TF
    from ..operators.matview import MaterializedAggView
    from .scratch import scratch_root

    events = C.load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        (F.col("user_id") % 199).alias("ub"),
    )
    src = scratch_root("mv_hll_src")
    view = MaterializedAggView(
        src,
        scratch_root("mv_hll_view"),
        group_keys=["event_type"],
        approx_distinct_cols=["ub"],
        row_keys=["event_id"],
    )
    TF.commit_version(events.filter(F.col("event_id") % 3 != 0), src)
    view.refresh(spark)
    TF.commit_append(events.filter(F.col("event_id") % 3 == 0), src)
    view.refresh(spark)
    TF.commit_version(events.filter(F.col("event_id") % 5 != 0), src)
    view.refresh(spark)
    return view.result(spark).select(
        "event_type",
        "n",
        F.col("approx_distinct_ub").alias("distinct_users"),
    )


@register(
    "q_e8_sliding_chunks",
    """
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    s AS (
        SELECT doc_id, toks,
               unnest(range(0, greatest(len(toks) - 1, 0) + 1, 448))
                 AS start
        FROM t
    )
    SELECT doc_id,
           start // 448 AS chunk_id,
           array_to_string(toks[start + 1 : start + 512], ' ')
             AS chunk_text,
           least(len(toks) - start, 512) AS n_tokens
    FROM s
    WHERE start = 0 OR start + 64 < len(toks)
    """,
    "E8 — per-document sliding-window chunking (context-length prep for "
    "SFT/eval corpora; documents never cross chunk boundaries — the "
    "complement of pack_chunks' concat-and-cut pretraining layout): "
    "512-token windows advancing by 448 (64-token overlap), final "
    "partial chunk kept. Pure per-row JVM expressions (sequence + slice "
    "+ posexplode) — NO shuffle at any corpus size; chunk ids dense per "
    "document, fully deterministic.",
)
def q_e8_sliding_chunks(spark, sf_dir):
    return DP.sliding_chunks(
        C.load_table(spark, sf_dir, "documents"),
        max_tokens=512, overlap=64,
    )


@register(
    "q_e8_softdedup_weights",
    """
    SELECT doc_id,
           COUNT(*) OVER (PARTITION BY sha256(text)) AS cluster_size,
           1.0 / COUNT(*) OVER (PARTITION BY sha256(text)) AS weight
    FROM documents
    """,
    "E8 — soft deduplication: weight every document by the reciprocal "
    "of its exact-duplicate group size instead of dropping duplicates "
    "(down-weighting preserves coverage while removing the "
    "over-representation bias; groups key on the same sha256 digest as "
    "the hard-dedup path, so the strategies are directly comparable). "
    "One window over the 32-byte digest — a single shuffle, no join.",
)
def q_e8_softdedup_weights(spark, sf_dir):
    return DP.softdedup_weights(C.load_table(spark, sf_dir, "documents"))


@register(
    "q_e8_token_budget",
    """
    WITH t AS (
        SELECT doc_id,
               md5(concat('tb1|', CAST(doc_id AS VARCHAR))) AS h,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tokens,
               CAST(COALESCE(SUM(n_tokens) OVER (
                 ORDER BY h, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cum_before
        FROM t
    )
    SELECT doc_id, n_tokens, cum_before FROM c WHERE cum_before < 5000
    """,
    "E8 — deterministic token-budget corpus cut ('give me an N-token "
    "slice'): keep documents in md5(salt|id) hash order until the "
    "running token total reaches the budget (the crossing doc is "
    "included). The oracle computes the naive GLOBAL running sum; the "
    "Spark plan computes the SAME exact prefix without a global sort — "
    "the digest's first 2 hex chars split the corpus into 256 blocks "
    "that are in global order by construction, block token sums (one "
    "map-side-combined groupBy) turn into offsets via a 256-row window, "
    "and each block's partitioned running sum adds its offset. The only "
    "ordered shuffle is partitioned 256 ways — the 100 TB shape for an "
    "exact global cumulative.",
)
def q_e8_token_budget(spark, sf_dir):
    return DP.token_budget_sample(
        C.load_table(spark, sf_dir, "documents"), budget_tokens=5000
    )


@register(
    "q_tf_zorder_pruned_read",
    """
    WITH b AS (
        SELECT (max(user_id) + 1) // 4 AS ub,
               (SELECT min(value) + (max(value) - min(value)) * 0.25
                FROM events) AS vb
        FROM events
    )
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM events, b
    WHERE user_id < b.ub AND value <= b.vb
    GROUP BY event_type
    """,
    "Table-layer OPTIMIZE ZORDER — events committed as four unclustered "
    "appends, then compact_zorder(user_id, value) rewrites the snapshot "
    "as contiguous-Morton-range directories (quantile-rank z-curve, the "
    "E12 layout applied INSIDE the versioned table), so the manifest's "
    "per-directory stats become selective on BOTH columns: a 2-D corner "
    "read via read_version(prune=) skips directories a plain compact's "
    "single blob never could (asserted in-query), the real predicate "
    "runs on the survivors, and the layout rewrite is data-identical "
    "(pass-through for the change feed). The oracle is the plain "
    "filtered aggregate — clustering must never change the answer.",
)
def q_tf_zorder_pruned_read(spark, sf_dir):
    import json

    from ..operators import tablefmt as TF
    from .scratch import scratch_root

    ev = C.load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    )
    root = scratch_root("zorder_read")
    for i in range(4):
        TF.commit_append(ev.filter(F.col("user_id") % 4 == i), root)
    v = TF.compact_zorder(spark, root, "user_id", "value", n_dirs=16)
    # scale-relative 2-D corner: bottom quarter of users, bottom
    # quartile of values — matches the oracle's bounds at every SF
    ub = (ev.agg(F.max("user_id")).collect()[0][0] + 1) // 4
    # arithmetic bound (not a quantile): min/max are exact on both
    # engines and the IEEE double expression evaluates identically,
    # where interpolated-vs-discrete quantile conventions could pick
    # different boundary values and silently change the kept set
    agg = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    r = agg.collect()[0]
    vb = r["lo"] + (r["hi"] - r["lo"]) * 0.25
    with open(TF._manifest_path(root, v)) as f:
        m = json.load(f)
    prune = {"user_id": (None, ub - 1), "value": (None, vb)}
    kept = [p for p in m["data"] if TF._keep_dir(m["stats"].get(p), prune)]
    assert len(kept) < len(m["data"]), "z-order clustering pruned nothing"
    pruned = TF.read_version(spark, root, v, prune=prune)
    return (
        pruned.filter((F.col("user_id") < ub) & (F.col("value") <= vb))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double").alias("sum_value"),
        )
    )


@register(
    "q_tf_stats_agg",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS row_cnt,
           MIN(event_id) AS min_event_id,
           MAX(event_id) AS max_event_id,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    WHERE event_id >= (SELECT (max(event_id) + 1) * 7 // 10 FROM events)
    """,
    "Table-layer metadata-only aggregate (the Iceberg metadata-table "
    "shape) — events committed as four contiguous-id append batches, "
    "then COUNT/MIN/MAX under an id-range predicate served by stats_agg "
    "from the manifests' parquet-footer statistics: directories provably "
    "inside the bound contribute their exact footer rows/min/max with "
    "ZERO data reads (the in-query assertion pins that at least one "
    "directory was decided by metadata), the one boundary-straddling "
    "directory is scanned with the real predicate, and fully-disjoint "
    "directories never contribute I/O at all. The oracle is the plain "
    "filtered aggregate over the whole table — serving from metadata "
    "must never change the answer.",
)
def q_tf_stats_agg(spark, sf_dir):
    from ..operators import tablefmt as TF
    from .scratch import scratch_root

    ev = C.load_table(spark, sf_dir, "events").select("event_id", "value")
    hi = ev.agg(F.max("event_id")).collect()[0][0] + 1
    step = hi // 4 + 1
    root = scratch_root("stats_agg")
    for i in range(4):
        TF.commit_append(
            ev.filter(
                (F.col("event_id") >= i * step)
                & (F.col("event_id") < (i + 1) * step)
            ),
            root,
        )
    lo = (hi * 7) // 10  # top 30% of the id space, scale-relative
    audit: dict = {}
    out = TF.stats_agg(
        spark,
        root,
        cols=("event_id", "value"),
        prune={"event_id": (lo, None)},
        audit=audit,
    )
    # the contiguous-range layout must let footers decide the interior
    # directories: at least one metadata-served, at least one excluded,
    # at most the single boundary-straddling directory scanned
    assert audit["dirs_metadata"] >= 1, audit
    assert audit["dirs_excluded"] >= 1, audit
    assert audit["dirs_scanned"] <= 1, audit
    return out


# Shared DSIR oracle CTEs: add-1-smoothed unigram LMs of the target
# sample (lang='de' documents) and the full corpus over their shared
# vocabulary, per-token log-ratios quantized to DECIMAL(38,6) (the
# unigram_logprob discipline: both engines feed ln identical doubles —
# exact-integer division arguments — and the quantized terms subtract
# exactly), then per-doc log-weights as exact decimal sums.
def _dsir_ctes(gram: str = "string_split(text, ' ')") -> str:
    """The DSIR oracle CTE chain over an arbitrary SQL gram-inventory
    expression (`gram` maps `text` to an array<string>): unigrams by
    default, the positional-bigram expression for the ngrams=2 form."""
    return _DSIR_CTES_TEMPLATE.replace("__GRAM__", gram)


# Positional word bigrams mirroring text.word_ngrams(n=2): duplicates
# kept, documents shorter than 2 tokens fall back to the whole text.
_DSIR_BIGRAM_SQL = (
    "CASE WHEN len(string_split(text, ' ')) >= 2 THEN "
    "list_transform(range(1, len(string_split(text, ' '))), "
    "i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]) "
    "ELSE [text] END"
)


_DSIR_CTES_TEMPLATE = """
    tgt AS (SELECT text FROM documents WHERE lang = 'de'),
    tct AS (
        SELECT token, count(*) AS c FROM (
            SELECT unnest(__GRAM__) AS token FROM tgt)
        WHERE token <> '' GROUP BY token
    ),
    sct AS (
        SELECT token, count(*) AS c FROM (
            SELECT unnest(__GRAM__) AS token FROM documents)
        WHERE token <> '' GROUP BY token
    ),
    vocab AS (SELECT token FROM tct UNION SELECT token FROM sct),
    tot AS (
        SELECT (SELECT COALESCE(sum(c), 0) FROM tct) AS t_total,
               (SELECT COALESCE(sum(c), 0) FROM sct) AS s_total,
               (SELECT count(*) FROM vocab) AS v
    ),
    ratio AS (
        SELECT v.token,
               CAST(ln((COALESCE(t.c, 0) + 1.0) / (tot.t_total + tot.v))
                    AS DECIMAL(38,6))
             - CAST(ln((COALESCE(s.c, 0) + 1.0) / (tot.s_total + tot.v))
                    AS DECIMAL(38,6)) AS logratio
        FROM vocab v
        LEFT JOIN tct t USING (token)
        LEFT JOIN sct s USING (token), tot
    ),
    tok AS (
        SELECT doc_id, unnest(__GRAM__) AS token
        FROM documents
    ),
    w AS (
        SELECT k.doc_id,
               COALESCE(s.lw, CAST(0 AS DECIMAL(38,6))) AS logw_dec
        FROM (SELECT doc_id FROM documents) k
        LEFT JOIN (
            SELECT t.doc_id, SUM(r.logratio) AS lw
            FROM tok t JOIN ratio r USING (token)
            WHERE t.token <> ''
            GROUP BY t.doc_id
        ) s USING (doc_id)
    )
"""


def _dsir_target(spark, sf_dir):
    return _docs(spark, sf_dir).filter(F.col("lang") == "de")


@register(
    "q_e8_dsir_weights",
    f"""
    WITH {_dsir_ctes()}
    SELECT doc_id, CAST(logw_dec AS DOUBLE) AS logw FROM w
    """,
    "E8 — DSIR importance log-weights (Xie et al. 2023): per-document "
    "sum of add-1-smoothed unigram log-likelihood ratios between a "
    "target sample (lang='de') and the raw corpus. One distinct-word "
    "aggregation per side, a vocab-sized ratio join, one groupBy(doc) — "
    "token-linear. Exact DECIMAL(38,6) summation of quantized ln terms, "
    "so the oracle matches bitwise.",
)
def q_e8_dsir_weights(spark, sf_dir):
    from ..operators.datapipe import dsir_weights

    docs = _docs(spark, sf_dir)
    return dsir_weights(docs, _dsir_target(spark, sf_dir)).select(
        "doc_id", F.col("logw").cast("double").alias("logw")
    )


@register(
    "q_e8_dsir_sample",
    f"""
    WITH {_dsir_ctes()}
    SELECT doc_id,
           CAST(logw_dec AS DOUBLE) AS logw,
           CAST(logw_dec + CAST(-ln(-ln(
                (CAST(('0x' || substr(md5('dsir-v1:' || CAST(doc_id AS VARCHAR)), 1, 12))
                      AS BIGINT) + 1.0) / 281474976710657.0))
                AS DECIMAL(38,6)) AS DOUBLE) AS key
    FROM w
    ORDER BY key DESC, doc_id ASC
    LIMIT 100
    """,
    "E8 — DSIR importance RESAMPLING: 100 docs without replacement with "
    "probability proportional to exp(logw), via the Gumbel top-k trick "
    "with DERIVED noise — u from the md5(salt|id) hex prefix (the "
    "repo's deterministic-projection discipline, re-rollable by salt), "
    "g = -ln(-ln(u)) quantized to DECIMAL(38,6) so keys add exactly. "
    "Selection is one TakeOrderedAndProject (per-partition top-n + "
    "driver heap merge) — no global sort at any corpus size.",
)
def q_e8_dsir_sample(spark, sf_dir):
    from ..operators.datapipe import dsir_sample

    return dsir_sample(_docs(spark, sf_dir), _dsir_target(spark, sf_dir), 100)


@register(
    "q_e8_dsir_bigram_weights",
    f"""
    WITH {_dsir_ctes(_DSIR_BIGRAM_SQL)}
    SELECT doc_id, CAST(logw_dec AS DOUBLE) AS logw FROM w
    """,
    "E8 — DSIR log-weights over positional word BIGRAMS (the paper's "
    "hashed-bigram feature unit; text.word_ngrams(n=2) convention — "
    "duplicates kept, sub-bigram docs fall back to the whole text). "
    "Same shuffle shape as the unigram form: one distinct-gram "
    "aggregation per side, a gram-vocab ratio join, one groupBy(doc); "
    "exact DECIMAL summation, bitwise oracle match.",
)
def q_e8_dsir_bigram_weights(spark, sf_dir):
    from ..operators.datapipe import dsir_weights

    docs = _docs(spark, sf_dir)
    return dsir_weights(
        docs, _dsir_target(spark, sf_dir), ngrams=2
    ).select("doc_id", F.col("logw").cast("double").alias("logw"))


@register(
    "q_tf_snapshots",
    """
    WITH b AS (SELECT ((max(event_id) + 1) // 4 + 1) AS step FROM events)
    SELECT t.v AS version,
           CAST(t.v + 1 AS BIGINT) AS n_dirs,
           (SELECT CAST(count(*) AS BIGINT) FROM events, b
            WHERE event_id < (t.v + 1) * b.step) AS n_rows
    FROM range(4) AS t(v)
    """,
    "Table-layer snapshots metadata table (the Iceberg `snapshots` "
    "shape) — events committed as four contiguous-id append batches, "
    "then one row per retained version with its directory count and "
    "footer-exact row count, memoized per shared directory across the "
    "history: O(distinct dirs) driver-side metadata reads, ZERO data "
    "reads. The oracle recovers each version's cumulative row count "
    "from the append predicates.",
)
def q_tf_snapshots(spark, sf_dir):
    from ..operators import tablefmt as TF
    from .scratch import scratch_root

    ev = C.load_table(spark, sf_dir, "events").select("event_id")
    hi = ev.agg(F.max("event_id")).collect()[0][0] + 1
    step = hi // 4 + 1
    root = scratch_root("snapshots")
    for i in range(4):
        TF.commit_append(
            ev.filter(
                (F.col("event_id") >= i * step)
                & (F.col("event_id") < (i + 1) * step)
            ),
            root,
        )
    return TF.table_snapshots(spark, root).select(
        "version", "n_dirs", F.col("rows").alias("n_rows")
    )


@register(
    "q_tf_deletion_vectors",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM events
    WHERE user_id % 13 <> 0
    GROUP BY event_type
    """,
    "Table-layer merge-on-read DELETE (Delta/Iceberg deletion vectors) "
    "— events committed as four contiguous-id append batches, then a "
    "row-level predicate delete (user_id % 13 = 0, scattered across "
    "EVERY directory) recorded as a parquet address sidecar instead of "
    "rewriting the directories it touches: the in-query audit pins "
    "rewritten_dirs == 0 and an unchanged data-directory list, so write "
    "amplification is O(deleted rows) where copy-on-write delete_where "
    "would rewrite all four directories. Readers subtract the vector "
    "via a broadcast-hash LEFT ANTI join on (relative file path, "
    "_metadata.row_index) — no shuffle of the fact side. The oracle is "
    "the aggregate over NOT(predicate).",
)
def q_tf_deletion_vectors(spark, sf_dir):
    import json as _json

    from ..operators import tablefmt as TF
    from .scratch import scratch_root

    ev = C.load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    hi = ev.agg(F.max("event_id")).collect()[0][0] + 1
    step = hi // 4 + 1
    root = scratch_root("deletion_vectors")
    for i in range(4):
        TF.commit_append(
            ev.filter(
                (F.col("event_id") >= i * step)
                & (F.col("event_id") < (i + 1) * step)
            ),
            root,
        )
    parent = TF.latest_version(root)
    with open(TF._manifest_path(root, parent)) as f:
        parent_data = TF._data_list(_json.load(f))
    v = TF.delete_where_dv(spark, root, "user_id % 13 = 0")
    with open(TF._manifest_path(root, v)) as f:
        m = _json.load(f)
    # the write-amplification contract: row-granular delete, zero
    # directory rewrites, O(deleted rows) new bytes
    assert m["app"]["op"] == "delete_where_dv", m["app"]
    assert m["app"]["rewritten_dirs"] == 0, m["app"]
    assert m["app"]["dv_rows"] > 0, m["app"]
    assert TF._data_list(m) == parent_data, "data list must carry verbatim"
    return (
        TF.read_version(spark, root)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


@register(
    "q_tf_point_lookup",
    """
    SELECT event_id, event_type, user_id, value
    FROM events
    WHERE event_id = (SELECT max(event_id) FROM events
                      WHERE event_id <= (SELECT max(event_id) // 2
                                         FROM events))
    """,
    "Table-layer point-lookup data skipping via per-directory bloom "
    "filters (Delta's bloom-filter index) — events committed as four "
    "USER_ID-clustered append batches with commit_append(bloom="
    "('event_id',)): each directory's event_id [min,max] spans nearly "
    "the whole id space (a user's events scatter across time), so range "
    "bounds prune NOTHING for an equality lookup, but the commit-time "
    "bloom sidecar (16 bits/distinct value, k=7, ~0.5% fpp) proves "
    "absence per directory. event_id is unique, so the key lives in "
    "exactly one directory; the in-query audit pins dirs_kept < "
    "dirs_total — the lookup touches the directory holding the row, "
    "not the table. Oracle: the plain equality select.",
)
def q_tf_point_lookup(spark, sf_dir):
    from ..operators import tablefmt as TF
    from .scratch import scratch_root

    ev = C.load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    row = ev.agg(
        F.max("user_id").alias("hu"), F.max("event_id").alias("he")
    ).collect()[0]
    step = row["hu"] // 4 + 1
    # a MID-RANGE id (largest id <= half-max): inside every directory's
    # [min,max] span, so range bounds cannot prune — only the bloom can
    target = (
        ev.filter(F.col("event_id") <= row["he"] // 2)
        .agg(F.max("event_id"))
        .collect()[0][0]
    )
    root = scratch_root("point_lookup")
    for i in range(4):
        TF.commit_append(
            ev.filter(
                (F.col("user_id") >= i * step)
                & (F.col("user_id") < (i + 1) * step)
            ),
            root,
            bloom=("event_id",),
        )
    audit: dict = {}
    out = TF.read_version(
        spark, root, prune={"event_id": ("=", target)}, audit=audit
    )
    # event_id is unique -> exactly one directory holds it; range
    # bounds keep all four (each user-clustered directory's event_id
    # span covers the max), so any skipping here is the bloom's
    assert audit["dirs_kept"] < audit["dirs_total"], audit
    return out.filter(F.col("event_id") == target).select(
        "event_id", "event_type", "user_id", "value"
    )


@register(
    "q_tf_merge_full_sync",
    """
    WITH b AS (SELECT (max(event_id) + 1) AS hi,
                      ((max(event_id) + 1) // 4 + 1) AS step
               FROM events),
    src AS (
        SELECT event_id, event_type, user_id,
               CASE WHEN event_id < (SELECT step FROM b)
                         AND event_type = 'click'
                    THEN value * 2 ELSE value END AS value
        FROM events
        WHERE NOT (event_id < (SELECT step FROM b)
                   AND event_type = 'error')
        UNION ALL
        SELECT event_id + (SELECT hi FROM b) AS event_id,
               event_type, user_id, value + 1 AS value
        FROM events
        WHERE event_type = 'signup' AND event_id < (SELECT step FROM b)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM src GROUP BY event_type
    """,
    "Table-layer full-sync MERGE (Delta's three-clause MERGE with WHEN "
    "NOT MATCHED BY SOURCE DELETE; the reference's J5 Venn reconcile, "
    "Extensions/CommonExtensions.cs:9-48, at table scale) — events "
    "committed as four id-clustered append batches, then ONE commit "
    "mirrors a source that deletes dir-0's error rows, doubles dir-0's "
    "click values, and inserts shifted-id signup rows: after it the "
    "table EQUALS the source. The keyed diff confines departing keys "
    "to dir 0's id range, so the in-query audit pins carried_dirs >= 1 "
    "(untouched directories ride by reference — write amplification is "
    "O(touched dirs + changes), not a table rewrite). Oracle: the "
    "aggregate over the mirrored source expression.",
)
def q_tf_merge_full_sync(spark, sf_dir):
    import json as _json

    from ..operators import tablefmt as TF
    from .scratch import scratch_root

    ev = C.load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    hi = ev.agg(F.max("event_id")).collect()[0][0] + 1
    step = hi // 4 + 1
    root = scratch_root("merge_full_sync")
    for i in range(4):
        TF.commit_append(
            ev.filter(
                (F.col("event_id") >= i * step)
                & (F.col("event_id") < (i + 1) * step)
            ),
            root,
        )
    head = F.col("event_id") < step
    src = (
        ev.filter(~(head & (F.col("event_type") == "error")))
        .withColumn(
            "value",
            F.when(
                head & (F.col("event_type") == "click"),
                F.col("value") * 2,
            ).otherwise(F.col("value")),
        )
        .unionByName(
            ev.filter(head & (F.col("event_type") == "signup")).select(
                (F.col("event_id") + hi).alias("event_id"),
                "event_type",
                "user_id",
                (F.col("value") + 1).alias("value"),
            )
        )
    )
    v = TF.commit_full_sync(spark, root, src, keys=["event_id"])
    with open(TF._manifest_path(root, v)) as f:
        m = _json.load(f)
    # departing keys live in dir 0's id range only: the other
    # directories must ride by reference
    assert m["app"]["op"] == "full_sync", m["app"]
    assert m["app"]["carried_dirs"] >= 1, m["app"]
    assert m["app"]["rewritten_dirs"] < 4, m["app"]
    return (
        TF.read_version(spark, root)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


@register(
    "q_tf_sum_agg",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS row_cnt,
           CAST(SUM(user_id) AS BIGINT) AS sum_user_id
    FROM events
    WHERE event_id <= (SELECT (max(event_id) + 1) // 2 FROM events)
    """,
    "Table-layer metadata-only SUM — events committed as four "
    "contiguous-id append batches with commit_append(sums=('user_id',)) "
    "recording exact per-directory integer column sums in the manifest; "
    "stats_agg(sums=) then answers a range-filtered COUNT+SUM with data "
    "reads only for the one boundary-straddling directory (in-query "
    "audit: at least one directory manifest-served, at most one "
    "scanned). The oracle is the plain filtered aggregate.",
)
def q_tf_sum_agg(spark, sf_dir):
    from ..operators import tablefmt as TF
    from .scratch import scratch_root

    ev = C.load_table(spark, sf_dir, "events").select("event_id", "user_id")
    hi = ev.agg(F.max("event_id")).collect()[0][0] + 1
    step = hi // 4 + 1
    root = scratch_root("sum_agg")
    for i in range(4):
        TF.commit_append(
            ev.filter(
                (F.col("event_id") >= i * step)
                & (F.col("event_id") < (i + 1) * step)
            ),
            root,
            sums=("user_id",),
        )
    audit: dict = {}
    out = TF.stats_agg(
        spark,
        root,
        sums=("user_id",),
        prune={"event_id": (None, hi // 2)},
        audit=audit,
    )
    assert audit["dirs_metadata"] >= 1, audit
    assert audit["dirs_scanned"] <= 1, audit
    return out


@register(
    "q_e8_pack_bins",
    None,  # first-fit-decreasing assignment is an iterative heuristic —
    # not SQL-expressible; the bin-capacity invariant, optimality on a
    # constructed corpus, determinism, and oversize flagging are pinned
    # in tests/test_datapipe.py::test_pack_bins_ffd_invariants
    "E8 — whole-document FFD bin packing into max_tokens training bins "
    "(SFT/eval layout: documents never split, near-optimal padding "
    "waste). Sharded by md5(salt|id) with independent per-shard FFD "
    "via applyInPandas — one shuffle, O(shard) task memory, "
    "deterministic; oversize docs get flagged singleton bins.",
)
def q_e8_pack_bins(spark, sf_dir):
    from ..operators.datapipe import pack_bins

    return pack_bins(_docs(spark, sf_dir), max_tokens=512, n_shards=16)


@register(
    "q_e4_bm25_topk",
    """
    WITH lens AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS len
        FROM documents
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(len) AS BIGINT) AS s
        FROM lens
    ),
    hits AS (
        SELECT doc_id, token AS term, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents)
        WHERE token IN ('fast', 'stream', 'vector')
        GROUP BY doc_id, token
    ),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM hits GROUP BY term),
    idf AS (
        SELECT term,
               CAST(ln((tot.n - df + 0.5) / (df + 0.5) + 1.0)
                    AS DECIMAL(38,6)) AS idf
        FROM dfreq, tot
    ),
    scored AS (
        SELECT h.doc_id,
               SUM(CAST(
                   CAST(i.idf AS DOUBLE)
                   * (h.tf * 2.2 / (h.tf + 1.2 * (0.25 + 0.75
                        * (l.len / (CAST(tot.s AS DOUBLE) / tot.n)))))
                   AS DECIMAL(38,6))) AS sd
        FROM hits h JOIN idf i USING (term) JOIN lens l USING (doc_id), tot
        GROUP BY h.doc_id
    )
    SELECT doc_id, CAST(sd AS DOUBLE) AS score,
           CAST(row_number() OVER (
               ORDER BY CAST(sd AS DOUBLE) DESC, doc_id) AS INT) AS rank
    FROM scored ORDER BY score DESC, doc_id LIMIT 20
    """,
    "E4/E3 — lexical retrieval: Okapi BM25 top-20 for the query "
    "{fast, stream, vector} (k1=1.2, b=0.75, RSJ +1 idf). Corpus "
    "passes are query-term-filtered BEFORE any shuffle; doc lengths "
    "are a pure projection; idf rides as a broadcast decimal-literal "
    "map; per-term partial scores quantize to DECIMAL(38,6) before "
    "the per-doc sum (order-independent, oracle-exact) and the top-k "
    "is one TakeOrderedAndProject.",
)
def q_e4_bm25_topk(spark, sf_dir):
    from ..operators.retrieval import bm25_topk

    return bm25_topk(
        _docs(spark, sf_dir), ["fast", "stream", "vector"], k=20
    )


@register(
    "q_e4_incremental_bm25",
    """
    WITH lens AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS len
        FROM documents
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(len) AS BIGINT) AS s
        FROM lens
    ),
    hits AS (
        SELECT doc_id, token AS term, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents)
        WHERE token IN ('fast', 'stream', 'vector')
        GROUP BY doc_id, token
    ),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM hits GROUP BY term),
    idf AS (
        SELECT term,
               CAST(ln((tot.n - df + 0.5) / (df + 0.5) + 1.0)
                    AS DECIMAL(38,6)) AS idf
        FROM dfreq, tot
    ),
    scored AS (
        SELECT h.doc_id,
               SUM(CAST(
                   CAST(i.idf AS DOUBLE)
                   * (h.tf * 2.2 / (h.tf + 1.2 * (0.25 + 0.75
                        * (l.len / (CAST(tot.s AS DOUBLE) / tot.n)))))
                   AS DECIMAL(38,6))) AS sd
        FROM hits h JOIN idf i USING (term) JOIN lens l USING (doc_id), tot
        GROUP BY h.doc_id
    )
    SELECT doc_id, CAST(sd AS DOUBLE) AS score,
           CAST(row_number() OVER (
               ORDER BY CAST(sd AS DOUBLE) DESC, doc_id) AS INT) AS rank
    FROM scored ORDER BY score DESC, doc_id LIMIT 20
    """,
    "E4 deployment form — MAINTAINED inverted index: documents ingested "
    "as three micro-batches into a durable postings + doclens index "
    "(streaming/bm25index.py: per-batch manifest-CAS appends, batch-id "
    "redelivery ledger, bloom filter on term, commit-time doc_len sums), "
    "then the SAME BM25 query served FROM the index: corpus totals come "
    "from manifest metadata with zero data reads (audited in-query) and "
    "scoring runs through the one-shot operator's own tail, so "
    "incremental == one-shot is an identity — both share this oracle.",
)
def q_e4_incremental_bm25(spark, sf_dir):
    from ..streaming.bm25index import (
        IncrementalBm25IndexSink,
        bm25_topk_from_index,
    )
    from .scratch import scratch_root

    import os

    from ..operators import tablefmt as TF

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    hi = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    n_batches = 6
    step = hi // n_batches + 1
    root = scratch_root("bm25_index")
    # cadence 4 < batches 6: at least one auto-compaction fires DURING
    # the build — the maintenance window the round-9 audit could not see
    sink = IncrementalBm25IndexSink(root, auto_compact=4)
    for i in range(n_batches):
        sink.process_batch(
            docs.filter(
                (F.col("doc_id") >= i * step)
                & (F.col("doc_id") < (i + 1) * step)
            ),
            batch_id=i,
        )
    sink.process_batch(docs.limit(50), batch_id=1)  # redelivery: skipped
    # prove a compaction actually rewrote the index tables in-run
    compacted = any(
        (m.get("app") or {}).get("data_identical")
        for sub in ("postings", "doclens")
        for m in TF.history(os.path.join(root, sub))
    )
    assert compacted, "cadence never fired — the audit below proves nothing"
    audit: dict = {}
    out = bm25_topk_from_index(
        spark, root, ["fast", "stream", "vector"], k=20, audit=audit
    )
    # corpus totals (N docs, total tokens) must be manifest-served EVEN
    # AFTER maintenance: compaction re-derives the doc_len sums sidecar
    # for the directories it rewrites (round-10 queue #1)
    assert audit["dirs_scanned"] == 0, audit
    return out


@register(
    "q_e3_hybrid_rrf",
    """
    WITH lens AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS len
        FROM documents
    ),
    tot AS (
        SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(len) AS BIGINT) AS s
        FROM lens
    ),
    hits AS (
        SELECT doc_id, token AS term, CAST(count(*) AS BIGINT) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
              FROM documents)
        WHERE token IN ('fast', 'stream', 'vector')
        GROUP BY doc_id, token
    ),
    dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM hits GROUP BY term),
    idf AS (
        SELECT term,
               CAST(ln((tot.n - df + 0.5) / (df + 0.5) + 1.0)
                    AS DECIMAL(38,6)) AS idf
        FROM dfreq, tot
    ),
    lex AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY sd DESC, doc_id) AS INT)
                   AS rank
        FROM (
            SELECT h.doc_id,
                   SUM(CAST(
                       CAST(i.idf AS DOUBLE)
                       * (h.tf * 2.2 / (h.tf + 1.2 * (0.25 + 0.75
                            * (l.len / (CAST(tot.s AS DOUBLE) / tot.n)))))
                       AS DECIMAL(38,6))) AS sd
            FROM hits h JOIN idf i USING (term) JOIN lens l USING (doc_id),
                 tot
            GROUP BY h.doc_id)
        ORDER BY sd DESC, doc_id LIMIT 50
    ),
    vec AS (
        SELECT doc_id, rank FROM (
            SELECT b.vec_id AS doc_id,
                   CAST(row_number() OVER (
                       ORDER BY list_cosine_similarity(a.embedding, b.embedding)
                                DESC, b.vec_id) AS INT) AS rank
            FROM embeddings a JOIN embeddings b ON b.vec_id <> a.vec_id
            WHERE a.vec_id = 0)
        WHERE rank <= 50
    ),
    fused AS (
        SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
               COALESCE(1.0 / (60 + l.rank), 0)
             + COALESCE(1.0 / (60 + v.rank), 0) AS rrf_score
        FROM lex l FULL OUTER JOIN vec v USING (doc_id)
    )
    SELECT doc_id, rrf_score,
           CAST(row_number() OVER (
               ORDER BY rrf_score DESC, doc_id) AS INT) AS rank
    FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 15
    """,
    "E3/E4 — HYBRID retrieval: BM25 top-50 (lexical) and exact-cosine "
    "top-50 around query vector 0 (dense), fused by reciprocal-rank "
    "fusion score = sum 1/(60 + rank) — the calibration-free hybrid "
    "combiner. Each RRF term is one exact-integer-operand double "
    "division with a fixed summation order, so fused scores match the "
    "oracle bitwise; candidate lists are k-scale, the fusion join is "
    "broadcast-trivial, and the final cut is one TakeOrderedAndProject. "
    "(Cosine ranks are selection-stable: the fixtures' smallest "
    "adjacent top-k gap is ~1e-5 vs ~1e-15 cross-engine float noise — "
    "the established E3 oracle discipline.)",
)
def q_e3_hybrid_rrf(spark, sf_dir):
    from ..operators.retrieval import bm25_topk, rrf_fuse
    from ..operators.similarity import brute_force_topk

    docs = _docs(spark, sf_dir)
    emb = C.load_table(spark, sf_dir, "embeddings")
    lex = bm25_topk(docs, ["fast", "stream", "vector"], k=50)
    vec = brute_force_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=50
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    return rrf_fuse([lex.select("doc_id", "rank"), vec], k=15)


@register(
    "q_tf_consolidate_dv",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM events
    WHERE user_id % 11 <> 0 AND user_id % 13 <> 0 AND user_id % 17 <> 0
      AND user_id % 19 <> 0 AND user_id % 23 <> 0
    GROUP BY event_type
    """,
    "Table-layer DV-sidecar CONSOLIDATION (round 10) — five scattered "
    "merge-on-read point-delete commits leave five parquet sidecar "
    "directories that every scan must union; consolidate_dv folds them "
    "into ONE with the data directories untouched (in-query audit: "
    "op == consolidate_dv, data_identical stamped, sidecars 5 -> 1, "
    "data list carried verbatim) so the per-scan sidecar file count "
    "stays bounded on a hot table. The visible rows are bit-identical "
    "before and after; the oracle is the aggregate over the conjunction "
    "of the five NOT(predicate)s.",
)
def q_tf_consolidate_dv(spark, sf_dir):
    import json as _json

    from ..operators import tablefmt as TF
    from .scratch import scratch_root

    ev = C.load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    hi = ev.agg(F.max("event_id")).collect()[0][0] + 1
    step = hi // 4 + 1
    root = scratch_root("consolidate_dv")
    for i in range(4):
        TF.commit_append(
            ev.filter(
                (F.col("event_id") >= i * step)
                & (F.col("event_id") < (i + 1) * step)
            ),
            root,
        )
    for p in (11, 13, 17, 19, 23):
        TF.delete_where_dv(spark, root, f"user_id % {p} = 0")
    with open(TF._manifest_path(root, TF.latest_version(root))) as f:
        before = _json.load(f)
    n_before = len(
        {p for e in TF._dv_map(before).values() for p in e["paths"]}
    )
    # at tiny SFs a predicate can match nothing (no commit, no sidecar);
    # the fold is audited against the sidecars that actually landed
    assert n_before >= 2, f"need >=2 sidecars to fold, got {n_before}"
    v = TF.consolidate_dv(spark, root)
    with open(TF._manifest_path(root, v)) as f:
        m = _json.load(f)
    assert m["app"]["op"] == "consolidate_dv", m["app"]
    assert m["app"]["data_identical"] is True, m["app"]
    assert m["app"]["dv_sidecars_before"] == n_before, m["app"]
    n_after = len({p for e in TF._dv_map(m).values() for p in e["paths"]})
    assert n_after == 1, f"sidecars must fold to 1, got {n_after}"
    assert TF._data_list(m) == TF._data_list(before), (
        "data list must carry verbatim — consolidation touches no data"
    )
    return (
        TF.read_version(spark, root)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


@register(
    "q_tf_compact_small",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM events
    WHERE user_id % 11 <> 0
    GROUP BY event_type
    """,
    "Bin-packing compaction (round 12) — Delta OPTIMIZE's actual shape "
    "vs compact()'s full rewrite: one large directory (3/4 of the "
    "table) plus a 3-commit small tail, a merge-on-read DV delete "
    "scattered across both, then compact_small merges ONLY the "
    "sub-threshold tail (in-query audit: op == compact_small, "
    "data_identical stamped, the large directory's files byte-for-byte "
    "untouched via stat snapshot, its stats entry carried verbatim, "
    "tail DV entries APPLIED into the merged files while the large "
    "directory's vectors carry). At 100 TB this is the maintenance "
    "path that never pays O(table) write amplification — the large "
    "span is carried by reference, only the O(small tail) is "
    "rewritten. The visible rows are bit-identical throughout; the "
    "oracle is the aggregate with the deleted cohort excluded.",
)
def q_tf_compact_small(spark, sf_dir):
    import json as _json
    import os as _os

    from ..operators import tablefmt as TF
    from .scratch import scratch_root

    ev = C.load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "value"
    )
    hi = ev.agg(F.max("event_id")).collect()[0][0] + 1
    cut = hi * 3 // 4
    root = scratch_root("compact_small")
    TF.commit_append(ev.filter(F.col("event_id") < cut), root)  # v0 big
    step = (hi - cut) // 3 + 1
    for i in range(3):  # v1..v3 — the small tail
        TF.commit_append(
            ev.filter(
                (F.col("event_id") >= cut + i * step)
                & (F.col("event_id") < cut + (i + 1) * step)
            ),
            root,
        )
    TF.delete_where_dv(spark, root, "user_id % 11 = 0")

    pm = TF.history(root)[-1]
    dirs = TF._data_list(pm)
    big = dirs[0]
    big_bytes = TF._dir_bytes(root, big)
    assert all(TF._dir_bytes(root, d) < big_bytes for d in dirs[1:]), (
        "tail directories must be strictly smaller than the big span"
    )

    def _snap(rel):
        out = []
        for base, _d, names in _os.walk(_os.path.join(root, rel)):
            for n in sorted(names):
                st = _os.stat(_os.path.join(base, n))
                out.append((n, st.st_size, st.st_mtime_ns))
        return out

    big_before = _snap(big)
    big_stats_before = pm["stats"][big]

    v = TF.compact_small(spark, root, small_bytes=big_bytes)
    assert v == TF.latest_version(root), v
    with open(TF._manifest_path(root, v)) as f:
        m = _json.load(f)
    assert m["app"]["op"] == "compact_small", m["app"]
    assert m["app"]["data_identical"] is True, m["app"]
    assert m["app"]["dirs_merged"] == 3, m["app"]
    data = TF._data_list(m)
    assert data[0] == big and len(data) == 2, data
    assert _snap(big) == big_before, (
        "the large directory must be byte-for-byte untouched"
    )
    assert m["stats"][big] == big_stats_before, (
        "the untouched directory's stats entry must carry verbatim"
    )
    assert set(TF._dv_map(m)) <= {big}, (
        "tail DV entries must fold into the merged files; only the "
        f"untouched span may keep vectors: {sorted(TF._dv_map(m))}"
    )
    return (
        TF.read_version(spark, root)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


@register(
    "q_tf_changefeed_mor",
    """
    WITH h AS (SELECT (max(event_id) + 1) // 2 AS half FROM events),
    ev AS (SELECT event_id, user_id, value FROM events)
    SELECT event_id, user_id, value,
           'delete' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
    FROM ev, h WHERE event_id < half AND user_id % 7 = 0
    UNION ALL
    SELECT event_id, user_id, value + 1000.0 AS value,
           'insert', CAST(1 AS BIGINT)
    FROM ev, h WHERE event_id < half AND user_id % 7 = 0
    UNION ALL
    SELECT event_id, user_id, value, 'insert', CAST(1 AS BIGINT)
    FROM ev, h WHERE event_id >= half AND user_id % 5 = 0
    UNION ALL
    SELECT event_id, user_id, value, 'insert', CAST(2 AS BIGINT)
    FROM ev, h WHERE event_id >= half AND user_id % 5 <> 0
    """,
    "Keyless O(changes) change feed across a merge-on-read MERGE "
    "(round 10) — base table of the low-id half, then one "
    "commit_upsert(mor=True) whose batch UPDATES the user_id%7 rows "
    "(value + 1000) and INSERTS the high-half user_id%5 rows, then a "
    "plain append of the rest. table_changes serves the spanning range "
    "WITHOUT keys: the mor step's sidecar addresses recover the "
    "tombstoned pre-images as delete rows and its tail contributes "
    "insert rows (the delete+insert decomposition of an update), each "
    "step O(its own changes) — the keyed endpoint diff would re-shuffle "
    "the whole table. The oracle constructs the same change set "
    "relationally: delete pre-images, updated post-images, the two "
    "insert cohorts, versions stamped 1 and 2.",
)
def q_tf_changefeed_mor(spark, sf_dir):
    from ..operators import tablefmt as TF
    from .scratch import scratch_root

    ev = C.load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    half = (ev.agg(F.max("event_id")).collect()[0][0] + 1) // 2
    root = scratch_root("changefeed_mor")
    base = ev.filter(F.col("event_id") < half)
    TF.commit_version(base, root)  # v0
    batch = base.filter(F.col("user_id") % 7 == 0).select(
        "event_id", "user_id", (F.col("value") + F.lit(1000.0)).alias("value")
    ).unionByName(
        ev.filter(
            (F.col("event_id") >= half) & (F.col("user_id") % 5 == 0)
        )
    )
    TF.commit_upsert(spark, root, batch, keys=["event_id"], mor=True)  # v1
    TF.commit_append(
        ev.filter(
            (F.col("event_id") >= half) & (F.col("user_id") % 5 != 0)
        ),
        root,
    )  # v2
    # keyless: the spanning read must ride the fast path (the keyed
    # fallback REQUIRES keys=, so success here IS the plan assertion)
    return TF.table_changes(spark, root, 0)


@register(
    "q_tf_stream_changefeed",
    """
    WITH h AS (SELECT (max(event_id) + 1) // 2 AS half FROM events),
    ev AS (SELECT event_id, user_id, value FROM events)
    SELECT event_id, user_id, value,
           'delete' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
    FROM ev, h WHERE event_id < half AND user_id % 7 = 0
    UNION ALL
    SELECT event_id, user_id, value + 1000.0 AS value,
           'insert', CAST(1 AS BIGINT)
    FROM ev, h WHERE event_id < half AND user_id % 7 = 0
    UNION ALL
    SELECT event_id, user_id, value, 'insert', CAST(1 AS BIGINT)
    FROM ev, h WHERE event_id >= half AND user_id % 5 = 0
    UNION ALL
    SELECT event_id, user_id, value, 'insert', CAST(2 AS BIGINT)
    FROM ev, h WHERE event_id >= half AND user_id % 5 <> 0
    """,
    "The versioned table as a Structured Streaming SOURCE (round 10 — "
    "Delta readStream/readChangeFeed parity): the SAME base/mor-MERGE/"
    "append history as q_tf_changefeed_mor, but the change rows are "
    "served by a REAL streaming query over the custom table_changes "
    "DataSource (offsets = commit versions, one input partition per "
    "(step, directory), executor-side pyarrow reads, availableNow "
    "drain into a parquet sink — no driver collect of data). Sharing "
    "q_tf_changefeed_mor's oracle verbatim makes streaming == batch "
    "the driver-checked identity.",
)
def q_tf_stream_changefeed(spark, sf_dir):
    import os

    from ..operators import tablefmt as TF
    from ..streaming.tablestream import TableChangesDataSource
    from .scratch import scratch_root

    ev = C.load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    half = (ev.agg(F.max("event_id")).collect()[0][0] + 1) // 2
    work = scratch_root("stream_changefeed")
    root = os.path.join(work, "table")
    base = ev.filter(F.col("event_id") < half)
    TF.commit_version(base, root)  # v0
    batch = base.filter(F.col("user_id") % 7 == 0).select(
        "event_id", "user_id", (F.col("value") + F.lit(1000.0)).alias("value")
    ).unionByName(
        ev.filter(
            (F.col("event_id") >= half) & (F.col("user_id") % 5 == 0)
        )
    )
    TF.commit_upsert(spark, root, batch, keys=["event_id"], mor=True)  # v1
    TF.commit_append(
        ev.filter(
            (F.col("event_id") >= half) & (F.col("user_id") % 5 != 0)
        ),
        root,
    )  # v2
    spark.dataSource.register(TableChangesDataSource)
    out_dir = os.path.join(work, "out")
    q = (
        spark.readStream.format("table_changes")
        .option("path", root)
        # baseline at v0: the feed starts at the mor MERGE, like the
        # batch twin's table_changes(root, 0)
        .option("starting_version", "1")
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir).select(
        "event_id", "user_id", "value", "_change_type", "_commit_version"
    )


@register(
    "q_tf_stream_ratelimited",
    """
    SELECT event_id, user_id, value,
           'insert' AS _change_type,
           CAST(event_id % 4 AS BIGINT) AS _commit_version
    FROM events
    """,
    "ADMISSION CONTROL for the table_changes streaming source (round "
    "12 — Delta maxFilesPerTrigger parity): a 4-commit backlog (each "
    "commit 2 parquet files) drained under max_files_per_trigger=3 by "
    "a processing-time trigger. Offsets step THROUGH commit history — "
    "and mid-commit through its per-file plan — so the backlog lands "
    "as BOUNDED micro-batches instead of one unbounded sink "
    "transaction (the 100-TB re-seed shape). In-query audits: the "
    "drain took >1 micro-batch, and no batch spanned more than 2 "
    "commits (3-file budget over 2-file commits). Each batch appends "
    "to a parquet sink distributedly — no driver collect of data.",
)
def q_tf_stream_ratelimited(spark, sf_dir):
    import os

    from ..operators import tablefmt as TF
    from ..streaming.tablestream import TableChangesDataSource
    from .scratch import scratch_root

    ev = C.load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    work = scratch_root("stream_ratelimited")
    root = os.path.join(work, "table")
    TF.commit_version(
        ev.filter(F.col("event_id") % 4 == 0).repartition(2), root
    )  # v0: 2 files
    for m in (1, 2, 3):
        TF.commit_append(
            ev.filter(F.col("event_id") % 4 == m).repartition(2), root
        )  # v1..v3: 2 files each
    spark.dataSource.register(TableChangesDataSource)
    out_dir = os.path.join(work, "out")
    audit = {"batches": 0, "max_versions": 0}

    def sink(df, _batch_id):
        # distributed append with the version-span audit riding the
        # SAME write job as an Observation metric (round 13, guide §5):
        # the separate countDistinct action re-read the micro-batch
        # from the source once per trigger
        from pyspark.sql import Observation

        obs = Observation()
        # collect_set, not countDistinct: observed metrics reject
        # DISTINCT aggregates; the span is <= a few versions by design
        df.observe(
            obs, F.collect_set("_commit_version").alias("vs")
        ).write.mode("append").parquet(out_dir)
        n = len(obs.get["vs"] or [])
        if n:
            audit["batches"] += 1
            audit["max_versions"] = max(audit["max_versions"], n)

    q = (
        spark.readStream.format("table_changes")
        .option("path", root)
        .option("max_files_per_trigger", "3")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert audit["batches"] > 1, (
        f"admission control did not bound the drain: {audit}"
    )
    assert audit["max_versions"] <= 2, (
        f"a micro-batch spanned more than 2 commits: {audit}"
    )
    return spark.read.parquet(out_dir).select(
        "event_id", "user_id", "value", "_change_type", "_commit_version"
    )


@register(
    "q_tf_check_constraints",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(CASE WHEN user_id % 9 = 0 THEN value + 500.0
                              ELSE value END AS DECIMAL(38,6)))
                AS DOUBLE) AS sum_value
    FROM events
    """,
    "Table-layer CHECK constraints (round 10 — Delta ALTER TABLE ADD "
    "CONSTRAINT parity): events committed, a row-level CHECK "
    "registered (validated against the live snapshot first), then the "
    "write paths are exercised against it IN-QUERY — a violating "
    "append and a violating merge-on-read update must refuse BEFORE "
    "landing anything (version asserted unchanged), and a valid "
    "merge-on-read MERGE (value + 500 on the user_id%9 cohort) passes "
    "enforcement and lands. The oracle is the final-state aggregate "
    "computed relationally.",
)
def q_tf_check_constraints(spark, sf_dir):
    from ..operators import tablefmt as TF
    from .scratch import scratch_root

    ev = C.load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    root = scratch_root("check_constraints")
    TF.commit_version(ev, root)
    TF.add_constraint(
        spark, root, "ck_ids", "event_id >= 0 AND user_id >= 0"
    )
    v0 = TF.latest_version(root)
    bad = spark.createDataFrame(
        [(-1, -1, 0.0)], "event_id long, user_id long, value double"
    )
    # Anchor the violating update to a user_id that EXISTS (scalar
    # collect) and make the set-expression violating for any event_id
    # >= 0 — update_where_dv is a no-op (and cannot refuse) when its
    # predicate matches zero rows, so a synthetic cohort like
    # "user_id % 9 = 1" could be empty at a small scale factor and the
    # refusal assertion below would trip on a vacuous success.
    anchor_uid = ev.agg(F.max("user_id").alias("m")).first()["m"]
    assert anchor_uid is not None and anchor_uid >= 0, anchor_uid
    for attempt in (
        lambda: TF.commit_append(bad, root),
        lambda: TF.update_where_dv(
            spark, root, f"user_id = {int(anchor_uid)}",
            {"event_id": "0 - event_id - 1"},
        ),
    ):
        try:
            attempt()
        except ValueError as e:
            assert "ck_ids" in str(e), e
        else:
            raise AssertionError("violating write must refuse")
    assert TF.latest_version(root) == v0, "refused writes must land nothing"
    batch = ev.filter(F.col("user_id") % 9 == 0).select(
        "event_id", "user_id",
        (F.col("value") + F.lit(500.0)).alias("value"),
    )
    TF.commit_upsert(spark, root, batch, keys=["event_id"], mor=True)
    return TF.read_version(spark, root).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .cast("double")
        .alias("sum_value"),
    )


@register(
    "q_tf_column_rename",
    """
    WITH base AS (
        SELECT event_id, user_id, value FROM events
    ),
    after_del AS (
        SELECT * FROM base WHERE event_id % 5 <> 0
    ),
    after_upd AS (
        SELECT event_id, user_id,
               CASE WHEN event_id % 7 = 1 THEN value + 100.0
                    ELSE value END AS reading
        FROM after_del
    ),
    appended AS (
        SELECT event_id + 1000000000 AS event_id, user_id,
               value AS reading
        FROM base WHERE user_id % 11 = 3
    ),
    final AS (
        SELECT * FROM after_upd UNION ALL SELECT * FROM appended
    )
    SELECT CAST(user_id % 3 AS BIGINT) AS grp,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(reading AS DECIMAL(38,6))) AS DOUBLE)
               AS sum_reading
    FROM final
    GROUP BY 1
    """,
    "Column mapping (round 11 — Delta column-mapping RENAME parity): "
    "events committed, value RENAMED to reading as a METADATA-ONLY "
    "commit (zero data bytes rewritten — the data file set is asserted "
    "byte-identical in-query, and time travel still serves the old "
    "name), then the renamed table is exercised end-to-end: a DV "
    "delete and a DV update whose predicate/SET speak the new name, an "
    "append under the new name (stored physically under the original "
    "slot), a pruned read audited to skip the base directory, and a "
    "second rename (user_id -> uid) AFTER the mutations. The oracle "
    "reconstructs the final state relationally.",
)
def q_tf_column_rename(spark, sf_dir):
    import os

    from ..operators import tablefmt as TF
    from .scratch import scratch_root

    ev = C.load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    root = scratch_root("column_rename")
    TF.commit_version(ev, root)  # v0

    def data_files():
        out = {}
        for dirpath, _dirs, files in os.walk(os.path.join(root, "data")):
            for n in files:
                p = os.path.join(dirpath, n)
                out[os.path.relpath(p, root)] = (
                    os.path.getsize(p), os.path.getmtime(p)
                )
        return out

    before = data_files()
    TF.rename_column(root, "value", "reading")  # v1: metadata-only
    assert data_files() == before, "rename must rewrite zero data bytes"
    assert TF.read_version(spark, root, 0).columns == [
        "event_id", "user_id", "value",
    ], "time travel must serve the pre-rename schema"

    # the renamed column in predicates, SET expressions, and appends
    TF.delete_where_dv(spark, root, "event_id % 5 = 0")  # v2
    TF.update_where_dv(
        spark, root, "event_id % 7 = 1", {"reading": "reading + 100.0"}
    )  # v3 (no-op rows were already deleted; matches oracle sequencing)
    batch = ev.filter(F.col("user_id") % 11 == 3).select(
        (F.col("event_id") + F.lit(1000000000)).alias("event_id"),
        "user_id",
        F.col("value").alias("reading"),
    )
    TF.commit_append(batch, root)  # v4

    # pruned read over the mapping: the appended tail owns the shifted
    # id range, so an event_id lower bound keeps ONLY that directory
    audit = {}
    tail_only = TF.read_version(
        spark, root, prune={"event_id": (1000000000, None)}, audit=audit
    ).filter(F.col("event_id") >= 1000000000)
    assert audit["dirs_kept"] < audit["dirs_total"], audit
    assert tail_only.count() == batch.count()

    TF.rename_column(root, "user_id", "uid")  # v5: rename AFTER mutations
    return (
        TF.read_version(spark, root)
        .groupBy((F.col("uid") % 3).cast("long").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("reading").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_reading"),
        )
    )


@register(
    "q_tf_column_drop",
    """
    WITH base AS (
        SELECT event_id, user_id, value FROM events
    ),
    after_del AS (
        -- the value column is metadata-dropped BEFORE this delete, so
        -- the predicate runs over the surviving schema
        SELECT event_id, user_id FROM base WHERE user_id % 4 <> 1
    ),
    readded AS (
        -- value re-added via schema evolution: a fresh physical slot,
        -- NULL for every pre-existing row, populated only by the new
        -- append (shifted ids; + 0.25 marks the new writes)
        SELECT event_id, user_id, CAST(NULL AS DOUBLE) AS value
        FROM after_del
        UNION ALL
        SELECT event_id + 2000000000 AS event_id, user_id,
               value + 0.25 AS value
        FROM base WHERE user_id % 13 = 2
    )
    SELECT CAST(user_id % 5 AS BIGINT) AS grp,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(value) AS BIGINT) AS n_value,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
    FROM readded
    GROUP BY 1
    """,
    "Column mapping part 2 (round 11 — Delta DROP COLUMN + re-add "
    "parity): events committed, value DROPPED as a METADATA-ONLY "
    "commit (data file set asserted byte-identical in-query; time "
    "travel still serves it), a DV delete runs over the surviving "
    "schema, then value is RE-ADDED via commit_append(evolve=True) — "
    "the mapping assigns a fresh physical slot (asserted), so the "
    "dropped column's old bytes must NOT resurface: pre-existing rows "
    "read NULL and only the new append carries values. The oracle "
    "reconstructs drop/re-add relationally; COUNT(value) pins the "
    "no-resurface guarantee in the hash.",
)
def q_tf_column_drop(spark, sf_dir):
    import json as _json
    import os

    from ..operators import tablefmt as TF
    from .scratch import scratch_root

    ev = C.load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    root = scratch_root("column_drop")
    TF.commit_version(ev, root)  # v0

    def data_files():
        out = {}
        for dirpath, _dirs, files in os.walk(os.path.join(root, "data")):
            for n in files:
                p = os.path.join(dirpath, n)
                out[os.path.relpath(p, root)] = (
                    os.path.getsize(p), os.path.getmtime(p)
                )
        return out

    before = data_files()
    TF.drop_column(root, "value")  # v1: metadata-only
    assert data_files() == before, "drop must rewrite zero data bytes"
    assert TF.read_version(spark, root).columns == ["event_id", "user_id"]
    assert TF.read_version(spark, root, 0).columns == [
        "event_id", "user_id", "value",
    ], "time travel must serve the pre-drop schema"

    TF.delete_where_dv(spark, root, "user_id % 4 = 1")  # v2
    batch = ev.filter(F.col("user_id") % 13 == 2).select(
        (F.col("event_id") + F.lit(2000000000)).alias("event_id"),
        "user_id",
        (F.col("value") + F.lit(0.25)).alias("value"),
    )
    TF.commit_append(batch, root, evolve=True)  # v3: re-add
    with open(TF._manifest_path(root, TF.latest_version(root))) as f:
        m = _json.load(f)
    assert m.get("retired") == ["value"], m.get("retired")
    assert m["colmap"]["value"].startswith("value__p"), m.get("colmap")

    return (
        TF.read_version(spark, root)
        .groupBy((F.col("user_id") % 5).cast("long").alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.col("value")).alias("n_value"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )
