"""[EXT] E4 — text-analysis operators for LLM training-data pipelines
(SURVEY.md §2.11; north-star requirement in BASELINE.json).

All pure Column expressions — JVM-side, codegen'd, no Python in the hot
path. At 100 TB these run as a single parquet scan with column pruning
(only ``text`` + ids read) and no shuffle: per-document metrics are
embarrassingly parallel projections.

Conventions: documents are whitespace-tokenized (the fixture corpus is
single-space separated); metrics that divide counts do the division in
double AFTER exact integer counting, keeping Spark/DuckDB results
bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword inventories for the n-gram/lexicon lang-id
# heuristic. Deliberately minimal — the operator's shape (per-language hit
# counting + argmax) is what scales, not the lexicon.
LANG_STOPWORDS = {
    "en": ["the", "a", "is", "and", "of"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "et", "est", "un"],
    "es": ["el", "la", "y", "es", "un"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (split on single spaces, fixture convention)."""
    return F.split(text, " ")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def stopword_hits(text: Column, words: list[str]) -> Column:
    """Count of tokens in ``words`` — a higher-order filter, no UDF."""
    return F.size(F.filter(tokens(text), lambda w: w.isin(*words))).cast("long")


def quality_metrics(
    docs: DataFrame, text_col: str = "text", extra: tuple[str, ...] = ()
) -> DataFrame:
    """Per-document quality scoring: length, token count, mean word length,
    stopword ratio, punctuation ratio, uppercase ratio.

    The standard cheap heuristics used to filter web corpora before
    training (C4/Gopher-style rules); each is a pure projection.
    ``extra`` names input columns carried through unchanged (so composed
    pipelines keep e.g. lang/text without a second corpus scan).
    """
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_tokens = token_count(t)
    # single-space corpus: chars = sum(word lens) + (tokens - 1)
    mean_word_len = (n_chars - (n_tokens - 1)).cast("double") / n_tokens.cast("double")
    n_stop = stopword_hits(t, LANG_STOPWORDS["en"])
    n_punct = (
        n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    ).cast("long")
    n_upper = (
        n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    ).cast("long")
    return docs.select(
        "doc_id",
        *extra,
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        mean_word_len.alias("mean_word_len"),
        (n_stop.cast("double") / n_tokens.cast("double")).alias("stopword_ratio"),
        # clamped denominator: empty text has n_chars = 0 and ANSI mode
        # raises DIVIDE_BY_ZERO instead of returning NULL (the repo-wide
        # total-arithmetic rule, see timeseries.rolling_zscore_anomalies);
        # for the empty doc both ratios are 0/1 = 0.0 in both engines
        (n_punct.cast("double")
         / F.greatest(n_chars, F.lit(1)).cast("double")).alias("punct_ratio"),
        (n_upper.cast("double")
         / F.greatest(n_chars, F.lit(1)).cast("double")).alias("upper_ratio"),
    )


def lang_id(
    docs: DataFrame, text_col: str = "text", extra: tuple[str, ...] = ("lang",)
) -> DataFrame:
    """Stopword-lexicon language ID: per-language hit count, argmax wins;
    ties and zero-hit documents fall back to 'und' (undetermined).

    Deterministic argmax: higher count wins, then lexicographically
    smaller language code (so the oracle can reproduce the tie-break).
    ``extra`` names input columns carried through unchanged — the
    fixture's ground-truth ``lang`` by default; pass ``()`` for a corpus
    that has no such column (the natural language-ID input is just
    (doc_id, text)).
    """
    t = F.col(text_col)
    hit_cols = [
        stopword_hits(t, words).alias(f"hits_{lang}")
        for lang, words in sorted(LANG_STOPWORDS.items())
    ]
    scored = docs.select("doc_id", *extra, *hit_cols)
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"hits_{lang}") for lang in langs])
    guess = F.lit("und")
    # first (lexicographically) language achieving the max wins; build the
    # chain in reverse so earlier langs take precedence
    for lang in reversed(langs):
        guess = F.when(
            (F.col(f"hits_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(guess)
    return scored.select(
        "doc_id",
        *extra,
        guess.alias("lang_guess"),
        *[F.col(f"hits_{lang}") for lang in langs],
    )


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array<string> — the E2 dedup unit.

    Built from slice + chained zip_with (JVM higher-order functions, no
    UDF): gram i = ws[i] ++ ws[i+1] ++ ... — each of the n slices scans the
    token array once, so the row cost is O(n*k). (The transform-over-
    sequence form with element_at(ws, i+j) inlines the tokenizer into the
    per-element lambda — O(n*k) *tokenizations* per row, measured ~4x the
    whole shingle stage at sf0.1.)

    Documents shorter than n words yield a single shingle = whole text,
    so no document silently disappears from dedup.
    """
    ws = tokens(text)
    k = F.size(ws)
    m = k - (n - 1)  # number of n-grams
    grams = F.slice(ws, 1, m)
    for j in range(1, n):
        grams = F.zip_with(
            grams, F.slice(ws, j + 1, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.when(k >= n, grams).otherwise(F.array(text))


def fingerprint(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Document fingerprinting: md5 whole-text digest plus a min-hash-style
    shingle fingerprint (lexicographic min over md5(word-3-gram)) — the
    1-permutation MinHash special case, stable across engines.
    """
    t = F.col(text_col)
    grams = word_ngrams(t, n)
    min_gram_md5 = F.array_min(F.transform(grams, lambda g: F.md5(g)))
    return docs.select(
        "doc_id",
        F.md5(t).alias("md5_digest"),
        min_gram_md5.alias("shingle_fingerprint"),
    )


def quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_tokens: int = 20,
    max_mean_word_len: float = 12.0,
    min_stopword_ratio: float = 0.005,
    max_punct_ratio: float = 0.2,
    extra: tuple[str, ...] = (),
) -> DataFrame:
    """E4 — the composed C4/Gopher-style KEEP filter: documents passing all
    cheap quality gates (length, word-length sanity, stopword floor,
    punctuation ceiling). This is the operator an LLM-data pipeline
    actually runs — metrics exist to be thresholded. Pure projection +
    filter over one scan; the predicate pushes to the parquet reader's
    row-group stats where the corpus is length-sorted. ``extra`` columns
    ride through for composed pipelines (curate.curate_corpus)."""
    m = quality_metrics(docs, text_col, extra=extra)
    return m.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
        & (F.col("punct_ratio") <= max_punct_ratio)
    ).select(
        "doc_id",
        *extra,
        "n_tokens",
        "mean_word_len",
        "stopword_ratio",
        "punct_ratio",
    )


# GPT-2-style pretokenizer shape: contractions, letter runs, digit runs,
# punctuation runs. Identical match semantics in Spark (Java regex) and
# DuckDB (RE2) for this pattern — pinned by the q_e4_token_count oracle.
BPE_ISH_PATTERN = r"'([a-z]+)|[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def bpe_ish_tokens(text: Column) -> Column:
    """BPE-ish regex tokenization (the LLM-pipeline token-count unit —
    word-level pretokens, not byte merges)."""
    return F.regexp_extract_all(text, F.lit(BPE_ISH_PATTERN), 0)


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """E4 — per-document token counting: whitespace tokens vs BPE-ish
    regex pretokens plus the distinct-pretoken count. One projection, no
    shuffle at any scale."""
    t = F.col(text_col)
    bpe = bpe_ish_tokens(t)
    return docs.select(
        "doc_id",
        F.size(tokens(t)).cast("long").alias("n_tokens_ws"),
        F.size(bpe).cast("long").alias("n_tokens_bpe"),
        F.size(F.array_distinct(bpe)).cast("long").alias("n_unique_bpe"),
    )


POSITIVE_LEXICON = ["fast", "big"]
NEGATIVE_LEXICON = ["slow", "small"]


def sentiment_score(
    docs: DataFrame,
    text_col: str = "text",
    positive: list[str] | None = None,
    negative: list[str] | None = None,
) -> DataFrame:
    """E4 — lexicon-based sentiment-style scoring (§2.11's vectorizable
    scorer): score = (|positive hits| - |negative hits|) / n_tokens in
    [-1, 1], plus the raw hit counts and a 3-way label.

    Pure higher-order Column expressions — the JVM fast path; a
    pandas_udf would only pay Arrow transfer for arithmetic the codegen
    engine already vectorizes (same reasoning as X1-X3). The division is
    exact-int over double on both engines, so the oracle hash-matches.
    """
    # explicit None check: an explicitly-passed EMPTY lexicon means
    # "score zero hits for this polarity", not "use the default"
    pos = positive if positive is not None else POSITIVE_LEXICON
    neg = negative if negative is not None else NEGATIVE_LEXICON
    t = F.col(text_col)
    n_pos = stopword_hits(t, pos)
    n_neg = stopword_hits(t, neg)
    score = (n_pos - n_neg).cast("double") / token_count(t).cast("double")
    return docs.select(
        "doc_id",
        n_pos.alias("n_pos"),
        n_neg.alias("n_neg"),
        score.alias("sentiment"),
        F.when(score > 0, "positive")
        .when(score < 0, "negative")
        .otherwise("neutral")
        .alias("label"),
    )


def winnowing_fingerprints(
    docs: DataFrame, text_col: str = "text", k: int = 3, w: int = 4
) -> DataFrame:
    """E4 — winnowing document fingerprints (Schleimer et al., SIGMOD'03 —
    the rolling-hash fingerprint scheme MOSS uses): hash every word
    k-gram, slide a window of ``w`` consecutive hashes, keep each
    window's minimum, dedupe. Guarantees any shared run of >= w+k-1
    words between two documents shares at least one fingerprint, at
    ~2/(w+1) of the full hash density.

    Pure higher-order expressions: the k-gram hash is md5 (portable hex,
    oracle-reproducible), window minima via transform over a position
    sequence + array_min(slice) — O(grams x w) per document, no shuffle,
    no UDF. Output one row per distinct fingerprint (doc_id, fp).
    """
    grams = word_ngrams(F.col(text_col), k)
    hashes = F.transform(grams, lambda g: F.md5(g))
    n = F.size(hashes)
    mins = F.transform(
        F.sequence(F.lit(1), F.greatest(n - w + 1, F.lit(1))),
        lambda i: F.array_min(F.slice(hashes, i, w)),
    )
    return docs.select(
        "doc_id", F.explode(F.array_distinct(mins)).alias("fp")
    )


# ---------------------------------------------------------------------------
# E4 — PII redaction. Patterns restricted to the regex subset Java
# (Spark codegen) and RE2 (DuckDB oracle) evaluate identically: explicit
# character classes, bounded quantifiers, \b word boundaries — no
# lookaround, no backreferences. Applied in a fixed order (email before
# IP before phone) so earlier replacements can't create later matches;
# the replacement tokens contain no digits or '@' for the same reason.
# ---------------------------------------------------------------------------

PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9() -]{7,}[0-9]", "<PHONE>"),
)


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """E4 — PII redaction: replace emails, IPv4 addresses, and phone-like
    digit runs with typed placeholder tokens, and count each class
    (counted BEFORE redaction, on the same text each pattern actually
    sees). A pure projection — chained ``regexp_replace`` stays inside
    whole-stage codegen, one scan, no shuffle at any scale.

    The training-data motivation: corpus PII must be stripped before
    tokenization, and the counts feed the quality dashboard (a doc that
    is mostly PII is usually boilerplate or a scrape artifact).
    """
    out = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(
            # idx=0 = whole match: Spark defaults to group 1 and errors on
            # group-less patterns; DuckDB's default group is already 0
            F.size(F.regexp_extract_all(out, F.lit(pat), 0)).cast("long").alias(
                f"n_{name}"
            )
        )
        out = F.regexp_replace(out, pat, repl)
    return docs.select("doc_id", out.alias("clean_text"), *counts)


def repetition_metrics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """E4 — Gopher-style repetition signals: the fraction of tokens taken
    by the single most frequent word, and of bigram slots by the most
    frequent word-bigram. High values mark keyboard-mash / boilerplate /
    template spam that the length+punctuation heuristics miss.

    Shape: two explode -> count -> per-doc max pipelines joined on
    doc_id. The shuffle keys are (doc_id, gram) — high cardinality, no
    skew — with map-side partial counts; the corpus is scanned twice
    (words + bigrams branch) rather than materializing per-doc token
    arrays, the cheaper trade at scale. Documents shorter than the gram
    size collapse to one whole-text gram (fraction 1.0) — mirroring
    word_ngrams so no doc silently disappears."""
    toks = tokens(F.col(text_col))

    def top_frac(gram_col, out_name):
        exploded = docs.select(
            "doc_id",
            F.size(gram_col).cast("long").alias("_n"),
            F.explode(gram_col).alias("_g"),
        )
        return (
            exploded.groupBy("doc_id", "_n", "_g")
            .agg(F.count("*").alias("_c"))
            .groupBy("doc_id", "_n")
            .agg(F.max("_c").alias("_m"))
            .select(
                "doc_id",
                (F.col("_m").cast("double") / F.col("_n").cast("double")).alias(
                    out_name
                ),
                F.col("_n").alias(f"_n_{out_name}"),
            )
        )

    words = top_frac(toks, "top_word_frac").withColumnRenamed(
        "_n_top_word_frac", "n_tokens"
    )
    bigrams = top_frac(word_ngrams(F.col(text_col), 2), "top_bigram_frac").drop(
        "_n_top_bigram_frac"
    )
    return words.join(bigrams, "doc_id").select(
        "doc_id", "n_tokens", "top_word_frac", "top_bigram_frac"
    )


def frequent_tokens(
    docs: DataFrame,
    min_frac: float = 0.002,
    capacity: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """E4 — corpus-level heavy hitters: every token whose corpus frequency
    exceeds ``min_frac`` of all tokens, with its exact count. The
    vocabulary audit step of a curation pipeline (boilerplate markers,
    templating artifacts, tokenizer hot spots).

    Two-phase sketch-then-verify — the full explode->groupBy over the
    whole vocabulary never happens:

    1. **Candidates**: one ``mapInPandas`` pass keeps a per-partition
       Misra-Gries summary (mergeable-summaries form: absorb a batch
       Counter, then subtract the (capacity+1)-th largest count from all
       and drop non-positives). MG guarantees any token with partition
       frequency > n_p/capacity survives its partition's summary; by
       averaging, a token with GLOBAL frequency > N/capacity survives in
       at least one partition — so with capacity >= 1/min_frac the union
       of summaries is a superset of the answer. Emitted rows per
       partition <= capacity, so the candidate set is
       O(partitions x capacity) — broadcast-sized by construction.
    2. **Verify**: exact counts for candidate tokens only — explode,
       broadcast-semi-join against the candidates, groupBy(token) with
       map-side partial aggregation (shuffle carries <= candidates rows
       per map partition), then filter against the exact total token
       count (a 1-row scalar broadcast).

    The result is EXACT (the sketch only prunes, the verify recounts), so
    a plain SQL HAVING oracle checks it. Returns (token, cnt).
    """
    import pandas as pd

    cap = capacity or max(64, int(2.0 / min_frac))
    if cap < 1.0 / min_frac:
        raise ValueError(
            f"capacity {cap} below 1/min_frac ({1.0 / min_frac:.0f}) — the "
            "Misra-Gries superset guarantee would not hold and the result "
            "could silently miss heavy hitters"
        )
    toks = tokens(F.col(text_col))

    def mg_candidates(batches):
        sketch = mg_summary(batches, cap, "_toks")
        yield pd.DataFrame({"token": list(sketch.keys())})

    cands = (
        docs.select(toks.alias("_toks"))
        .mapInPandas(mg_candidates, "token string")
        .distinct()
    )
    return exact_token_counts(docs, cands, min_frac, text_col)


def mg_trim(sketch, cap: int):
    """Misra-Gries trim (mergeable-summaries form): subtract the
    (cap+1)-th largest count from everything; at most cap entries stay
    positive. Shared by the batch operator and the streaming sink — the
    guarantee lives in ONE place."""
    import heapq
    from collections import Counter

    if len(sketch) <= cap:
        return sketch
    kth = heapq.nlargest(cap + 1, sketch.values())[-1]
    return Counter({t: c - kth for t, c in sketch.items() if c > kth})


def mg_summary(batches, cap: int, col: str):
    """Fold Arrow batches of token arrays into one capacity-bounded MG
    summary (Counter)."""
    from collections import Counter

    sketch: "Counter" = Counter()
    for pdf in batches:
        batch = Counter()
        for s in pdf[col]:
            batch.update(s)
        sketch.update(batch)
        sketch = mg_trim(sketch, cap)
    return sketch


def exact_token_counts(
    docs: DataFrame,
    cands: DataFrame,
    min_frac: float,
    text_col: str = "text",
) -> DataFrame:
    """Heavy-hitters verify phase, shared by the batch operator and the
    streaming sink: exact counts for candidate tokens only (explode +
    broadcast semi-join + map-side-combined groupBy), thresholded
    against the exact total token count (1-row scalar broadcast; the
    denominator comes from a column-pruned size() scan, not a third
    explode)."""
    toks = tokens(F.col(text_col))
    exploded = docs.select(F.explode(toks).alias("token"))
    totals = docs.agg(F.sum(F.size(toks)).cast("long").alias("_total"))
    return (
        exploded.join(F.broadcast(cands), "token", "left_semi")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .join(F.broadcast(totals))
        .filter(F.col("cnt") > F.lit(min_frac) * F.col("_total"))
        .select("token", "cnt")
    )


def unigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """E4 — unigram language-model quality score: per document, the mean
    negative log-probability of its tokens under the corpus's own unigram
    distribution. The cheap stand-in for model-based perplexity filtering
    — outlier docs (rare-token soup, wrong language, mojibake) score
    high; boilerplate scores abnormally low.

    Shape: one explode->groupBy builds the vocabulary (shuffle key =
    token, map-side combine); the scoring pass joins occurrences to the
    vocabulary on token (both sides corpus-derived, so a shuffle join —
    the vocab is NOT assumed broadcastable at scale) and aggregates per
    doc_id. Two corpus scans (vocab + score), the same trade
    ``repetition_metrics`` documents.
    Each addend ln(cnt/N) is cast to DECIMAL(38,6) before the per-doc
    sum, making the sum order-independent so Spark and the SQL oracle
    agree bit-for-bit (the TPC-H convention in plans/analytics.py).

    Returns (doc_id, n_tokens, nll).
    """
    toks = tokens(F.col(text_col))
    occurrences = docs.select("doc_id", F.explode(toks).alias("token"))
    vocab = occurrences.groupBy("token").agg(F.count("*").alias("_cnt"))
    # total token count derived FROM the vocab so the groupBy exchange is
    # shared (ReusedExchange) between the totals branch and the join probe
    totals = vocab.agg(F.sum("_cnt").alias("_total"))
    logp = F.log(F.col("_cnt") / F.col("_total")).cast("decimal(38,6)")
    return (
        occurrences.join(vocab, "token")
        .join(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            (-F.sum(logp).cast("double") / F.count("*")).alias("nll"),
        )
        .select("doc_id", "n_tokens", "nll")
    )


def token_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """E4 — per-document Shannon entropy of the token distribution (nats):
    the diversity signal that catches repetition the top-word fraction
    misses (a doc cycling five words evenly has low top-word share but
    low entropy too).

    One explode -> count per (doc, token) -> per-doc aggregate; the
    per-doc total is derived from the counts themselves (sum, not a
    second scan). Each p*ln(p) term is cast to DECIMAL(38,6) before the
    sum (order-independent, oracle-exact); the final negate/cast runs in
    double. Returns (doc_id, n_tokens, n_distinct, entropy).
    """
    toks = tokens(F.col(text_col))
    counts = (
        docs.select("doc_id", F.explode(toks).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("_c"))
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("_c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.collect_list(F.col("_c")).alias("_cs"),
    )
    # entropy from the count list: p = c/n, term = p*ln(p) quantized —
    # aggregate over the (bounded: distinct tokens per doc) array keeps
    # the whole computation in one projection
    n = F.col("n_tokens").cast("double")

    def term(c):
        p = c.cast("double") / n
        return (p * F.log(p)).cast("decimal(38,6)")

    ent = F.aggregate(
        F.col("_cs"),
        F.lit(0).cast("decimal(38,6)"),
        lambda acc, c: acc + term(c),
    )
    return per_doc.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        (-ent.cast("double")).alias("entropy"),
    )
