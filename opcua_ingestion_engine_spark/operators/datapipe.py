"""[EXT] E8 — dataset-assembly operators for LLM training pipelines:
deterministic splits, stratified sampling, benchmark-contamination
flagging, and concat-and-chunk sequence packing.

These are the steps between a curated corpus (E1/E2/E4 output) and a
training run. None exist in the reference (its data plane ends at the
state table); they complete the training-data story the [EXT] brief
asks for. Every operator here is DETERMINISTIC — assignment follows
content/id hashes, never an RNG — so reruns, resumed jobs, and the
DuckDB oracles all agree row-for-row.

Scale shapes:

- split/sample: pure projections on md5 hex prefixes — no shuffle, no
  state, embarrassingly parallel at any scale. md5 (not xxhash64)
  because the assignment must be portable across engines and stable
  forever (it lands in dataset manifests); the hex-prefix comparison
  against a fixed-width threshold string gives exact fractions of
  2^16 buckets.
- contamination: inverted n-gram index — explode benchmark docs' grams
  (the SMALL side, distinct), one shuffle of corpus grams for the
  semi-join probe, distinct doc ids out. Never a doc-x-doc comparison.
- packing: per-partition-key running token offsets (one window sort per
  key). The GLOBAL concat order a single-stream pack would need is
  deliberately avoided: a whole-corpus window is a single-partition
  sort at 100 TB. Packing within a partition key (language here;
  source shard in production) is what distributed training pipelines
  do anyway — each shard's chunks are independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .text import word_ngrams


def _bucket_hex(col: Column, salt: str) -> Column:
    """First 4 hex chars of md5('<salt>:<value>') — a uniform bucket in
    [0, 2^16) encoded as a fixed-width lowercase hex string, so a plain
    string comparison against a threshold implements fraction cuts
    identically in Spark and any SQL oracle."""
    return F.substring(
        F.md5(F.encode(F.concat_ws(":", F.lit(salt), col.cast("string")), "UTF-8")),
        1,
        4,
    )


def frac_hex(frac: float) -> str:
    """The threshold t with P[bucket_hex < t] == round(frac*2^16)/2^16.
    A fraction that rounds to 1 returns "g", which sorts after every hex
    string (keep-all) — formatting 65536 into 4 hex digits would wrap to
    "0000" and keep NOTHING."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {frac}")
    bucket = int(round(frac * 65536))
    return "g" if bucket >= 65536 else format(bucket, "04x")


def split_assign(
    docs: DataFrame,
    salt: str = "split-v1",
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """E8 — deterministic train/val/test assignment by id hash: bucket =
    md5 prefix of (salt, doc_id); train gets [0, train), val
    [train, train+val), test the rest. Changing the salt re-rolls every
    assignment; adding documents never moves an existing one (the
    property a content-addressed manifest needs)."""
    if train + val > 1.0:
        raise ValueError(f"train+val must be <= 1, got {train + val}")
    h = _bucket_hex(F.col("doc_id"), salt)
    t_train, t_val = frac_hex(train), frac_hex(train + val)
    return docs.select(
        "doc_id",
        F.when(h < t_train, F.lit("train"))
        .when(h < t_val, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def stratified_sample(
    docs: DataFrame,
    rates: dict[str, float],
    salt: str = "sample-v1",
    default_rate: float = 0.0,
    strata_col: str = "lang",
) -> DataFrame:
    """E8 — per-stratum deterministic sampling (corpus mixing): keep a
    document iff its (salt, doc_id) bucket falls under its stratum's
    rate. The per-language rate dict IS the mixing recipe — e.g. keep
    100% of a scarce language and 10% of an abundant one. Pure
    projection + filter; rates ride as a literal CASE, no join."""
    h = _bucket_hex(F.col("doc_id"), salt)
    thresh = F.lit(frac_hex(default_rate))
    for stratum, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == stratum, F.lit(frac_hex(rate))
        ).otherwise(thresh)
    return docs.filter(h < thresh).select("doc_id", strata_col)


def contamination_flags(
    docs: DataFrame,
    text_col: str = "text",
    n: int = 8,
    bench_mod: int = 97,
) -> DataFrame:
    """E8 — benchmark-contamination check: flag every corpus document
    sharing at least one word-``n``-gram with the benchmark set. The
    benchmark here is the fixture stand-in ``doc_id % bench_mod == 0``
    (in production: the eval suites); flagged docs are excluded from
    training to avoid eval leakage.

    Shape: the benchmark's distinct grams are the SMALL (broadcast-
    eligible) side; corpus grams left-join them with a hit marker and a
    per-doc ``bool_or`` aggregation produces the flag — exactly TWO
    corpus passes (benchmark slice + corpus slice), one groupBy shuffle
    on doc_id with map-side partial aggregation. Long n-grams (default
    8) keep the gram space high-cardinality, so the join key is
    skew-free."""
    is_bench = (F.col("doc_id") % bench_mod) == 0
    grams = F.array_distinct(word_ngrams(F.col(text_col), n))
    bench_grams = (
        docs.filter(is_bench)
        .select(F.explode(grams).alias("g"))
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
    marked = (
        docs.filter(~is_bench)
        .select("doc_id", F.explode(grams).alias("g"))
        .join(bench_grams, "g", "left")
    )
    return marked.groupBy("doc_id").agg(
        F.coalesce(F.bool_or("_hit"), F.lit(False)).alias("contaminated")
    )


def domain_mix_quota(
    docs: DataFrame,
    alpha: float = 0.5,
    total: int = 100,
    strata_col: str = "source",
    salt: str = "mix-v1",
) -> DataFrame:
    """E8 — temperature-scaled domain mixing (the multilingual /
    multi-source sampling recipe: weight each domain by count^alpha, so
    alpha<1 up-samples scarce domains and down-samples abundant ones).
    Per-domain quota = floor(count^alpha / sum(count^alpha) * total);
    the quota is filled by the first ``quota`` documents in md5-bucket
    order — a deterministic stand-in for uniform-without-replacement
    that reruns, resumed jobs, and SQL oracles reproduce exactly.

    Shape: one groupBy on the domain column (domain cardinality is
    config-sized, so the counts frame is a broadcast join back), then
    ONE window sort per domain for the rank cut. floor (not round)
    keeps Spark and other engines bit-identical on quota boundaries.
    """
    counts = docs.groupBy(strata_col).agg(F.count("*").alias("_n"))
    # denominator via a whole-frame window over the COUNTS frame — it is
    # domain-cardinality-sized (config-sized), so the single-partition
    # window is free and avoids a second aggregation over the same scan
    # subtree (which Catalyst would execute as a second corpus pass).
    # Addends quantize to DECIMAL(38,6) so the sum is order-independent
    # (raw double summation order varies per run/engine, and floor() at
    # a quota boundary would flip on the last ulp).
    wall = W.partitionBy().rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    denom = (
        F.sum(F.pow("_n", F.lit(alpha)).cast("decimal(38,6)"))
        .over(wall)
        .cast("double")
    )
    quotas = counts.select(
        strata_col,
        F.floor(F.pow("_n", F.lit(alpha)) / denom * total).alias("_quota"),
    )
    w = W.partitionBy(strata_col).orderBy(
        F.md5(F.concat_ws(":", F.lit(salt), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return (
        docs.select("doc_id", strata_col)
        .withColumn("_rk", F.row_number().over(w))
        .join(F.broadcast(quotas), strata_col)
        .filter(F.col("_rk") <= F.col("_quota"))
        .select("doc_id", strata_col)
    )


def epoch_expand(
    docs: DataFrame,
    repeats: dict[str, float],
    strata_col: str = "source",
    default_repeat: float = 1.0,
    salt: str = "epoch-v1",
) -> DataFrame:
    """E8 — up-sampling with repetition: each domain's documents are
    repeated ``repeats[domain]`` times in the assembled corpus (the
    "N epochs of a scarce source" recipe — e.g. 4.0 for a small
    high-quality source, 0.5 to halve an abundant one). Fractional
    parts are resolved deterministically: every document gets
    floor(r) full copies, and the extra copy goes to the documents
    whose (salt, doc_id) hash bucket falls under frac(r) — so 2.25
    repeats 2x for all and 3x for a uniform quarter of them.

    Emits (doc_id, domain, epoch) with epoch in [0, copies) — the
    downstream shuffle/packing stages treat each (doc_id, epoch) row
    as an independent training sample. Pure projection + bounded
    explode (max ceil(r) rows per doc), no shuffle; assignment is a
    pure function of (salt, doc_id), stable under corpus growth."""
    if default_repeat < 0:
        raise ValueError(f"default_repeat must be >= 0, got {default_repeat}")
    h = _bucket_hex(F.col("doc_id"), salt)
    base = F.lit(int(default_repeat))
    extra_thresh = F.lit(frac_hex(default_repeat - int(default_repeat)))
    for stratum, r in sorted(repeats.items()):
        if r < 0:
            raise ValueError(f"repeat for {stratum!r} must be >= 0, got {r}")
        base = F.when(F.col(strata_col) == stratum, F.lit(int(r))).otherwise(base)
        extra_thresh = F.when(
            F.col(strata_col) == stratum, F.lit(frac_hex(r - int(r)))
        ).otherwise(extra_thresh)
    copies = base + F.when(h < extra_thresh, F.lit(1)).otherwise(F.lit(0))
    return (
        docs.select("doc_id", strata_col, copies.alias("_c"))
        .filter(F.col("_c") > 0)
        .select(
            "doc_id",
            strata_col,
            F.explode(F.sequence(F.lit(0), F.col("_c") - 1)).alias("epoch"),
        )
        .withColumn("epoch", F.col("epoch").cast("long"))
    )


def global_shuffle(
    docs: DataFrame, n_shards: int = 8, salt: str = "shuffle-v1"
) -> DataFrame:
    """E8 — deterministic corpus-scale shuffle into training shards: the
    dataloader-order permutation a pretraining run needs, computed once
    at corpus-build time instead of at read time. Shard = hash bucket of
    (salt, doc_id); position = rank of the full hash within the shard.
    The permutation is a pure function of (salt, doc_id): re-rolling the
    salt gives an independent epoch order, and appending documents never
    moves existing ones across shards (only positions after them).

    Shape: one projection + ONE window sort per shard — each shard sorts
    independently (n_shards-way parallel), never a global single-
    partition sort. At 100 TB the shard count is the write parallelism."""
    full = F.md5(F.concat_ws(":", F.lit(salt), F.col("doc_id").cast("string")))
    shard = (
        F.conv(F.substring(full, 1, 4), 16, 10).cast("long") % n_shards
    ).alias("shard")
    w = W.partitionBy("shard").orderBy("_h", "doc_id")
    return docs.select("doc_id", shard, full.alias("_h")).select(
        "doc_id",
        "shard",
        (F.row_number().over(w) - 1).cast("long").alias("position"),
    )


def quality_topk_per_domain(
    docs: DataFrame,
    keep_frac: float = 0.25,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """E8 — per-domain quality selection (the FineWeb-Edu-style recipe:
    score every document, keep the top ``keep_frac`` WITHIN each domain
    rather than globally, so a high-scoring domain doesn't crowd out the
    rest). Score here is the stopword share (the cheapest of the E4
    prose-quality signals); in production a model score column drops in
    unchanged.

    cume_dist (not a count cut) makes the selection a single window
    function per domain; ties on the score keep deterministic order via
    the doc_id tiebreak."""
    from .text import LANG_STOPWORDS, stopword_hits, token_count

    t = F.col(text_col)
    n_tokens = token_count(t).cast("double")
    n_stop = stopword_hits(t, LANG_STOPWORDS["en"]).cast("double")
    scored = docs.select(
        "doc_id",
        strata_col,
        (n_stop / n_tokens).alias("score"),
    )
    w = W.partitionBy(strata_col).orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("_cd", F.cume_dist().over(w))
        .filter(F.col("_cd") <= keep_frac)
        .select("doc_id", strata_col, "score")
    )


def pack_chunks(
    docs: DataFrame,
    text_col: str = "text",
    max_tokens: int = 2048,
    part_col: str = "lang",
    order_col: str = "doc_id",
) -> DataFrame:
    """E8 — concat-and-chunk packing: within each ``part_col`` shard,
    concatenate documents in ``order_col`` order and cut the token
    stream into ``max_tokens``-sized training chunks. Emits each doc's
    running start offset and the chunk its first token lands in —
    deterministic, resumable, and exactly the standard LLM pretraining
    layout (documents cross chunk boundaries; the chunker doesn't pad).

    One window sort per shard; never a global sort."""
    n_tok = F.size(F.split(F.col(text_col), " ")).cast("long")
    w = (
        W.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum(n_tok).over(w)
    start = (cum - n_tok).alias("start_offset")
    return docs.select(
        "doc_id",
        F.col(part_col),
        n_tok.alias("n_tokens"),
        start,
        F.floor((cum - n_tok) / max_tokens).alias("chunk_id"),
    )


def split_assign_cluster_safe(
    docs: DataFrame,
    salt: str = "split-v1",
    train: float = 0.8,
    val: float = 0.1,
    threshold: float = 0.2,
    n: int = 3,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """E8 — LEAKAGE-FREE split assignment: the prevention half of the
    ``split_leakage`` audit. Near-duplicate clusters (connected
    components over the >= ``threshold`` pair graph) are assigned to
    splits as UNITS — the bucket hash keys on the cluster REPRESENTATIVE
    (the component's min doc_id; unpaired docs represent themselves), so
    a near-dup pair straddling train/test is impossible by construction,
    not merely audited after the fact.

    ``pairs``: pass a precomputed (doc_a, doc_b, ...) pair frame — at
    100 TB that is the banded-MinHash pair table the dedup stage already
    produced; default derives the exact lang-blocked Jaccard pairs the
    audit query uses (test/oracle scale). Determinism and stability
    under corpus growth hold per CLUSTER: adding a doc never moves an
    existing SINGLETON, and joining a cluster adopts the cluster's
    assignment (its representative's hash) — exactly the semantics a
    dedup-aware manifest wants."""
    from .dedup import jaccard_pairs
    from .graph import connected_components

    if pairs is None:
        pairs = jaccard_pairs(docs, threshold=threshold, n=n)
    comp = connected_components(pairs).select(
        F.col("node").alias("doc_id"), "component"
    )
    keyed = docs.select("doc_id").join(comp, "doc_id", "left")
    rep = F.coalesce(F.col("component"), F.col("doc_id"))
    h = _bucket_hex(rep, salt)
    t_train, t_val = frac_hex(train), frac_hex(train + val)
    return keyed.select(
        "doc_id",
        F.when(h < t_train, F.lit("train"))
        .when(h < t_val, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def sliding_chunks(
    docs: DataFrame,
    max_tokens: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """E8 — per-document sliding-window chunking: split each document's
    whitespace token stream into ``max_tokens``-sized chunks whose
    starts advance by ``max_tokens - overlap`` (the standard
    context-length prep for SFT/eval corpora, where documents must NOT
    cross chunk boundaries — the complement of ``pack_chunks``'
    concat-and-cut pretraining layout). A start is emitted only when
    its chunk carries tokens the PREVIOUS chunk did not (``start +
    overlap < n_doc_tokens``, start 0 always): the final partial chunk
    is kept, but a tail the previous window already fully covered is
    not re-emitted as a redundant duplicate.

    Pure per-row JVM expressions — ``sequence`` for the start offsets,
    ``slice`` + ``array_join`` per chunk, one ``posexplode`` — so there
    is NO shuffle at any corpus size and Catalyst prunes to the two
    consumed columns. Chunk ids are dense per document in token order:
    fully deterministic, so a re-run (or the DuckDB oracle) reproduces
    the exact table."""
    if overlap >= max_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be smaller than max_tokens "
            f"({max_tokens}) — the window must advance"
        )
    stride = max_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    starts = F.filter(
        F.sequence(
            F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(stride)
        ),
        # chunk at s covers tokens the previous (s - stride) chunk did
        # not iff s + overlap < n — the previous window ends at
        # s + overlap - 1
        lambda s: (s == 0) | (s + overlap < F.size(toks)),
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.array_join(
                F.slice(toks, s + 1, max_tokens), " "
            ).alias("chunk_text"),
            F.least(F.size(toks) - s, F.lit(max_tokens))
            .cast("long").alias("n_tokens"),
        ),
    )
    return docs.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "c")
    ).select(
        id_col,
        F.col("chunk_id").cast("long"),
        F.col("c.chunk_text"),
        F.col("c.n_tokens"),
    )


def softdedup_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """E8 — soft deduplication: instead of DROPPING exact duplicates,
    weight every document by the reciprocal of its duplicate-group size
    (SoftDeDup — down-weighting repeated content preserves coverage
    while removing the over-representation bias that hard dedup and
    no-dedup both suffer). Groups are exact-content sha256 groups, the
    same digest the hard-dedup path keys on, so the two strategies are
    directly comparable on one corpus.

    Scale shape: ONE map-side-combined groupBy on the 32-byte digest
    for the group sizes, then a broadcast-unfriendly but
    group-cardinality join back — expressed as a window over the digest
    instead, so it stays a single shuffle with no join at all."""
    digest = F.sha2(F.col(text_col), 256)
    w = W.partitionBy(digest)
    return docs.select(
        F.col(id_col),
        F.count("*").over(w).cast("long").alias("cluster_size"),
        (F.lit(1.0) / F.count("*").over(w)).alias("weight"),
    )


def token_budget_sample(
    docs: DataFrame,
    budget_tokens: int,
    salt: str = "tb1",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """E8 — deterministic token-budget corpus cut: keep documents in
    md5(salt|id) hash order until the running token total reaches
    ``budget_tokens`` (a doc is kept iff the total BEFORE it is under
    budget, so the crossing document is included and the cut is never
    empty for a positive budget) — the "give me a 1T-token slice of
    this corpus" primitive, reproducible across runs and engines
    because the order key is a portable hex digest, not an RNG.

    Scale shape — an exact global prefix sum WITHOUT a global sort:
    the first 2 hex chars of the order digest split the corpus into 256
    blocks that are themselves in global order (prefix property), so
    (1) one map-side-combined groupBy computes the 256 block token
    sums, (2) a window over those 256 rows — trivially single-partition
    — turns them into block offsets, (3) the offsets broadcast-join
    back and each block computes its own partitioned running sum in
    parallel. ``cum_before = block offset + within-block prefix``: the
    exact global cumulative, with the only ordered shuffle partitioned
    256 ways. Returns (id, n_tokens, cum_before) for kept docs."""
    if budget_tokens < 0:
        raise ValueError("budget_tokens must be non-negative")
    h = F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")))
    base = docs.select(
        F.col(id_col),
        h.alias("_h"),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    ).withColumn("_b", F.substring("_h", 1, 2))
    bsums = base.groupBy("_b").agg(F.sum("n_tokens").alias("_s"))
    offs = bsums.withColumn(
        "_off",
        F.coalesce(
            F.sum("_s").over(
                W.orderBy("_b").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long"),
    ).select("_b", "_off")
    win = (
        W.partitionBy("_b")
        .orderBy("_h", id_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        base.join(F.broadcast(offs), "_b")
        .withColumn(
            "cum_before",
            (
                F.col("_off")
                + F.coalesce(F.sum("n_tokens").over(win), F.lit(0))
            ).cast("long"),
        )
        .filter(F.col("cum_before") < budget_tokens)
        .select(id_col, "n_tokens", "cum_before")
    )


# ---------------------------------------------------------------------------
# E8 — DSIR-style importance resampling (Xie et al. 2023, "Data Selection
# for Language Models via Importance Resampling")
# ---------------------------------------------------------------------------


def _gram_expr(text_col: str, ngrams: int):
    """The gram inventory of one document as an array column: whitespace
    tokens for ``ngrams=1``, positional word n-grams (``text.word_ngrams``
    — duplicates kept, short docs fall back to the whole text) above."""
    if ngrams == 1:
        return F.split(F.col(text_col), " ")
    return word_ngrams(F.col(text_col), ngrams)


def _unigram_counts(
    docs: DataFrame, text_col: str, ngrams: int = 1
) -> DataFrame:
    """(token, c) gram counts — one explode + one map-side-combined
    shuffle on the gram, the same distinct-word-sized aggregation the
    BPE trainer and heavy-hitter paths run."""
    return (
        docs.select(F.explode(_gram_expr(text_col, ngrams)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("c"))
    )


def dsir_logratio_table(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    ngrams: int = 1,
) -> DataFrame:
    """E8 (DSIR step 1) — per-token importance log-ratio between a small
    TARGET sample (the distribution you want more of) and the raw
    SOURCE corpus, under add-1-smoothed unigram LMs over the shared
    vocabulary:

        logratio(t) = ln((cT(t)+1)/(T+V)) - ln((cS(t)+1)/(S+V))

    Each ln is quantized to DECIMAL(38,6) (the ``unigram_logprob``
    oracle discipline: the double DIVISION arguments are exact
    integers, so both engines feed ln the identical double and the
    quantized terms subtract exactly). Returns (token, logratio) —
    vocab-sized, the broadcastable side of the scoring join. The three
    scalar totals (T, S, V) are driver-collected O(1) aggregates.
    ``ngrams=2`` switches the feature unit to positional word bigrams
    (the hashed-bigram form the DSIR paper uses); gram counts stay one
    distinct-gram-sized aggregation per side.

    The two count frames are MATERIALIZED (eager local checkpoints —
    both distinct-gram-sized): each has three consumers (its total, the
    vocab union, its ratio join), and left lazy the corpus explode +
    aggregation re-executes per consumer — two redundant corpus-sized
    passes. Measured: neutral at sf0.1 (fixed job overhead dominates),
    5.5 s -> 4.7 s at sf1, and the saved passes grow linearly with the
    corpus from there."""
    ct = _unigram_counts(target, text_col, ngrams).localCheckpoint(
        eager=True
    )
    cs = _unigram_counts(corpus, text_col, ngrams).localCheckpoint(
        eager=True
    )
    vocab = (
        ct.select("token").unionByName(cs.select("token")).distinct()
        .localCheckpoint(eager=False)
    )
    t_total = ct.agg(F.sum("c")).collect()[0][0] or 0
    s_total = cs.agg(F.sum("c")).collect()[0][0] or 0
    v_size = vocab.count()
    if v_size == 0:
        raise ValueError("dsir: empty vocabulary (no tokens on either side)")
    t_den = float(t_total + v_size)
    s_den = float(s_total + v_size)
    lt = F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1.0) / F.lit(t_den))
    ls = F.log((F.coalesce(F.col("cs"), F.lit(0)) + 1.0) / F.lit(s_den))
    return (
        vocab.join(ct.select("token", F.col("c").alias("ct")), "token", "left")
        .join(cs.select("token", F.col("c").alias("cs")), "token", "left")
        .select(
            "token",
            (
                lt.cast("decimal(38,6)") - ls.cast("decimal(38,6)")
            ).alias("logratio"),
        )
    )


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngrams: int = 1,
) -> DataFrame:
    """E8 (DSIR step 2) — per-document importance log-weight: the sum of
    its tokens' logratios (token OCCURRENCES, not distinct tokens — the
    product of per-token likelihood ratios in log space). Exact DECIMAL
    summation, so Spark and a SQL oracle agree bitwise.

    Scale shape: one explode + one join against the vocab-sized ratio
    table (broadcast when it fits — AQE's call) + one groupBy(doc) —
    token-linear like every E4 text family. The ratio table is
    MATERIALIZED (eager local checkpoint — vocab-sized, the "small
    intermediate" case) so the scoring plan scans the corpus exactly
    twice (token explode + id spine) instead of re-deriving the count
    aggregations per consumer; the trailing spine join is corpus-keyed
    on both sides — the one legitimate sort-merge, AQE-broadcast-
    converted when the weighted side turns out small. Returns (id_col,
    logw DECIMAL(38,6)); tokenless documents weigh 0 (empty product)."""
    ratios = dsir_logratio_table(
        corpus, target, text_col, ngrams
    ).localCheckpoint(eager=True)
    tok = corpus.select(
        F.col(id_col),
        F.explode(_gram_expr(text_col, ngrams)).alias("token"),
    ).filter(F.col("token") != "")
    sums = (
        tok.join(ratios, "token")
        .groupBy(id_col)
        .agg(F.sum("logratio").alias("_lw"))
    )
    zero = F.lit("0").cast("decimal(38,6)")
    return corpus.select(id_col).join(sums, id_col, "left").select(
        id_col, F.coalesce(F.col("_lw"), zero).alias("logw")
    )


def dsir_sample(
    corpus: DataFrame,
    target: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir-v1",
    ngrams: int = 1,
) -> DataFrame:
    """E8 (DSIR step 3) — sample ``n`` documents WITHOUT replacement with
    probability proportional to exp(logw) via the Gumbel top-k trick:
    key = logw + Gumbel(0,1), take the n largest keys. The Gumbel noise
    is DERIVED, not random: u = (md5(salt|id) first 12 hex + 1) /
    (2^48 + 1), g = -ln(-ln(u)) — deterministic, re-rollable by salt,
    and computable identically in SQL (the repo's md5-projection
    discipline), with g quantized to DECIMAL(38,6) so keys add and
    compare exactly.

    The selection is one TakeOrderedAndProject (per-partition top-n,
    then a driver-side merge of n-row heaps) — no global sort, no
    single-partition window, the same shape at any corpus size. Returns
    (id_col, logw, key) of the sample, doubles for the caller."""
    if n < 0:
        raise ValueError("n must be non-negative")
    w = dsir_weights(corpus, target, text_col, id_col, ngrams)
    raw = F.conv(
        F.substring(
            F.md5(
                F.encode(
                    F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")),
                    "UTF-8",
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("double") + F.lit(1.0)
    u = raw / F.lit(float((1 << 48) + 1))
    gumbel = (-F.log(-F.log(u))).cast("decimal(38,6)")
    return (
        w.withColumn("key", (F.col("logw") + gumbel).cast("double"))
        .withColumn("logw", F.col("logw").cast("double"))
        .orderBy(F.col("key").desc(), F.col(id_col).asc())
        .limit(n)
    )


def pack_bins(
    docs: DataFrame,
    max_tokens: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 64,
    salt: str = "packbins-v1",
) -> DataFrame:
    """E8 — whole-document bin packing (first-fit-decreasing): place
    each document into a fixed-``max_tokens`` training bin WITHOUT
    splitting it — the SFT/eval packing layout, complementing
    ``pack_chunks`` (which concatenates and cuts, letting documents
    cross boundaries). Padding waste per bin is what packing quality
    buys down; FFD is the classic near-optimal heuristic (<= 11/9 OPT
    + 1 bins within a shard).

    Scale shape: a GLOBAL FFD is inherently sequential, so documents
    are sharded by md5(salt|id) (the repo's deterministic-projection
    discipline) and FFD runs INDEPENDENTLY per shard via
    ``applyInPandas`` — one shuffle on the shard key, O(shard) memory
    per task, no coordination; cross-shard waste is bounded by one
    partially-filled bin tail per shard, amortized away as shards
    grow. Deterministic: within a shard docs pack in (n_tokens desc,
    id asc) order.

    Documents LONGER than ``max_tokens`` cannot pack; each gets its
    own bin, flagged ``oversize`` (the caller decides: truncate
    upstream via ``sliding_chunks``, or drop).

    Returns (id_col, n_tokens, shard, bin, oversize) — (shard, bin)
    is the global bin key."""
    if max_tokens <= 0:
        raise ValueError("max_tokens must be positive")
    h = F.md5(
        F.encode(
            F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")),
            "UTF-8",
        )
    )
    base = docs.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
        (F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % n_shards)
        .cast("int")
        .alias("shard"),
    )

    def ffd(pdf):
        import numpy as np

        pdf = pdf.sort_values(
            ["n_tokens", id_col], ascending=[False, True]
        ).reset_index(drop=True)
        remaining: list[int] = []  # free tokens per bin, creation order
        bins = np.empty(len(pdf), dtype=np.int64)
        oversize = np.zeros(len(pdf), dtype=bool)
        for i, n in enumerate(pdf["n_tokens"]):
            if n > max_tokens:
                remaining.append(0)  # its own, already-full bin
                bins[i] = len(remaining) - 1
                oversize[i] = True
                continue
            for b, free in enumerate(remaining):
                if free >= n:
                    remaining[b] = free - n
                    bins[i] = b
                    break
            else:
                remaining.append(max_tokens - int(n))
                bins[i] = len(remaining) - 1
        out = pdf[[id_col, "n_tokens", "shard"]].copy()
        out["bin"] = bins
        out["oversize"] = oversize
        return out

    return base.groupBy("shard").applyInPandas(
        ffd,
        f"{id_col} long, n_tokens long, shard int, bin long, oversize boolean",
    )
