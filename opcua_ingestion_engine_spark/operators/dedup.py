"""[EXT] E1/E2 — deduplication operators for LLM training-data pipelines
(SURVEY.md §2.11; BASELINE.json north star).

Scale doctrine (SURVEY.md §7 risk 7, VERDICT r1): near-dup detection at
100 TB must NEVER be an all-pairs crossJoin. The shape here is the
standard three-stage LSH pipeline:

    shingle -> minhash signature -> band buckets -> JOIN ON bucket
    -> exact-Jaccard verify on candidate pairs only

Every stage is a per-row projection except the bucket self-join, which
shuffles on (band, bucket-hash) — candidate volume is controlled by the
band/row geometry, not the corpus size. The exact-Jaccard verifier is
reused standalone (blocked all-pairs) as the DuckDB-checkable oracle path
at test scale.

Hashing: xxhash64 (JVM built-in) for minhash permutations — fast but
engine-specific, hence the LSH path gets rows-only driver checks plus a
pytest recall harness against the exact path; md5 (portable) where the
oracle must reproduce hashes exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from .text import word_ngrams

# Universal-hash modulus for minhash permutations. MUST be on the order of
# the reduced hash domain (31 bits): with x < 2^31, (a*x+b) mod p only
# permutes properly when a*x wraps p many times — a larger p (e.g. 2^61-1)
# leaves the map monotonic-in-x per wrap segment and minhash agreement
# collapses (caught by the recall harness: 4/96 agreement on a 0.89-jaccard
# pair).
MERSENNE_31 = (1 << 31) - 1


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """E1 — exact duplicate removal, deterministic representative.

    Groups on sha256(text) — not the text itself — so at scale the shuffle
    key is 32 bytes instead of whole documents; keeps the lowest doc_id of
    each group (dropDuplicates picks an arbitrary row; argmin is
    replay-stable). Returns (doc_id, n_copies).
    """
    return (
        docs.groupBy(F.sha2(F.col(text_col), 256).alias("digest"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count("*").alias("n_copies"),
        )
        .select("doc_id", "n_copies")
    )


def shingle_sets(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word-n-gram shingle set per document."""
    return docs.select(
        "doc_id",
        F.array_distinct(word_ngrams(F.col(text_col), n)).alias("shingles"),
    )


def jaccard_pairs(
    docs: DataFrame,
    block_col: str | None = "lang",
    text_col: str = "text",
    threshold: float = 0.5,
    n: int = 3,
    max_doc_freq: int | None = None,
    prefix_filter: bool = False,
) -> DataFrame:
    """E2 (exact verify path) — blocked word-n-gram Jaccard via an
    inverted shingle index.

    Pairs are scored WITHIN a blocking key only (here: language;
    ``block_col=None`` degrades to un-blocked ground truth). NOTE blocking
    trades recall for cost: cross-block near-dups are invisible to it,
    which is exactly why the LSH path doesn't block.

    Shape (default): explode each doc's distinct shingles into postings,
    self-join the posting lists on (block, shingle), and COUNT shared
    shingles per pair — |A∩B| emerges from a groupBy, no shingle array
    ever rides through a pair row. jaccard = c / (|A|+|B|-c) with the
    division in double over exact ints (engine-identical). Requires
    threshold > 0: pairs sharing no shingle never surface (jaccard 0).

    Scale: the shuffle key is the SHINGLE; candidate volume is
    Theta(sum df^2) — quadratic in corpus size once the shingle space
    saturates. Three levers, all output-documented:
    - ``prefix_filter=True``: LOSSLESS AllPairs/PPJoin prefix pruning +
      exact array verify (identical output, pinned by pytest). Wins on
      power-law vocabularies (real text: vast df=1 tails); measured a
      ~2x PESSIMIZATION on this repo's saturated 31-word-vocab fixtures
      — see the inline comment for the numbers. Off by default.
    - ``max_doc_freq=N``: cap posting lists by document frequency.
      UNDERCOUNTS intersections (documented approximation — scores only
      drop, never rise, so >= threshold precision is preserved; recall
      on planted near-dups is pinned in pytest). Default None = exact.
    - Neither lever helps a saturated shingle space with many mid-df
      shingles; there the scale path is MinHash banding
      (``minhash_neardup_pairs``) whose candidates scale with true
      similarity, not shingle co-occurrence.
    An array-carrying join over ALL pairs was measured 65-100s at sf0.1
    vs 4.6s for the posting-count form (14-22x) — arrays only ever ride
    on PRUNED candidate sets.
    """
    assert threshold > 0, "inverted-index jaccard requires threshold > 0"
    if prefix_filter and max_doc_freq is not None:
        # the prefix branch verifies on FULL arrays, so the cap's
        # documented undercount semantics cannot apply there — refuse
        # loudly rather than silently ignore one of the two requests
        raise ValueError(
            "prefix_filter and max_doc_freq are mutually exclusive: "
            "prefix filtering is lossless (full-array verify), the df "
            "cap is a deliberate undercount — pick one"
        )
    block = F.col(block_col) if block_col is not None else F.lit(1)
    # Materialize the shingled input once — consumed by both join sides
    # and the size dimension; left lazy the shingle projection is
    # re-derived per consumer.
    s = docs.select(
        F.col("doc_id"),
        block.alias("_block"),
        F.array_distinct(word_ngrams(F.col(text_col), n)).alias("shingles"),
    ).localCheckpoint(eager=True)
    post = s.select(
        "_block", "doc_id",
        F.explode("shingles").alias("sh"),
        F.size("shingles").alias("_n"),
    )
    if prefix_filter:
        # PREFIX FILTERING (AllPairs/PPJoin family — Bayardo et al.
        # WWW'07, Xiao et al. WWW'08) — LOSSLESS candidate pruning for
        # power-law-vocabulary corpora. Order each doc's shingles by
        # GLOBAL rarity (document frequency asc, shingle asc) and index
        # only its first p = n - ceil(threshold*n) + 1. Completeness:
        # J(A,B) >= t implies c >= ceil(t * max(|A|,|B|)), and a pair
        # whose rarity-ordered prefixes of these lengths are disjoint
        # cannot reach that overlap — so every qualifying pair collides
        # on some prefix shingle; candidates are then verified EXACTLY
        # on their full shingle arrays. Output is identical to the
        # default join (a pytest pins it); only the candidate set
        # changes size. On real text (vast df=1 tails) prefixes collapse
        # the Theta(sum df^2) candidate blowup; on THIS repo's synthetic
        # fixtures it is a measured pessimization — the 31-word vocab
        # saturates the trigram space (min df ~9 at sf0.1), so prefixes
        # only halved the 28.9M sf1 candidates while adding a window +
        # array-carrying verify (sf0.1 q_e7: 1.7s -> 3.3s). Hence
        # opt-in, default False; the scale path for saturated spaces is
        # MinHash banding (minhash_neardup_pairs).
        dfreq = post.groupBy("_block", "sh").agg(F.count("*").alias("_df"))
        w = W.partitionBy("doc_id").orderBy("_df", "sh")
        prefix = (
            post.join(dfreq, ["_block", "sh"])
            .withColumn("_rn", F.row_number().over(w))
            .filter(
                F.col("_rn")
                <= F.col("_n") - F.ceil(F.col("_n") * F.lit(float(threshold))) + 1
            )
        )
        ca = prefix.select(F.col("doc_id").alias("doc_a"), "_block", "sh")
        cb = prefix.select(F.col("doc_id").alias("doc_b"), "_block", "sh")
        cand = (
            ca.join(cb, ["_block", "sh"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        va = s.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("_sha"))
        vb = s.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("_shb"))
        c = F.size(F.array_intersect("_sha", "_shb"))
        return (
            cand.join(va, "doc_a")
            .join(vb, "doc_b")
            .withColumn(
                "jaccard",
                c.cast("double")
                / (F.size("_sha") + F.size("_shb") - c).cast("double"),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard")
        )

    if max_doc_freq is not None:
        # Capped path: excluding high-df shingles UNDERCOUNTS
        # intersections (documented approximation; scores only drop).
        df_counts = (
            post.groupBy("_block", "sh")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_doc_freq)
            .select("_block", "sh")
        )
        post = post.join(df_counts, ["_block", "sh"], "left_semi")
    pa = post.select(F.col("doc_id").alias("doc_a"), "_block", "sh")
    pb = post.select(F.col("doc_id").alias("doc_b"), "_block", "sh")
    inter = (
        pa.join(pb, ["_block", "sh"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("c"))
    )
    # Per-doc size dimension: O(corpus) rows, so no forced broadcast —
    # AQE broadcasts it at test scale and shuffle-joins at 100 TB.
    sizes = s.select("doc_id", F.size("shingles").alias("n"))
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.col("c").cast("double")
            / (F.col("na") + F.col("nb") - F.col("c")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _jaccard(sh_a, sh_b):
    """|A∩B| / |A∪B| over distinct shingle arrays. array_intersect is the
    hash-based O(|A|+|B|) built-in — NOT a nested contains-filter, which is
    O(|A|x|B|) per pair and measured 10x+ slower at sf0.01."""
    inter = F.size(F.array_intersect(sh_a, sh_b))
    union = F.size(sh_a) + F.size(sh_b) - inter
    return inter.cast("double") / union.cast("double")


def _hash_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    """(a, b) pairs for the universal-hash permutations h_i(x) = (a*x+b) mod
    2^31-1. 31-bit a/b against a 31-bit reduced hash keeps a*x+b under 2^63
    (ANSI overflow-safe) while the 31-bit modulus wraps ~2^31 times (true
    permutation)."""
    rnd = _lcg(seed)
    mask31 = (1 << 31) - 1
    return [(((next(rnd) & mask31) | 1), next(rnd) & mask31) for _ in range(num_hashes)]


def minhash_signatures(
    shingled: DataFrame, num_hashes: int = 96, seed: int = 42
) -> DataFrame:
    """MinHash signature per document: for permutation i,
    sig[i] = min over shingles of h_i(shingle), with
    h_i(x) = (a_i * (xxhash64(x) >>> 33) + b_i) mod 2^31-1.

    Shape: shingles are hashed JVM-side (codegen'd ``transform`` +
    ``xxhash64`` — each shingle hashed exactly once, strings never leave
    the JVM), then the per-doc hash array rides one Arrow batch into a
    pandas UDF that evaluates all num_hashes permutations as a single
    numpy (shingles x lanes) broadcast-min — exact int64 arithmetic
    (a,x < 2^31 so a*x+b < 2^63), bit-identical to the SQL form. No
    explode, no exchange: the signature is computed where the doc row
    sits.

    Measured at sf0.1 (warm, min-of-2): numpy form 1.36 s vs 2.29 s for
    the previous explode + 96-min-lane codegen aggregate (which itself
    beat the interpreted higher-order ``aggregate`` fold, 4.2 s). The
    advantage grows with corpus size: the aggregate form shuffles one
    96-lane row per doc per map partition; this form shuffles nothing.

    Docs whose shingle array is empty are dropped (the previous explode
    form lost them implicitly; word_ngrams guarantees >= 1 shingle per
    non-null text, so nothing is lost upstream of a null-text filter).
    """
    from pyspark.sql.types import ArrayType, LongType

    params = _hash_params(num_hashes, seed)
    a_vec = np.array([a for a, _ in params], dtype=np.int64)
    b_vec = np.array([b for _, b in params], dtype=np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(hashes: pd.Series) -> pd.Series:
        out = []
        for h in hashes:
            x = np.asarray(h, dtype=np.int64)[:, None]
            out.append((x * a_vec + b_vec) % MERSENNE_31)
        return pd.Series([m.min(axis=0) for m in out])

    hashed = shingled.select(
        "doc_id",
        F.transform(
            "shingles", lambda s: F.shiftrightunsigned(F.xxhash64(s), 33)
        ).alias("_h"),
    ).filter(F.size("_h") > 0)
    return hashed.select("doc_id", _sig("_h").alias("signature"))


def _lcg(seed: int):
    """Deterministic 63-bit LCG for permutation parameters (no RNG import —
    replay-stable)."""
    state = seed & ((1 << 63) - 1)
    while True:
        state = (6364136223846793005 * state + 1442695040888963407) & ((1 << 63) - 1)
        yield state >> 2


def banded_buckets(
    signatures: DataFrame, bands: int, rows_per_band: int
) -> DataFrame:
    """(doc_id, band, bucket) rows of the banded signature — THE shared
    bucketing expression: the batch candidate generator and the
    streaming-incremental index both call this, so their bucket rows are
    byte-identical by construction, never by parallel editing.

    Geometry guard: a band reading past the signature end would getItem
    NULLs, and ``F.hash`` of all-NULLs is the CONSTANT seed (42) — every
    document would silently share one bucket per overflowing band,
    collapsing the corpus into the all-pairs blowup this module exists
    to avoid. Signature length is checked per row; the mismatch fails
    the job loudly instead.
    """
    # Guard as a short-circuiting FILTER, not a CASE WHEN wrapping the
    # array: the projection-collapse rule substitutes a wrapped `_sig`
    # into every one of the bands*rows getItem references, duplicating
    # the whole when/raise_error tree ~100x in the optimized plan —
    # measured as multi-second driver planning time per run (guide
    # §7.3). As a filter the guard is ONE expression and the band
    # projection reads the raw array column.
    checked = signatures.filter(
        (F.size("signature") >= bands * rows_per_band)
        | F.raise_error(F.concat(
            F.lit(f"signature too short for {bands}x{rows_per_band} banding: "),
            F.size("signature").cast("string"),
            F.lit(" hashes"),
        )).cast("boolean")
    )
    # Band via explode(sequence) + ONE dynamic-index hash, instead of an
    # array of `bands` structs each hashing literal-index getItems. The
    # values are bit-identical (`hash` is the same Murmur3(seed 42) as
    # F.hash, `signature[band*rows+r]` the same elements) but the
    # generated code carries a single hash call instead of ~bands
    # copies — the old form's Janino compile was a measured multi-second
    # driver cost PER RUN at 32x3 (guide §7.3: planning time is part of
    # the job), and the py4j Column construction another ~1.4 s.
    idx = ", ".join(
        f"signature[band * {rows_per_band} + {r}]"
        for r in range(rows_per_band)
    )
    return checked.select(
        "doc_id",
        "signature",
        F.expr(f"explode(sequence(0, {bands - 1}))").alias("band"),
    ).select("doc_id", "band", F.expr(f"hash({idx})").alias("bucket"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 32,
    rows_per_band: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Band the signatures and bucket on (band, band-hash): documents
    agreeing on ALL rows of any band become a candidate pair.

    This is THE scale operator: explode to `bands` rows per doc (bounded
    fan-out), ONE shuffle on the band bucket, then expand each bucket's
    doc list into its unordered pairs in place. The groupBy form consumes
    the signature frame exactly once — the equivalent bucket SELF-join
    reads it through two lineages, forcing an upstream materialization
    (measured: dropping the signature localCheckpoint this enables cuts
    ~1.7s of the sf0.1 wall time; the join itself was no faster).

    Bucket sizes are data-dependent, but a collision requires exact
    agreement of rows_per_band 31-bit minhashes — giant buckets only
    arise from clusters of (near-)identical documents, which belong to
    the E1 exact-dedup stage upstream. ``max_bucket`` (default None =
    unbounded) skips pathological buckets outright for adversarial
    corpora where the O(k^2) in-task expansion would blow up; skipped
    buckets lose their candidates, so cap only above the exact-dup scale.
    """
    banded = banded_buckets(signatures, bands, rows_per_band)
    buckets = (
        banded.groupBy("band", "bucket")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ids") <= max_bucket)
    # one SQL expression, not nested Python-lambda HOF construction —
    # same operator tree, a fraction of the py4j round-trips (§7.3)
    pairs = F.expr(
        "flatten(transform(ids, x -> transform("
        "filter(ids, y -> y > x), "
        "y -> named_struct('doc_a', x, 'doc_b', y))))"
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def minhash_neardup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = 96,
    bands: int = 32,
    rows_per_band: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """E2 — full MinHash-LSH near-dup pipeline: shingle -> signature ->
    banded candidates -> exact-Jaccard verification >= threshold.

    Output is verified pairs only (no false positives; recall governed by
    the band geometry: P[detect | s] = 1-(1-s^rows)^bands — ~0.99 at
    s=0.5 and ~1-1e-10 at s=0.8 with the 32x3 default). See
    tests/test_llm_ops.py for the recall harness.

    ``max_bucket`` passes through to :func:`lsh_candidate_pairs`. Default
    None (exact search) is a DELIBERATE choice: an LSH bucket only grows
    giant when many documents agree on rows_per_band exact minhashes —
    i.e. a cluster of (near-)identical texts that the E1 exact-dedup
    stage upstream should already have collapsed. On an adversarial or
    un-pre-deduped corpus set it (e.g. 1000) to bound the in-bucket
    O(k^2) pair expansion; skipped buckets drop ONLY pairs inside
    mega-clusters (tests/test_skew_stress.py pins both the volume bound
    and the planted-pair recall).

    Materialization strategy (measured 12.0s -> 8.5s -> ~2.8s warm at
    sf0.1 across the tuning passes):

    - The signature frame needs NO materialization: the groupBy form of
      lsh_candidate_pairs consumes it exactly once, so the whole
      shingle -> signature -> bucket path is one linear lineage (the
      earlier self-join form read it twice and needed a localCheckpoint,
      whose block-manager round-trip alone cost ~1.7s warm at sf0.1).
    - Candidate pairs (tiny) are LAZILY checkpointed before the verify
      stage so the `needed`-docs prune and the pair join don't re-run the
      LSH pipeline. Lazy, not eager: the first consumer is the `needed`
      broadcast build, which runs strictly before the probe side needs
      cand again, so materialization fuses into a job that exists anyway
      (a separate eager job measured ~0.4s slower at sf0.1).
    - The verify stage re-tokenizes ONLY candidate docs: a broadcast
      semi-join prunes the corpus scan to docs that appear in some pair,
      then exact Jaccard runs on those shingle sets. Corpus passes total:
      signature build + pruned verify = 2, with nothing wide ever
      checkpointed. (localCheckpoint, not persist: no CacheManager entry,
      no O(cached-plans) sameResult scans on later queries — same
      rationale as ingest.prepare_stream.)
    """
    if bands * rows_per_band > num_hashes:
        raise ValueError(
            f"band geometry {bands}x{rows_per_band} needs "
            f"{bands * rows_per_band} hashes, got num_hashes={num_hashes}"
        )
    shingle_expr = F.array_distinct(word_ngrams(F.col(text_col), n))
    sh = docs.select("doc_id", shingle_expr.alias("shingles"))
    sig = minhash_signatures(sh, num_hashes)
    cand = lsh_candidate_pairs(sig, bands, rows_per_band, max_bucket).localCheckpoint(
        eager=False
    )
    needed = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_needed = docs.join(F.broadcast(needed), "doc_id", "left_semi").select(
        "doc_id", shingle_expr.alias("shingles")
    )
    a = sh_needed.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh_needed.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    verified = cand.join(a, "doc_a").join(b, "doc_b")
    return (
        verified.withColumn("jaccard", _jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """E2 variant — 64-bit SimHash over word tokens: per bit, sum +1/-1
    weighted by token-hash bit, sign of the sum becomes the bit.

    Near-dups reduce to hamming-distance joins on bit-band buckets — see
    ``simhash_neardup_pairs`` for the banded search (engine-specific
    hash, so both get rows-only driver checks plus pytest invariance /
    exactness pins).

    Shape mirrors ``minhash_signatures``: tokens are hashed ONCE JVM-side
    (codegen'd ``transform`` + ``xxhash64`` — strings never leave the
    JVM), then the per-doc hash array rides one Arrow batch into a pandas
    UDF that computes all 64 bit-votes in a single numpy pass (bit-matrix
    popcount per column; numpy ``>>`` on int64 is an arithmetic shift,
    matching JVM ``shiftright``, so the result is bit-identical to the
    previous SQL form). The previous form — 64 interpreted
    ``F.aggregate`` folds per document — re-walked the token array once
    per bit through the higher-order-function evaluator: O(64 x tokens)
    interpreted steps per row (measured 1.5 s warm at sf0.1 vs ~0.25 s
    for this kernel). A row with NULL/empty text keeps the previous
    fixed-point: simhash = 0.
    """
    from pyspark.sql.types import LongType

    bitpos = np.arange(64, dtype=np.int64)
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)

    @F.pandas_udf(LongType())
    def _sim(hashes: pd.Series) -> pd.Series:
        out = np.zeros(len(hashes), dtype=np.uint64)
        for i, h in enumerate(hashes):
            if h is None or len(h) == 0:
                continue
            x = np.asarray(h, dtype=np.int64)[:, None]
            ones = ((x >> bitpos) & 1).sum(axis=0)
            # vote = ones - zeros > 0  <=>  2*ones > n_tokens
            bits = (2 * ones) > len(h)
            out[i] = (bits.astype(np.uint64) * weights).sum(dtype=np.uint64)
        # reinterpret so bit 63 lands in the long's sign bit (as the JVM
        # shiftleft/bitwiseOR form did)
        return pd.Series(out.view(np.int64))

    hashed = docs.select(
        "doc_id",
        F.transform(
            F.split(F.col(text_col), " "), lambda w: F.xxhash64(w)
        ).alias("_h"),
    )
    return hashed.select("doc_id", _sim("_h").alias("simhash"))


def simhash_neardup_pairs(
    docs: DataFrame,
    text_col: str = "text",
    max_hamming: int = 3,
    n_bands: int = 4,
    max_bucket: int | None = None,
) -> DataFrame:
    """E2 (SimHash path) — near-dup pairs with hamming(simhash64) <=
    ``max_hamming``, found by the classic banded search (Manku et al.,
    WWW'07): split the 64-bit fingerprint into ``n_bands`` equal bands;
    by pigeonhole, any pair within ``max_hamming < n_bands`` bit flips
    agrees EXACTLY on at least one band, so candidates = pairs sharing
    (band_idx, band_bits), verified by bit_count(xor) — this search is
    exact, not probabilistic, unlike MinHash banding.

    Same scale shape as the MinHash path: bounded explode (n_bands rows
    per doc), ONE shuffle on the band value, in-bucket pair expansion
    consuming the fingerprint frame through a single lineage, cheap
    verify on candidates only. ``max_bucket`` as in lsh_candidate_pairs.
    """
    return hamming_neardup_pairs(
        simhash64(docs, text_col), "simhash", max_hamming, n_bands, max_bucket
    )


def hamming_neardup_pairs(
    hashes: DataFrame,
    hash_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
    max_bucket: int | None = None,
    same_key: str | None = None,
) -> DataFrame:
    """Generic banded hamming search over any 64-bit fingerprint column
    (``doc_id``, ``hash_col``) — the shared engine behind the SimHash
    text path and the perceptual-hash image path: band the fingerprint,
    bucket-join on exact band agreement (pigeonhole-exact for
    max_hamming < n_bands), verify by bit_count(xor). One bounded
    explode, ONE shuffle on the band value, in-bucket pair expansion
    through a single lineage.

    ``same_key`` names a column that must match for two rows to pair
    (joined into the bucket key, so cross-group candidates never even
    shuffle together) — e.g. the payload format in the image path, where
    hashes of different formats share the 64-bit space but are not
    comparable."""
    assert max_hamming < n_bands, "pigeonhole exactness needs max_hamming < n_bands"
    assert 64 % n_bands == 0
    width = 64 // n_bands
    key_cols = [same_key] if same_key else []
    banded = hashes.select(
        "doc_id",
        *key_cols,
        F.col(hash_col).alias("_fp"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned(F.col(hash_col), b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("bits"),
                )
                for b in range(n_bands)
            ])
        ).alias("bb"),
    ).select("doc_id", *key_cols, "_fp", "bb.band", "bb.bits")
    buckets = (
        banded.groupBy(*key_cols, "band", "bits")
        .agg(F.collect_list(F.struct("doc_id", "_fp")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("ds") <= max_bucket)
    pairs = F.flatten(
        F.transform(
            F.col("ds"),
            lambda x: F.transform(
                F.filter(F.col("ds"), lambda y: y["doc_id"] > x["doc_id"]),
                lambda y: F.struct(
                    x["doc_id"].alias("doc_a"),
                    y["doc_id"].alias("doc_b"),
                    x["_fp"].alias("fp_a"),
                    y["_fp"].alias("fp_b"),
                ),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .select("p.doc_a", "p.doc_b", "p.fp_a", "p.fp_b")
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def repeated_spans(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 15,
    min_repeats: int = 2,
) -> DataFrame:
    """E2 (substring level) — find every maximal token span of a document
    that is part of some ``k``-token window occurring ``min_repeats``+
    times across the WHOLE corpus (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better": document-level dedup
    misses boilerplate/license/template spans repeated across otherwise
    distinct documents; span-level dedup removes them).

    Returns (doc_id, span_start, span_end) in token positions
    [start, end), overlapping/adjacent windows merged into maximal
    spans (gaps-and-islands over a per-doc window). A trim step is then
    a slice of the token array per span — deliberately left to the
    caller, which may prefer to drop, mask, or count instead.

    Scale shape: one explode to positional k-gram windows (n_tokens
    rows per doc), one map-side-combined groupBy on the window DIGEST
    (md5 — 16 bytes rides the shuffle, never the k-token string; md5 is
    engine-portable so the DuckDB oracle reproduces it exactly), one
    semi join back to postings on the digest, and one per-doc window
    for the interval merge. No pairwise work at any stage — cost is
    linear in corpus tokens + Theta(sum over repeated windows), the
    same profile as the contamination n-gram index.
    """
    wins = positional_windows(docs, text_col, k)
    hot = (
        wins.groupBy("g")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_repeats)
        .select("g")
    )
    return merge_window_spans(wins.join(hot, "g", "left_semi"), k)


def positional_windows(
    docs: DataFrame, text_col: str = "text", k: int = 15
) -> DataFrame:
    """(doc_id, start, g): md5 digest of every positional k-token window.
    Shared by the batch span report and its streaming-incremental twin."""
    # Project the token array ONCE per row before the window transform —
    # referencing split(text) inside the lambda re-evaluates the split
    # per generated window (measured 2x at sf1). Docs shorter than k
    # have no window and are filtered BEFORE the sequence: with n < k,
    # sequence(0, n-k) generates a DESCENDING [0, -1] (Spark picks step
    # -1 when stop < start) — bogus windows.
    toks = docs.select(
        "doc_id", F.split(F.col(text_col), " ").alias("_w")
    ).filter(F.size("_w") >= k)
    return toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("_w") - k),
                lambda i: F.struct(
                    i.alias("start"),
                    F.md5(F.concat_ws(" ", F.slice("_w", i + 1, k))).alias("g"),
                ),
            )
        ).alias("win"),
    ).select("doc_id", "win.start", "win.g")


def merge_window_spans(hot_wins: DataFrame, k: int) -> DataFrame:
    """Gaps-and-islands merge of (doc_id, start) hot windows into maximal
    [span_start, span_end) token spans."""
    spans = hot_wins.select(
        "doc_id", "start", (F.col("start") + k).alias("end")
    )
    byd = W.partitionBy("doc_id").orderBy("start")
    prev_max = F.max("end").over(byd.rowsBetween(W.unboundedPreceding, -1))
    islands = (
        spans.withColumn(
            "new_island",
            F.when(
                prev_max.isNull() | (F.col("start") > prev_max), F.lit(1)
            ).otherwise(F.lit(0)),
        )
        .withColumn("island", F.sum("new_island").over(byd))
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("start").alias("span_start"),
            F.max("end").alias("span_end"),
        )
        .select("doc_id", "span_start", "span_end")
    )


def trim_repeated_spans(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 15,
    min_repeats: int = 2,
) -> DataFrame:
    """E2 (substring level, apply step) — remove every corpus-repeated
    span found by :func:`repeated_spans` from each document. Returns
    (doc_id, text, n_tokens_removed): the trimmed text (whitespace
    re-joined surviving tokens, original order) and how many tokens the
    trim dropped — the deployable form of Lee-et-al span dedup.

    Scale shape: the span report is output-sized (repeated regions
    only), grouped per doc into a spans array that rides a hash join
    back to the corpus; the trim itself is a per-row higher-order
    filter over token positions (codegen, no Python). Docs without
    repeated spans pass through untouched via the left join's NULL arm.
    """
    spans = repeated_spans(docs, text_col, k, min_repeats)
    return apply_spans(docs, spans, text_col)


def apply_spans(
    docs: DataFrame, spans: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Excise the given (doc_id, span_start, span_end) token spans from
    each document. Shared by the batch trim and the incremental sink's
    trim-on-read — both produce (doc_id, text, n_tokens_removed)."""
    sp = spans.groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toks = (
        docs.select("doc_id", F.split(F.col(text_col), " ").alias("_w"))
        .join(sp, "doc_id", "left")
    )
    indexed = F.transform(
        "_w", lambda t, i: F.struct(t.alias("t"), i.alias("i"))
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            "_spans",
            lambda b: (s["i"] >= b["span_start"]) & (s["i"] < b["span_end"]),
        ),
    )
    surviving = F.when(F.col("_spans").isNull(), F.col("_w")).otherwise(
        F.transform(kept, lambda s: s["t"])
    )
    return toks.select(
        "doc_id",
        F.concat_ws(" ", surviving).alias(text_col),
        (F.size("_w") - F.size(surviving)).cast("long").alias("n_tokens_removed"),
    )


def cross_corpus_neardup_pairs(
    docs_a: DataFrame,
    docs_b: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    n: int = 3,
    num_hashes: int = 96,
    bands: int = 32,
    rows_per_band: int = 3,
    max_bucket: int | None = None,
    candidates: str = "minhash",
) -> DataFrame:
    """E2 (cross-corpus form) — (doc_a in A, doc_b in B) pairs with
    word-n-gram Jaccard >= threshold. The DECONTAMINATION join: A is a
    candidate training corpus, B a held-out benchmark / previous-run
    reference; fuzzy overlap between them is exactly what train-on-test
    leakage looks like after light paraphrase. Never a pair WITHIN
    either corpus — only across. The two id namespaces are independent
    (doc_a and doc_b may collide numerically).

    ``candidates="exact"`` — two-sided inverted shingle index: each
    side explodes to (doc, shingle) postings, the sides meet on the
    SHINGLE key, |A∩B| per pair emerges from a groupBy (arrays never
    ride through pair rows), jaccard = inter/(na+nb-inter) in double
    over exact ints. The oracle/test-scale path — Theta(sum df_A*df_B)
    once the shingle space saturates, same cliff as ``jaccard_pairs``.

    ``candidates="minhash"`` (default) — the 100 TB path: per-side
    MinHash signatures (identical permutations, so equal texts get
    equal signatures across sides), banded buckets joined ACROSS sides
    only (an A-bucket meets a B-bucket on (band, bucket); in-corpus
    pairs are structurally impossible), then exact-Jaccard verify on
    the candidate set — no false positives, recall follows the band
    S-curve. ``max_bucket`` skips (band,bucket) groups larger than the
    cap on EITHER side before the cross join (the A x B in-bucket
    product is the blowup to bound); planted-pair recall under the cap
    is pinned in tests.
    """
    shingle_expr = F.array_distinct(word_ngrams(F.col(text_col), n))

    def _sh(df: DataFrame) -> DataFrame:
        return df.select("doc_id", shingle_expr.alias("shingles"))

    if candidates == "exact":
        def _post(df: DataFrame, tag: str) -> DataFrame:
            return _sh(df).select(
                F.col("doc_id").alias(f"doc_{tag}"),
                F.explode("shingles").alias("sh"),
                F.size("shingles").alias(f"n_{tag}"),
            )

        joined = _post(docs_a, "a").join(_post(docs_b, "b"), "sh")
        agg = joined.groupBy("doc_a", "doc_b").agg(
            F.count("*").alias("inter"),
            F.max("n_a").alias("na"),
            F.max("n_b").alias("nb"),
        )
        jac = F.col("inter").cast("double") / (
            F.col("na") + F.col("nb") - F.col("inter")
        )
        return (
            agg.withColumn("jaccard", jac)
            .filter(F.col("jaccard") >= threshold)
            .select("doc_a", "doc_b", "jaccard")
        )
    if candidates != "minhash":
        raise ValueError(
            f"candidates must be 'exact' or 'minhash', got {candidates!r}"
        )
    if bands * rows_per_band > num_hashes:
        raise ValueError(
            f"band geometry {bands}x{rows_per_band} needs "
            f"{bands * rows_per_band} hashes, got num_hashes={num_hashes}"
        )

    def _buckets(df: DataFrame, tag: str) -> DataFrame:
        bb = banded_buckets(
            minhash_signatures(_sh(df), num_hashes), bands, rows_per_band
        )
        if max_bucket is not None:
            sizes = bb.groupBy("band", "bucket").agg(
                F.count("*").alias("_sz")
            ).filter(F.col("_sz") <= max_bucket).drop("_sz")
            bb = bb.join(sizes, ["band", "bucket"], "left_semi")
        return bb.select(
            F.col("doc_id").alias(f"doc_{tag}"), "band", "bucket"
        )

    cand = (
        _buckets(docs_a, "a")
        .join(_buckets(docs_b, "b"), ["band", "bucket"])
        .select("doc_a", "doc_b")
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _needed_sh(df: DataFrame, tag: str) -> DataFrame:
        ids = cand.select(F.col(f"doc_{tag}").alias("doc_id")).distinct()
        return df.join(F.broadcast(ids), "doc_id", "left_semi").select(
            F.col("doc_id").alias(f"doc_{tag}"),
            shingle_expr.alias(f"sh_{tag}"),
        )

    verified = (
        cand.join(_needed_sh(docs_a, "a"), "doc_a")
        .join(_needed_sh(docs_b, "b"), "doc_b")
    )
    return (
        verified.withColumn("jaccard", _jaccard(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def decontaminate(
    docs: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    n: int = 3,
    max_bucket: int | None = None,
    candidates: str = "minhash",
) -> DataFrame:
    """E8-grade decontamination against a REFERENCE corpus: drop every
    doc whose text near-duplicates (word-n-gram Jaccard >= threshold)
    any reference doc — the fuzzy complement of the exact-n-gram
    ``contamination_flags``, catching paraphrased/lightly-edited
    benchmark leakage that exact gram matching misses. Returns the
    surviving ``docs`` rows unchanged."""
    pairs = cross_corpus_neardup_pairs(
        docs, reference, text_col=text_col, threshold=threshold, n=n,
        max_bucket=max_bucket, candidates=candidates,
    )
    hit = pairs.select(F.col("doc_a").alias("doc_id")).distinct()
    return docs.join(F.broadcast(hit), "doc_id", "left_anti")
