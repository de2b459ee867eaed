"""[EXT] Composed corpus-curation pipeline — the end-to-end shape an LLM
training-data run actually executes, built from the E-operators:

    E4 quality gate  ->  E1 exact dedup  ->  E2 near-dup removal

Each stage is one of this package's standalone operators; this module
only composes them, proving the operators chain the way a production
pipeline needs (SURVEY.md §2.11; BASELINE.json north star).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark.sql.window import Window as W

from .dedup import jaccard_pairs, minhash_neardup_pairs
from .graph import connected_components
from .quality import QualityModel, score_quality, score_quality_vocab
from .text import quality_filter, token_count


def _neardup_pairs(survivors, text_col, near_threshold, max_doc_freq, candidates):
    """Near-dup pair stage shared by both curation modes.

    ``candidates="exact"`` is the ground-truth inverted-index join —
    right at oracle/test scale, Theta(sum df^2) once the shingle space
    saturates (the sf1 sweep measured 28.9M candidate pairs / 53 s from
    50k docs of the 31-word-vocab fixtures, and prefix filtering cannot
    help there — no rare shingles exist). ``candidates="minhash"`` is
    the 100 TB path: banded-LSH candidates + exact-Jaccard verify, so
    every emitted pair is true (no false positives) and recall follows
    the band S-curve (~0.99 at jaccard 0.5 with the 32x3 default);
    candidates scale with true similarity, not shingle co-occurrence.
    The minhash path is unblocked (no language blocking) — it can also
    surface cross-language near-dups the blocked exact path skips.
    """
    if candidates == "minhash":
        return minhash_neardup_pairs(
            survivors, text_col=text_col, threshold=near_threshold
        )
    if candidates != "exact":
        raise ValueError(f"candidates must be 'exact' or 'minhash', got {candidates!r}")
    return jaccard_pairs(
        survivors, block_col="lang", text_col=text_col,
        threshold=near_threshold, max_doc_freq=max_doc_freq,
    )


def _quality_stage(
    docs: DataFrame, text_col: str, quality: str, model
) -> DataFrame:
    """Stage-1 quality gate, selectable: ``quality="rules"`` is the
    C4/Gopher threshold filter (``text.quality_filter``);
    ``quality="model"`` scores with a TRAINED classifier — either a
    hashed ``QualityModel`` (Arrow kernel, score > 0.5 keeps) or a
    frozen ``(vocab_dict, bias)`` export (pure JVM Column expression,
    logit > 0 keeps). Both return the same (doc_id, lang, text,
    n_tokens) shape downstream stages consume, so the dedup pipeline is
    agnostic to which gate ran."""
    if quality == "rules":
        return quality_filter(docs, text_col=text_col, extra=("lang", text_col))
    if quality != "model":
        raise ValueError(f"quality must be 'rules' or 'model', got {quality!r}")
    if isinstance(model, QualityModel):
        scored = score_quality(docs, model, text_col=text_col)
        kept = scored.filter(F.col("quality_score") > 0.5)
    elif isinstance(model, tuple) and len(model) == 2:
        vocab, bias = model
        scored = score_quality_vocab(docs, vocab, bias, text_col=text_col)
        kept = scored.filter(F.col("keep"))
    else:
        raise ValueError(
            "quality='model' needs model=QualityModel or (vocab_dict, bias)"
        )
    return kept.select(
        "doc_id",
        "lang",
        text_col,
        token_count(F.col(text_col)).alias("n_tokens"),
    )


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    near_threshold: float = 0.5,
    max_doc_freq: int | None = None,
    candidates: str = "exact",
    quality: str = "rules",
    model=None,
) -> DataFrame:
    """Curate a document corpus: drop low-quality docs (E4 gates), collapse
    exact duplicates to their lowest-doc_id representative (E1), then drop
    every doc that near-duplicates a lower-id survivor (E2 exact-Jaccard,
    language-blocked). Returns (doc_id, lang, n_tokens) of kept docs.

    The near-dup rule is the standard greedy-by-id one: a doc is dropped
    when ANY >= threshold pair links it to a smaller doc_id, whether or
    not that smaller doc itself survived — deterministic and local to a
    pair list (no transitive-closure pass, which at 100 TB would be an
    iterative connected-components job for marginal extra removal).

    Scale shape: stage 1+2 are one scan + one hash aggregation on the
    32-byte sha256 digest; the min(struct) picks the representative and
    carries (lang, n_tokens) so nothing re-joins the corpus afterwards.
    Stage 3 re-reads only text of stage-2 survivors (left_semi prune
    before tokenization) and reuses jaccard_pairs' inverted-index
    candidate generation. In a materialized deployment each stage writes
    a table and the next reads it; composed as one plan (test scale),
    ``reps`` is lazily checkpointed — its first consumer is
    jaccard_pairs' internal shingle materialization, which runs before
    the final anti join needs it again, so the quality scan + digest
    aggregation execute exactly once.

    ``quality="model"`` swaps the rule gate for a trained classifier
    (see ``_quality_stage``) — the CCNet-style model-based corpus cut —
    leaving every downstream stage untouched.
    """
    s1 = _quality_stage(docs, text_col, quality, model)
    reps = (
        s1.groupBy(F.sha2(F.col(text_col), 256).alias("digest"))
        .agg(F.min(F.struct("doc_id", "lang", "n_tokens")).alias("r"))
        .select("r.doc_id", "r.lang", "r.n_tokens")
        .localCheckpoint(eager=False)
    )
    survivors = docs.join(reps.select("doc_id"), "doc_id", "left_semi")
    pairs = _neardup_pairs(
        survivors, text_col, near_threshold, max_doc_freq, candidates
    )
    drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return reps.join(drop, "doc_id", "left_anti").select(
        "doc_id", "lang", "n_tokens"
    )


def curate_corpus_clustered(
    docs: DataFrame,
    text_col: str = "text",
    near_threshold: float = 0.5,
    max_doc_freq: int | None = None,
    candidates: str = "exact",
) -> DataFrame:
    """Cluster-mode curation: same quality gate (E4) and exact-dedup (E1)
    stages as ``curate_corpus``, but near-duplicates are resolved by
    CONNECTED COMPONENTS over the pair graph (``graph.connected_components``)
    keeping the minimum-doc_id representative per component — the rule
    production LLM dedup uses, preserving exactly one doc per transitive
    near-dup cluster where the greedy pair rule can over- or under-drop
    along chains.

    Scale shape: identical to curate_corpus through the pair list, then
    O(diameter) label-propagation rounds on the (small) pair graph;
    unpaired survivors bypass the clustering entirely (left_anti on the
    clustered node set).
    """
    s1 = quality_filter(docs, text_col=text_col, extra=("lang", text_col))
    reps = (
        s1.groupBy(F.sha2(F.col(text_col), 256).alias("digest"))
        .agg(F.min(F.struct("doc_id", "lang", "n_tokens")).alias("r"))
        .select("r.doc_id", "r.lang", "r.n_tokens")
        .localCheckpoint(eager=False)
    )
    survivors = docs.join(reps.select("doc_id"), "doc_id", "left_semi")
    pairs = _neardup_pairs(
        survivors, text_col, near_threshold, max_doc_freq, candidates
    )
    comp = connected_components(pairs)  # (node, component); paired docs only
    # connected_components labels each component with its MINIMUM node id
    # (its documented contract), so the representatives are simply the
    # distinct labels — no min-per-group re-aggregation needed
    cluster_reps = comp.select(F.col("component").alias("doc_id")).distinct()
    singles = reps.join(
        comp.select(F.col("node").alias("doc_id")), "doc_id", "left_anti"
    )
    chosen = reps.join(
        cluster_reps.select("doc_id"), "doc_id", "left_semi"
    )
    return singles.unionByName(chosen).select("doc_id", "lang", "n_tokens")


def curate_corpus_quality_rep(
    docs: DataFrame,
    text_col: str = "text",
    near_threshold: float = 0.5,
    max_doc_freq: int | None = None,
    candidates: str = "exact",
) -> DataFrame:
    """Quality-representative curation: identical stages to
    ``curate_corpus_clustered``, but each near-dup cluster keeps its
    HIGHEST-QUALITY member (stopword share of the E4 metrics — the same
    signal ``datapipe.quality_topk_per_domain`` ranks by; a model score
    column drops in unchanged), tie-broken by minimum doc_id. This is
    the rule production pipelines actually want: min-id keeps whichever
    near-dup happened to be crawled first, quality-rep keeps the
    cleanest copy of the duplicated content.

    Scale shape: unchanged through the pair list; the rep choice is one
    row_number window over the (pair-graph-sized) component assignment
    joined to the already-computed quality projection — no extra corpus
    scan (the quality stage carries the score forward)."""
    s1 = quality_filter(docs, text_col=text_col, extra=("lang", text_col))
    reps = (
        s1.groupBy(F.sha2(F.col(text_col), 256).alias("digest"))
        .agg(
            F.min(
                F.struct("doc_id", "lang", "n_tokens", "stopword_ratio")
            ).alias("r")
        )
        .select("r.doc_id", "r.lang", "r.n_tokens", "r.stopword_ratio")
        .localCheckpoint(eager=False)
    )
    survivors = docs.join(reps.select("doc_id"), "doc_id", "left_semi")
    pairs = _neardup_pairs(
        survivors, text_col, near_threshold, max_doc_freq, candidates
    )
    comp = connected_components(pairs)  # (node, component); paired docs only
    scored = comp.join(
        reps.select("doc_id", "stopword_ratio"),
        comp["node"] == F.col("doc_id"),
    ).select("node", "component", "stopword_ratio")
    w = W.partitionBy("component").orderBy(
        F.desc("stopword_ratio"), F.asc("node")
    )
    cluster_reps = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(F.col("node").alias("doc_id"))
    )
    singles = reps.join(
        comp.select(F.col("node").alias("doc_id")), "doc_id", "left_anti"
    )
    chosen = reps.join(cluster_reps, "doc_id", "left_semi")
    return singles.unionByName(chosen).select("doc_id", "lang", "n_tokens")
