"""[EXT] E4 — byte-pair-encoding tokenizer induction and application.

The missing tokenizer step of the training-data story: E4's
``bpe_ish_tokens`` splits with a fixed regex, but a real pipeline LEARNS
its subword vocabulary from the corpus (BPE merges, per Sennrich et al.
2016 — the algorithm GPT-2/RoBERTa tokenizers train with) and then
segments every document with it.

Scale shape — the standard trick makes this corpus-size-independent:
BPE statistics depend only on the **distinct-word frequency table**
(one explode->groupBy over the corpus, the same shuffle as a word
count), which is orders of magnitude smaller than the corpus itself.
Training then iterates over that small table: each merge round is one
pair-explode -> groupBy(pair) -> weighted-sum -> top-1 (a single
map-side-combined shuffle over segment-state rows), followed by a
vectorized merge application to only the rows that contain the chosen
pair. The driver receives exactly ONE row per round (the argmax pair).
State is ``localCheckpoint``ed each round so 10-50 rounds don't stack
lineage (and never ``persist`` — see the repo cache-manager note).

Determinism: ties on pair count break lexicographically, so the merge
sequence is reproducible run-to-run and matches the pure-Python model
the tests pin against. No end-of-word marker is used (documented
simplification; adding one is a one-line change to ``_to_segments``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens

# split a word into single characters: a zero-width cut before every
# char except the first. "(?!^)" avoids a leading empty string and
# "(?=.)" one at the end — Spark's split(limit=-1) KEEPS trailing empty
# strings, unlike Java's String.split
_CHAR_SPLIT = "(?!^)(?=.)"


def word_frequency(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct-word frequency table — the sufficient statistic for BPE
    training. One explode + one map-side-combined shuffle on word."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )


def _to_segments(words: DataFrame) -> DataFrame:
    """(word, wc) -> (seg, wc) where seg is the space-joined symbol
    sequence, initially one symbol per character."""
    return words.select(
        F.concat_ws(" ", F.split(F.col("word"), _CHAR_SPLIT)).alias("seg"),
        "wc",
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    """Weighted adjacent-symbol-pair counts over the segment state: one
    bounded explode (|symbols|-1 pairs per row) + one shuffle on pair."""
    syms = F.split(F.col("seg"), " ")
    pairs = F.expr(
        "transform(slice(split(seg, ' '), 1, size(split(seg, ' ')) - 1), "
        "(x, i) -> struct(x AS left, element_at(split(seg, ' '), i + 2) AS right))"
    )
    return (
        state.filter(F.size(syms) >= 2)
        .select("wc", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("wc").alias("cnt"))
    )


def _merge_seg(seg: str, left: str, right: str) -> str:
    """Greedy left-to-right merge of one adjacent pair within a segment
    string — the exact reference semantics of BPE's training update."""
    syms = seg.split(" ")
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return " ".join(out)


def _train_local(
    wordfreq: list[tuple[str, int]],
    n_merges: int,
    min_count: int,
) -> list[tuple[str, str, int]]:
    """Driver-side BPE training over the collected word-frequency table —
    the indexed incremental algorithm (Sennrich et al. 2016 reference
    implementation shape): maintain pair->weighted-count and
    pair->{word_idx: occurrences}, and on each merge touch ONLY the words
    that contain the chosen pair. Semantics are pinned equal to the
    distributed loop: identical pair counting (every adjacent occurrence,
    weighted by wc), identical greedy left-to-right merge application
    (``_merge_seg``), identical tie-break (count desc, then (left, right)
    lexicographic asc), identical ``min_count`` stop."""
    from collections import defaultdict

    words: list[tuple[str, ...]] = [tuple(w) for w, _ in wordfreq]
    freqs: list[int] = [int(c) for _, c in wordfreq]
    stats: dict[tuple[str, str], int] = defaultdict(int)
    where: dict[tuple[str, str], set[int]] = defaultdict(set)
    for i, (word, f) in enumerate(zip(words, freqs)):
        for pair in zip(word, word[1:]):
            stats[pair] += f
            where[pair].add(i)

    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        if not stats:
            break
        pair, cnt = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        left, right = pair
        merges.append((left, right, cnt))
        merged = left + right
        for i in list(where.get(pair, ())):
            word, f = words[i], freqs[i]
            # greedy left-to-right, identical to _merge_seg
            out: list[str] = []
            j = 0
            while j < len(word):
                if j + 1 < len(word) and word[j] == left and word[j + 1] == right:
                    out.append(merged)
                    j += 2
                else:
                    out.append(word[j])
                    j += 1
            new_word = tuple(out)
            # retract the old word's adjacent pairs, add the new word's —
            # equivalent to a full recount restricted to the touched rows
            for p in zip(word, word[1:]):
                stats[p] -= f
                if stats[p] <= 0:
                    del stats[p]
                    where.pop(p, None)
                else:
                    s = where.get(p)
                    if s is not None:
                        s.discard(i)
            words[i] = new_word
            for p in zip(new_word, new_word[1:]):
                stats[p] += f
                where[p].add(i)
    return merges


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    min_count: int = 2,
    text_col: str = "text",
    driver_byte_budget: int | None = 512 << 20,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    [(left, right, weighted_count), ...] in merge order (rank = index).
    Stops early when the best pair's weighted count drops below
    ``min_count`` (no merge is worth learning from a single word).

    Scale path (VERDICT r3/r4): BPE's sufficient statistic is the
    distinct-word frequency table — corpus-size-independent, typically a
    few MB even for a 100 TB corpus. When its estimated driver footprint
    fits ``driver_byte_budget``, the table is collected ONCE and training
    runs as an in-memory incremental loop (2 Spark jobs total: the size
    probe and the collect — at n_merges=32k that replaces ~64k
    driver-barrier jobs of the distributed loop). The distributed
    per-round loop remains as the fallback for vocabularies that exceed
    the budget (``driver_byte_budget=0``/``None`` forces it; a test pins
    both paths produce identical merges)."""
    from pyspark.sql.functions import pandas_udf

    wf = word_frequency(docs, text_col)
    if driver_byte_budget:
        probe = wf.agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum(F.length("word")), F.lit(0)).alias("chars"),
        ).first()
        # conservative Python-object overhead: ~200 B/word of index +
        # ~100 B/char of tuple/str cells across stats and segment state
        est = int(probe["n"]) * 200 + int(probe["chars"]) * 100
        if est <= driver_byte_budget:
            rows = wf.collect()
            return _train_local(
                [(r["word"], int(r["wc"])) for r in rows], n_merges, min_count
            )

    state = _to_segments(wf).localCheckpoint(eager=True)
    # union(hit, miss) below concatenates both sides' partitions, so
    # without a bound the state's partition count DOUBLES per round —
    # 32 rounds would schedule 32*2^32 tasks. coalesce (shuffle-free)
    # back to the starting width each round keeps every round's job at a
    # constant, cluster-sized task count.
    n_parts = max(1, state.rdd.getNumPartitions())
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(state)
            .orderBy(F.col("cnt").desc(), F.col("left").asc(), F.col("right").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_count:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], int(top[0]["cnt"])
        merges.append((left, right, cnt))

        @pandas_udf("string")
        def apply_merge(segs: pd.Series) -> pd.Series:
            # bind via defaults: the eager checkpoint below evaluates this
            # within the iteration, but late-binding closures are a trap
            return segs.map(lambda s, l=left, r=right: _merge_seg(s, l, r))

        needle = F.concat(F.lit(" "), F.lit(f"{left} {right}"), F.lit(" "))
        padded = F.concat(F.lit(" "), F.col("seg"), F.lit(" "))
        # filter + union, NOT a when()-gated UDF: Catalyst extracts Python
        # UDFs out of conditionals and evaluates them for EVERY row before
        # the CASE picks a branch, so the gate would not skip any work —
        # splitting the frame really does run the UDF only on rows
        # containing the chosen pair (usually a small fraction of the
        # vocabulary per round)
        hit = state.filter(padded.contains(needle))
        miss = state.filter(~padded.contains(needle))
        state = (
            hit.withColumn("seg", apply_merge(F.col("seg")))
            .unionByName(miss)
            .coalesce(n_parts)
            .localCheckpoint(eager=True)
        )
    return merges


def _segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference BPE encoding: repeatedly merge the lowest-rank adjacent
    pair until none of the learned merges applies."""
    syms = list(word)
    while len(syms) >= 2:
        best_i, best_rank = -1, len(ranks)
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and r < best_rank:
                best_i, best_rank = i, r
        if best_i < 0:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
) -> DataFrame:
    """Apply learned merges to every document. Returns
    (doc_id, n_tokens_ws, n_tokens_bpe, compression) where compression is
    BPE tokens per whitespace token — the fertility metric tokenizer
    evaluations report. The merge table rides to executors in the Arrow
    UDF closure (config-sized: n_merges entries)."""
    from pyspark.sql.functions import pandas_udf

    ranks = {(l, r): i for i, (l, r, _c) in enumerate(merges)}

    @pandas_udf("int")
    def n_bpe(texts: pd.Series) -> pd.Series:
        return texts.map(
            lambda t: sum(len(_segment_word(w, ranks)) for w in t.split(" "))
        )

    n_ws = F.size(tokens(F.col(text_col))).cast("long")
    base = docs.select(
        "doc_id",
        n_ws.alias("n_tokens_ws"),
        n_bpe(F.col(text_col)).cast("long").alias("n_tokens_bpe"),
    )
    return base.withColumn(
        "compression",
        F.col("n_tokens_bpe").cast("double") / F.col("n_tokens_ws").cast("double"),
    )
