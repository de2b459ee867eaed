"""Adversarial skew stress for the dedup caps (VERDICT r2 #8).

Two planted pathologies that break naive near-dup pipelines at scale:

1. a HOT SHINGLE — boilerplate text shared by most of the corpus, whose
   posting list makes the inverted-index self-join O(corpus^2);
2. a GIANT NEAR-IDENTICAL CLUSTER — many copies of one document, whose
   LSH buckets expand to O(cluster^2) candidate pairs in a single task.

The caps (``max_doc_freq`` for the inverted index, ``max_bucket`` for the
LSH bucket expansion) must bound the blow-up while keeping recall on
planted near-dup pairs that are NOT part of the pathology.
"""

from __future__ import annotations

import pytest

WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango",
]


def _unique_text(i: int, n_words: int = 24) -> str:
    # deterministic, shingle-disjoint-ish tail per doc
    return " ".join(WORDS[(i * 7 + j * (1 + i % 5)) % 20] + str(i) for j in range(n_words))


BOILER = "terms of service apply to all content on this site please read carefully"


@pytest.fixture(scope="module")
def hot_shingle_corpus(spark):
    """140 background docs sharing an identical boilerplate sentence (every
    boilerplate shingle has document frequency 140) + 3 planted near-dup
    pairs whose similarity comes from their own long shared tails."""
    rows = []
    for i in range(140):
        rows.append((i, f"{BOILER} {_unique_text(i)}"))
    # planted pairs: long shared tail, small unique head -> high jaccard,
    # NO boilerplate (so the cap cannot be what finds them)
    planted = []
    for k in range(3):
        base = _unique_text(1000 + k, n_words=40)
        a_id, b_id = 2000 + 2 * k, 2001 + 2 * k
        rows.append((a_id, f"headA{k} {base}"))
        rows.append((b_id, f"headB{k} {base}"))
        planted.append((a_id, b_id))
    return (
        spark.createDataFrame(rows, "doc_id long, text string").localCheckpoint(),
        planted,
    )


@pytest.fixture(scope="module")
def megacluster_corpus(spark):
    """100 identical copies of one document (the LSH mega-bucket) + 2
    planted near-dup pairs outside the cluster."""
    clone = "identical spam document body repeated across the entire corpus " + _unique_text(1)
    rows = [(i, clone) for i in range(100)]
    planted = []
    for k in range(2):
        base = _unique_text(3000 + k, n_words=40)
        a_id, b_id = 4000 + 2 * k, 4001 + 2 * k
        rows.append((a_id, f"headA{k} {base}"))
        rows.append((b_id, f"headB{k} {base}"))
        planted.append((a_id, b_id))
    return (
        spark.createDataFrame(rows, "doc_id long, text string").localCheckpoint(),
        planted,
    )


def test_max_doc_freq_bounds_hot_shingle_volume(spark, hot_shingle_corpus):
    from opcua_ingestion_engine_spark.operators import dedup as D

    docs, planted = hot_shingle_corpus
    # tiny threshold surfaces EVERY pair sharing >=1 surviving shingle —
    # a proxy for candidate volume through the inverted-index join
    uncapped = D.jaccard_pairs(docs, block_col=None, threshold=0.01).count()
    capped_df = D.jaccard_pairs(docs, block_col=None, threshold=0.01, max_doc_freq=20)
    capped_rows = capped_df.collect()
    capped = len(capped_rows)
    # 140 boilerplate docs pair all-to-all without the cap (~9.7k pairs);
    # with it, only docs sharing sub-cap shingles pair up
    assert uncapped > 9000
    assert capped < uncapped / 50, (capped, uncapped)
    got = {(r["doc_a"], r["doc_b"]) for r in capped_rows}
    for pair in planted:
        assert pair in got, f"planted pair {pair} lost by max_doc_freq cap"

    # at a realistic threshold the planted pairs still score high THROUGH
    # the cap (their similarity lives in sub-cap shingles)
    strict = {
        (r["doc_a"], r["doc_b"])
        for r in D.jaccard_pairs(
            docs, block_col=None, threshold=0.5, max_doc_freq=20
        ).collect()
    }
    for pair in planted:
        assert pair in strict


def test_max_bucket_bounds_megacluster_expansion(spark, megacluster_corpus):
    from opcua_ingestion_engine_spark.operators import dedup as D
    from opcua_ingestion_engine_spark.operators.text import word_ngrams
    from pyspark.sql import functions as F

    docs, planted = megacluster_corpus
    sh = docs.select(
        "doc_id", F.array_distinct(word_ngrams(F.col("text"), 3)).alias("shingles")
    )
    sig = D.minhash_signatures(sh).localCheckpoint()

    uncapped = D.lsh_candidate_pairs(sig).count()
    capped_rows = D.lsh_candidate_pairs(sig, max_bucket=50).collect()
    # the 100-clone cluster contributes C(100,2)=4950 candidate pairs
    # uncapped; the cap drops those buckets wholesale
    assert uncapped >= 4950
    assert len(capped_rows) < 100, (len(capped_rows), uncapped)
    got = {(r["doc_a"], r["doc_b"]) for r in capped_rows}
    for pair in planted:
        assert pair in got, f"planted pair {pair} lost by max_bucket cap"


def test_minhash_neardup_end_to_end_with_cap(spark, megacluster_corpus):
    """The full pipeline with max_bucket: planted pairs verified with
    their true jaccard; mega-cluster pairs (exact dups — E1's job) are the
    only casualties of the cap."""
    from opcua_ingestion_engine_spark.operators import dedup as D

    docs, planted = megacluster_corpus
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.minhash_neardup_pairs(
            docs, threshold=0.5, max_bucket=50
        ).collect()
    }
    for pair in planted:
        assert pair in out and out[pair] > 0.8
    # every surviving pair is a genuine near-dup (verify stage intact)
    assert all(j >= 0.5 for j in out.values())


def test_simhash_neardup_with_cap_keeps_planted(spark):
    """SimHash's max_hamming=3 needs planted pairs within 3 bit flips —
    one substituted token in ~40 lands at hamming ~8-9 (many bit-votes
    sit at low margins), so the planted pairs here are exact clones
    (hamming 0), distinct per pair and from the mega-cluster."""
    from opcua_ingestion_engine_spark.operators import dedup as D

    clone = "identical spam document body repeated across the corpus " + _unique_text(1)
    rows = [(i, clone) for i in range(100)]
    planted = []
    for k in range(2):
        text = f"planted pair {k} " + _unique_text(5000 + k, n_words=40)
        a_id, b_id = 6000 + 2 * k, 6001 + 2 * k
        rows.append((a_id, text))
        rows.append((b_id, text))
        planted.append((a_id, b_id))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r["doc_a"], r["doc_b"])
        for r in D.simhash_neardup_pairs(docs, max_bucket=50).collect()
    }
    # mega-cluster pairs capped away, planted pairs kept
    assert len(got) < 100
    for pair in planted:
        assert pair in got


def test_image_neardup_max_bucket_bounds_identical_image_cluster(spark):
    """Adversarial image corpus: one identical image repeated 60x (the
    exact-dup cluster that belongs to E1 upstream) plus planted distinct
    near-pairs. max_bucket must bound the in-bucket O(k^2) expansion
    while the planted pair (rare fingerprint) survives."""
    import numpy as np

    from pyspark.sql import functions as F

    from opcua_ingestion_engine_spark.operators import multimodal as M
    from opcua_ingestion_engine_spark.operators.dedup import (
        hamming_neardup_pairs,
    )

    mega = np.zeros((16, 16), dtype=np.uint8)
    mega[:, 8:] = 255
    rare = np.zeros((16, 16), dtype=np.uint8)
    rare[4:, :] = 255
    rows = [(i, bytearray(M.encode_png(mega))) for i in range(60)]
    rows += [(100, bytearray(M.encode_png(rare))),
             (101, bytearray(M.encode_png(rare, filter_type=2)))]
    mm = spark.createDataFrame(rows, "doc_id long, payload binary").select(
        "doc_id", "payload",
        F.struct(F.lit(16).alias("width"), F.lit(16).alias("height"),
                 F.lit(1).alias("channels"), F.lit("png").alias("fmt"),
                 ).alias("meta"),
    )
    hashes = M.image_ahash(mm)
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in hamming_neardup_pairs(
            hashes, "phash", same_key="fmt", max_bucket=10
        ).collect()
    }
    assert (100, 101) in capped            # rare planted pair survives
    assert not any(a < 60 and b < 60 for a, b in capped)  # megacluster cut
    # uncapped: the megacluster alone contributes 60*59/2 pairs
    full = hamming_neardup_pairs(hashes, "phash", same_key="fmt").count()
    assert full >= 60 * 59 // 2


# ---------------------------------------------------------------------------
# Temporal-operator hot-key stress (VERDICT r4 #8): one device/user owns
# 50% of all events. The per-key window operators must stay correct (the
# hot partition is processed by one task — that's the contract of a
# per-key sort, not a defect) and the plans must stay free of cartesian
# blowups.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def hot_key_events(spark):
    """20k events: user 42 owns 10k (50%) with value spikes planted every
    500 events and a 1h gap every 1000; 50 cold users own 200 each."""
    import datetime

    base = datetime.datetime(2024, 3, 1)
    types = ["view", "click", "purchase", "error"]
    rows = []
    eid = 0
    for i in range(10_000):
        rows.append((
            eid,
            base + datetime.timedelta(seconds=7 * i + (i // 1000) * 3600),
            42,
            types[i % 4],
            5000.0 if i % 500 == 0 and i > 0 else 50.0,
        ))
        eid += 1
    for u in range(50):
        for i in range(200):
            rows.append((
                eid,
                base + datetime.timedelta(seconds=61 * i + u),
                100 + u,
                types[(i + u) % 4],
                50.0,
            ))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).localCheckpoint(eager=True)
    return df


def _no_cartesian(df):
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_hot_key_matches_model(spark, hot_key_events):
    """Backward as-of join under a 50%-hot key: every purchase must attach
    the latest view at-or-before it — verified row-for-row against a
    bisect model over the full 20k-event fixture."""
    import bisect
    from collections import defaultdict

    from opcua_ingestion_engine_spark.operators import timeseries as TS

    ev = hot_key_events
    left = ev.filter("event_type = 'purchase'")
    right = ev.filter("event_type = 'view'")
    out = TS.asof_join(
        left, right, key="user_id", left_ts="ts", right_ts="ts",
        payload={"view_event": "event_id"}, tiebreak="event_id",
    )
    _no_cartesian(out)

    views = defaultdict(list)
    for r in right.select("user_id", "ts", "event_id").collect():
        views[r["user_id"]].append((r["ts"], r["event_id"]))
    for v in views.values():
        v.sort()
    expect = {}
    for r in left.select("user_id", "ts", "event_id").collect():
        vs = views[r["user_id"]]
        i = bisect.bisect_right(vs, (r["ts"], float("inf")))
        expect[r["event_id"]] = vs[i - 1][1] if i else None
    got = {r["event_id"]: r["view_event"] for r in out.collect()}
    # 2500 hot purchases (i % 4 == 2) + 50 cold users x 50 purchases
    assert got == expect and len(got) == 5000


def test_sessionize_hot_key_gap_structure(spark, hot_key_events):
    """Gap sessionization with the hot user's planted 1h gaps: exactly 10
    sessions of 1000 events each for the hot key, one session per cold
    user, correct in one per-key sort."""
    from pyspark.sql import functions as F

    from opcua_ingestion_engine_spark.operators import timeseries as TS

    sess = TS.sessionize(
        hot_key_events.select("user_id", "ts", "event_id"),
        key="user_id", ts="ts", tiebreak="event_id", gap_s=1800,
    )
    _no_cartesian(sess)
    per = (
        sess.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    hot = sorted((r["session_id"], r["n"]) for r in per if r["user_id"] == 42)
    assert hot == [(i, 1000) for i in range(10)], hot[:12]
    cold = [(r["user_id"], r["n"]) for r in per if r["user_id"] != 42]
    assert len(cold) == 50 and all(n == 200 for _, n in cold)


def test_rolling_zscore_hot_key_flags_planted_spikes(spark, hot_key_events):
    """Rolling z-score over the hot key: exactly the 19 planted 5000.0
    spikes flag (each preceded by a zero-spread window of 50.0s — the
    +Infinity envelope branch); no cold-user row flags."""
    from opcua_ingestion_engine_spark.operators import timeseries as TS

    out = TS.rolling_zscore_anomalies(hot_key_events)
    _no_cartesian(out)
    rows = out.collect()
    assert all(r["user_id"] == 42 and r["value"] == 5000.0 for r in rows)
    assert len(rows) == 19, len(rows)


def test_funnel_hot_key_counts_each_user_once(spark, hot_key_events):
    """The ordered funnel must count the 10k-event hot user exactly once
    per step — per-user window mins, no per-key event-list blowup. Every
    user (hot + 50 cold) completes view -> click -> purchase."""
    from opcua_ingestion_engine_spark.operators import timeseries as TS

    out = TS.funnel_counts(hot_key_events)
    _no_cartesian(out)
    got = {r["step_name"]: r["n_users"] for r in out.collect()}
    assert got == {"view": 51, "click": 51, "purchase": 51}, got
