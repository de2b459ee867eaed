"""Property-based pins (hypothesis): the scaling scalar functions against
an independent Python-decimal model of the reference arithmetic
(Services/OpcSubscribeService.cs:565-576 — round-half-up to 3), and the
LWW per-point merge algebra against brute-force max over all permutations.

Batched strategy: each hypothesis example is a LIST of cases evaluated in
ONE DataFrame action, so the suite stays a handful of Spark jobs, not
hundreds."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from opcua_ingestion_engine_spark.functions.scaling import apply_scaling

DEC6 = st.decimals(
    min_value=Decimal("-999999"),
    max_value=Decimal("999999"),
    places=6,
    allow_nan=False,
    allow_infinity=False,
)
DEC4 = st.decimals(
    min_value=Decimal("-999.9"),
    max_value=Decimal("999.9"),
    places=4,
    allow_nan=False,
    allow_infinity=False,
)
MODES = st.sampled_from(["slope_intercept", "point_slope", "none", "weird", ""])

CASE = st.tuples(DEC6, MODES, DEC4, DEC4, DEC4, DEC4)


def _model(value, mode, slope, offset, factor, tmin) -> float:
    """Reference model in exact decimal, round-half-up to 3 like C#
    Math.Round(..., MidpointRounding default for decimal SQL path)."""
    if mode == "slope_intercept":
        r = value * slope + offset
    elif mode == "point_slope":
        r = value * factor + tmin
    else:
        return float(value)
    return float(r.quantize(Decimal("0.001"), rounding=ROUND_HALF_UP))


@settings(max_examples=5, deadline=None)
@given(st.lists(CASE, min_size=1, max_size=60))
def test_scaling_matches_decimal_model(spark, cases):
    df = spark.createDataFrame(
        [(i, *c) for i, c in enumerate(cases)],
        "i int, value decimal(18,6), scale_mode string, slope decimal(10,4), "
        "offset decimal(10,4), factor decimal(10,4), target_min decimal(10,4)",
    )
    out = df.select(
        "i",
        apply_scaling(
            F.col("value"),
            F.col("scale_mode"),
            F.col("slope"),
            F.col("offset"),
            F.col("factor"),
            F.col("target_min"),
        ).alias("scaled"),
    ).collect()
    got = {r["i"]: r["scaled"] for r in out}
    for i, c in enumerate(cases):
        assert got[i] == _model(*c), (i, c, got[i], _model(*c))


EVENT = st.tuples(
    st.integers(min_value=0, max_value=3),  # device idx
    st.integers(min_value=0, max_value=2),  # measure idx
    st.integers(min_value=0, max_value=10**9),  # ts_us
    st.integers(min_value=0, max_value=10**6),  # event_id
    st.sampled_from([0, 2147483648]),  # status
)


@settings(max_examples=5, deadline=None)
@given(st.lists(EVENT, min_size=1, max_size=40), st.randoms())
def test_perpoint_merge_is_split_invariant(spark, events, rnd):
    """Splitting the event list into arbitrary micro-batches and merging
    must equal the single-batch state (T9 idempotence/associativity)."""
    from opcua_ingestion_engine_spark.operators import ingest

    def frame(evts):
        return spark.createDataFrame(
            [
                (
                    f"DEV-{d}",
                    f"m{m}",
                    f"type-{d % 2}",
                    f"m{m}_raw",
                    "u",
                    ts,
                    eid,
                    status,
                )
                for d, m, ts, eid, status in evts
            ],
            "daq_name string, measure_name string, device_type string, "
            "tag_name string, unit string, ts_us long, event_id long, "
            "status_code long",
        ).select(
            "daq_name",
            "measure_name",
            "device_type",
            "tag_name",
            # perpoint_state keys on the CONFIG tag; in this harness the
            # stream and config tags coincide, as in the fixture corpus
            F.col("tag_name").alias("cfg_tag_name"),
            "unit",
            F.timestamp_micros(F.col("ts_us")).alias("received_ts"),
            "event_id",
            "status_code",
            F.lit("none").alias("scale_mode"),
            F.lit(None).cast("decimal(10,4)").alias("slope"),
            F.lit(None).cast("decimal(10,4)").alias("offset"),
            F.lit(None).cast("decimal(10,4)").alias("factor"),
            F.lit(None).cast("decimal(10,4)").alias("target_min"),
            (F.col("event_id") % 7).cast("double").alias("value"),
        )

    whole = ingest.perpoint_state(frame(events)).collect()

    shuffled = list(events)
    rnd.shuffle(shuffled)
    cut = rnd.randint(0, len(shuffled))
    state = None
    for part in (shuffled[:cut], shuffled[cut:]):
        if not part:
            continue
        state = ingest.merge_perpoint_states(state, ingest.perpoint_state(frame(part)))
    merged = state.collect()

    key = lambda r: (r["daq_name"], r["measure_name"])
    assert sorted(map(tuple, merged)) == sorted(map(tuple, whole))


# ---------------------------------------------------------------------------
# As-of join vs a brute-force per-row model
# ---------------------------------------------------------------------------

_EVENT = st.tuples(
    st.integers(min_value=0, max_value=3),     # key
    st.integers(min_value=0, max_value=20),    # ts (seconds, collisions likely)
    st.integers(min_value=0, max_value=40),    # value payload
)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(_EVENT, min_size=1, max_size=25),
    st.lists(_EVENT, min_size=0, max_size=25),
)
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    """asof_join == per-left-row argmax over {right | same key, ts <=
    left.ts}, ordering by (ts, tiebreak) — including timestamp collisions
    between and within sides."""
    from datetime import datetime, timezone

    from opcua_ingestion_engine_spark.operators import timeseries as TS

    def ts(s):
        return datetime.fromtimestamp(s, tz=timezone.utc).replace(tzinfo=None)

    lrows = [(i, k, ts(t), float(v)) for i, (k, t, v) in enumerate(lefts)]
    rrows = [
        (1000 + i, k, ts(t), float(v)) for i, (k, t, v) in enumerate(rights)
    ]
    schema = "event_id long, user_id long, ts timestamp, value double"
    out = TS.asof_join(
        spark.createDataFrame(lrows, schema),
        spark.createDataFrame(rrows, schema) if rrows
        else spark.createDataFrame([], schema),
        key="user_id", left_ts="ts", right_ts="ts",
        payload={"v": "value"}, tiebreak="event_id",
    ).collect()
    got = {r["event_id"]: r["v"] for r in out}

    expect = {}
    for lid, lk, lt, _ in lrows:
        cands = [(rt, rid, rv) for rid, rk, rt, rv in rrows if rk == lk and rt <= lt]
        expect[lid] = max(cands)[2] if cands else None
    assert got == expect


@given(
    data=st.data(),
    h=st.integers(min_value=1, max_value=12),
    w=st.integers(min_value=1, max_value=12),
    ch=st.sampled_from([1, 3, 4]),
    ft=st.integers(min_value=0, max_value=4),
)
@settings(max_examples=60, deadline=None)
def test_png_codec_roundtrip_property(data, h, w, ch, ft):
    """Pure-Python property (no Spark job): encode_png -> _decode_png is
    the identity for every shape x color type x scanline filter."""
    import numpy as np

    from opcua_ingestion_engine_spark.operators import multimodal as M

    n = h * w * ch
    flat = np.array(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255), min_size=n, max_size=n
            )
        ),
        dtype=np.uint8,
    )
    px = flat.reshape((h, w) if ch == 1 else (h, w, ch))
    out, got_w, got_h, got_ch = M._decode_png(M.encode_png(px, filter_type=ft))
    assert (got_w, got_h, got_ch) == (w, h, ch)
    assert (out.reshape(px.shape) == px).all()


def test_shuffle_and_epoch_assignments_stable_under_corpus_growth(spark):
    """The documented manifest-stability contracts: appending documents
    (1) never moves an existing doc to a different shard and never
    changes the RELATIVE order of existing docs within a shard
    (global_shuffle), and (2) never changes an existing doc's copy
    count (epoch_expand) or split (split_assign). These are what make
    the assignments safe to persist in a dataset manifest."""
    from opcua_ingestion_engine_spark.operators import datapipe as DP

    base = spark.createDataFrame(
        [(i, f"text {i}", f"src{i % 3}") for i in range(0, 400, 2)],
        "doc_id long, text string, source string",
    )
    grown = base.unionByName(
        spark.createDataFrame(
            [(i, f"text {i}", f"src{i % 3}") for i in range(1, 400, 2)],
            "doc_id long, text string, source string",
        )
    )

    s1 = {r["doc_id"]: (r["shard"], r["position"])
          for r in DP.global_shuffle(base).collect()}
    s2 = {r["doc_id"]: (r["shard"], r["position"])
          for r in DP.global_shuffle(grown).collect()}
    for did, (shard, _pos) in s1.items():
        assert s2[did][0] == shard  # shard never changes
    # relative order within each shard is preserved
    for shard in {v[0] for v in s1.values()}:
        old_order = [d for d, v in sorted(s1.items(), key=lambda kv: kv[1][1])
                     if v[0] == shard]
        new_pos = {d: s2[d][1] for d in old_order}
        assert old_order == sorted(old_order, key=lambda d: new_pos[d])

    reps = {"src0": 2.5, "src1": 0.5}
    e1 = {}
    for r in DP.epoch_expand(base, reps).collect():
        e1[r["doc_id"]] = e1.get(r["doc_id"], 0) + 1
    e2 = {}
    for r in DP.epoch_expand(grown, reps).collect():
        e2[r["doc_id"]] = e2.get(r["doc_id"], 0) + 1
    for did, copies in e1.items():
        assert e2.get(did, 0) == copies

    sp1 = {r["doc_id"]: r["split"] for r in DP.split_assign(base).collect()}
    sp2 = {r["doc_id"]: r["split"] for r in DP.split_assign(grown).collect()}
    for did, split in sp1.items():
        assert sp2[did] == split


@given(
    data=st.data(),
    n=st.integers(min_value=0, max_value=4),
    h=st.sampled_from([2, 4, 6, 10]),
    w=st.sampled_from([2, 4, 8]),
    num=st.integers(min_value=1, max_value=60),
    den=st.integers(min_value=1, max_value=2),
)
@settings(max_examples=40, deadline=None)
def test_y4m_codec_roundtrip_property(data, n, h, w, num, den):
    """Pure-Python property (no Spark job): encode_y4m -> decode_y4m is
    the identity on the luma planes for every frame count x even
    dimensions x frame rate, including the zero-frame stream."""
    import numpy as np

    from opcua_ingestion_engine_spark.operators import multimodal as M

    total = n * h * w
    flat = np.array(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=total, max_size=total,
            )
        ),
        dtype=np.uint8,
    )
    clip = flat.reshape(n, h, w)
    frames, got_w, got_h, got_fps = M.decode_y4m(
        M.encode_y4m(clip, fps_num=num, fps_den=den)
    )
    assert (got_w, got_h) == (w, h)
    assert got_fps == num / den
    assert frames.shape == clip.shape and (frames == clip).all()


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=0,
        max_size=60,
    ),
    st.booleans(),
)
def test_dir_col_sums_exact_for_any_int64_column(tmp_path_factory, vals, split):
    """Property: the commit-time column-sum pass is EXACT for any int64
    column — including magnitudes where a naive int64 reduction wraps
    (round-9 ADVICE: epoch-nano-scale values overflowed within a few
    rows and the garbage was served as metadata-exact). Pure
    pyarrow/numpy path, no Spark."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from opcua_ingestion_engine_spark.operators import tablefmt as TF

    root = str(tmp_path_factory.mktemp("sums"))
    d = "data/v00000-prop"
    full = f"{root}/{d}"
    import os

    os.makedirs(full, exist_ok=True)
    # optionally split across two files (the per-file/bignum boundary)
    halves = [vals[: len(vals) // 2], vals[len(vals) // 2:]] if split else [vals]
    for i, h in enumerate(halves):
        pq.write_table(
            pa.table({"v": pa.array(h, pa.int64())}),
            f"{full}/part-{i}.parquet",
        )
    got = TF._dir_col_sums(root, d, ("v",))
    assert got == {"v": sum(vals)}
