"""Pin for the round-10 verdict's "What's wrong #1": the in-run noise
adjudicator's baseline table must read BOTH committed artifact shapes —

- raw bench output (flat: ``queries``/``sf``/``unit`` at top level,
  e.g. BENCH_SF1.json or a local run), and
- driver-committed rounds (``BENCH_r*.json``: the printed JSON line is
  nested under ``parsed``; the top level carries only run metadata).

Pre-fix the nested shape was invisible, so at sf0.1 the >1.5x retry
compared against an EMPTY table and could never fire.
"""

from __future__ import annotations

import json
import sys
import os

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from bench import _baseline_table  # noqa: E402


def _write(path, obj):
    with open(path, "w") as f:
        json.dump(obj, f)


def test_baseline_table_reads_flat_and_driver_nested(tmp_path):
    flat = {
        "metric": "headline_total_sec",
        "unit": "sec",
        "sf": 0.1,
        "queries": {"q_a": 2.0, "q_b": 1.0},
    }
    nested = {
        "n": 1,
        "rc": 0,
        "sf": "0.1",  # driver top-level metadata, NOT the parsed sf
        "parsed": {
            "metric": "headline_total_sec",
            "unit": "sec",
            "sf": 0.1,
            "queries": {"q_a": 1.5, "q_c": 3.0},
        },
    }
    _write(tmp_path / "BENCH_SFX.json", flat)
    _write(tmp_path / "BENCH_r99.json", nested)

    best = _baseline_table(0.1, here=str(tmp_path))
    # min across BOTH shapes: q_a takes the nested round's better time
    assert best == {"q_a": 1.5, "q_b": 1.0, "q_c": 3.0}

    # sf mismatch excludes an artifact entirely
    assert _baseline_table(1.0, here=str(tmp_path)) == {}


def test_baseline_table_vs_committed_round_artifacts():
    """Against the REAL committed artifacts: every BENCH_r*.json is the
    driver-nested shape, so the sf0.1 baseline table must be non-empty
    and cover the round-10 headline rows (pre-fix it was {})."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    best = _baseline_table(0.1, here=here)
    assert best, "sf0.1 baseline table must see the BENCH_r*.json rounds"
    from bench import SCOPE_REBASELINED

    r10 = json.load(open(os.path.join(here, "BENCH_r10.json")))["parsed"]
    for name, sec in r10["queries"].items():
        assert name in best
        if name not in SCOPE_REBASELINED:  # floored rows sit above mins
            assert best[name] <= sec + 1e-9


def test_scope_rebaselined_rows_get_a_floor():
    """A row whose measured work GREW by design (BASELINE.md records the
    new first-baseline) must not flag >1.5x forever against its
    smaller-scope era's minimum — the floor lifts the best-committed
    table at sf0.1 only."""
    from bench import SCOPE_REBASELINED

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    best = _baseline_table(0.1, here=here)
    for name, (floor, _why) in SCOPE_REBASELINED.items():
        assert best[name] >= floor
    # other rows keep their true minimum (spot-check the flagship)
    raw = {}
    import glob

    for p in glob.glob(os.path.join(here, "BENCH_*.json")):
        art = json.load(open(p))
        if "queries" not in art and isinstance(art.get("parsed"), dict):
            art = art["parsed"]
        if art.get("sf") == 0.1 and art.get("unit") == "sec":
            for k, v in (art.get("queries") or {}).items():
                raw[k] = min(raw.get(k, float("inf")), float(v))
    assert best["q_flagship_modvalues"] == raw["q_flagship_modvalues"]


def test_prior_artifact_and_common_row_geomean(tmp_path):
    """Round-12: the in-artifact round-over-round control. sf1/sf10
    compare against the committed decade artifacts, sf0.1 against the
    HIGHEST-round driver artifact (nested parsed.* shape included);
    the geomean runs over rows present in both with positive times."""
    from bench import _common_row_geomean, _prior_artifact

    d = str(tmp_path)
    with open(os.path.join(d, "BENCH_SF1.json"), "w") as f:
        json.dump({"sf": 1.0, "unit": "sec",
                   "queries": {"a": 2.0, "b": 4.0}}, f)
    with open(os.path.join(d, "BENCH_r09.json"), "w") as f:
        json.dump({"parsed": {"sf": 0.1, "unit": "sec",
                              "queries": {"a": 1.0}}}, f)
    with open(os.path.join(d, "BENCH_r10.json"), "w") as f:
        json.dump({"parsed": {"sf": 0.1, "unit": "sec",
                              "queries": {"a": 2.0, "c": 3.0}}}, f)
    name, pq = _prior_artifact(1.0, here=d)
    assert name == "BENCH_SF1.json" and pq == {"a": 2.0, "b": 4.0}
    name01, pq01 = _prior_artifact(0.1, here=d)
    assert name01 == "BENCH_r10.json"  # highest round, nested shape
    assert pq01 == {"a": 2.0, "c": 3.0}
    assert _prior_artifact(10.0, here=d) is None  # no SF10 artifact

    # geomean over the common rows only: a=1.0 (ratio 0.5), b=8.0
    # (ratio 2.0) -> geomean exactly 1.0; row d ignored (not in prior)
    out = _common_row_geomean(
        {"a": 1.0, "b": 8.0, "d": 9.0}, (name, pq)
    )
    assert out == {"prior": "BENCH_SF1.json", "rows": 2, "geomean": 1.0}
    assert _common_row_geomean({"a": 1.0}, None) is None


def test_prior_artifact_against_committed_tree():
    """On the real tree: every SF resolves to the expected committed
    artifact and the geomean is computable."""
    from bench import _common_row_geomean, _prior_artifact

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for sf, expect in ((1.0, "BENCH_SF1.json"), (10.0, "BENCH_SF10.json")):
        name, pq = _prior_artifact(sf, here=here)
        assert name == expect and len(pq) > 20
    name, pq = _prior_artifact(0.1, here=here)
    assert name.startswith("BENCH_r") and len(pq) > 20
    out = _common_row_geomean(dict(list(pq.items())[:5]), (name, pq))
    assert out["rows"] == 5 and abs(out["geomean"] - 1.0) < 1e-9


def test_cpu_calibration_probe_is_positive_and_bounded():
    """The clock probe must be cheap (seconds, not minutes) and
    non-zero — it rides at the start and end of every artifact so a
    slow-clock window (round 12 measured 2.4x fixed-work swings with
    idle ~0% and steal ~1% on this box) is visible inside the artifact
    that suffered it."""
    from bench import _cpu_calibration

    t = _cpu_calibration()
    assert 0.0 < t < 60.0
