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
