"""Per-query bench diff against the recorded baseline (BASELINE.md §measured).

Usage::

    python scripts/bench_compare.py                # run bench.py now, diff vs r2
    python scripts/bench_compare.py BENCH_r03.json # diff a driver artifact vs r2
    python scripts/bench_compare.py NEW.json OLD.json

Exit code 1 when any query exceeds FLAG_RATIO x its baseline row — the
threshold sits above the observed ±35% shared-machine jitter so a flag
means a real plan regression, not noise.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAG_RATIO = 1.5


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        doc = json.load(f)
    # driver artifact ({"parsed": {...}}) or raw bench.py line
    parsed = doc.get("parsed", doc)
    return parsed["queries"]


def run_bench() -> dict[str, float]:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])["queries"]


def main() -> int:
    args = sys.argv[1:]
    base_path = args[1] if len(args) > 1 else os.path.join(REPO, "BENCH_r02.json")
    base = load_queries(base_path)
    new = load_queries(args[0]) if args else run_bench()

    flagged, missing = [], []
    print(f"{'query':40s} {'base':>7s} {'new':>7s} {'ratio':>6s}")
    for name, b in base.items():
        n = new.get(name)
        if n is None:
            # a silently-dropped baseline query is a gate failure too —
            # coverage shrinking must not read as "clean"
            missing.append(name)
            print(f"{name:40s} {b:7.3f} {'--':>7s}  <-- MISSING from new run")
            continue
        ratio = n / b if b else float("inf")
        mark = "  <-- REGRESSED" if ratio > FLAG_RATIO else ""
        if mark:
            flagged.append(name)
        print(f"{name:40s} {b:7.3f} {n:7.3f} {ratio:6.2f}{mark}")
    for name in sorted(set(new) - set(base)):
        print(f"{name:40s} {'--':>7s} {new[name]:7.3f}  (new: first measurement)")
    common = [k for k in new if k in base]
    if common:
        tb = sum(base[k] for k in common)
        tn = sum(new[k] for k in common)
        print(f"{'TOTAL (common queries)':40s} {tb:7.3f} {tn:7.3f} {tn / tb:6.2f}")
    else:
        print("no common queries between baseline and new run")
    if flagged or missing:
        if flagged:
            print(f"\nregressed beyond {FLAG_RATIO}x: {', '.join(flagged)}")
        if missing:
            print(f"missing from new run: {', '.join(sorted(set(missing)))}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
