"""Pins the driver-checked registration window.

The external driver oracle-checks only the first 50 registered queries.
Round 2's verdict flagged that the LLM-pipeline (E1-E7), TPC-H, and
time-series-join queries all registered after slot 50 and therefore had no
driver-green correctness row. These tests pin the explicit window ordering
in ``plans/__init__.py`` so a refactor can't silently regress the window.
"""

from __future__ import annotations

import re

from opcua_ingestion_engine_spark import plans

WINDOW_SIZE = 50


def _window_names() -> list[str]:
    return list(plans.queries().keys())[:WINDOW_SIZE]


def test_window_matches_declared_order():
    assert _window_names() == list(plans.DRIVER_WINDOW)[:WINDOW_SIZE]


def test_flagship_is_first():
    assert _window_names()[0] == "q_flagship_modvalues"


def test_every_window_query_has_oracle():
    oracles = plans.oracle_sql()
    missing = [n for n in _window_names() if n not in oracles]
    assert missing == [], f"window queries without oracle SQL: {missing}"


def test_no_oracle_entries_register_last():
    names = list(plans.queries().keys())
    oracles = plans.oracle_sql()
    flags = [n in oracles for n in names]
    # Once the first rows-only entry appears, no oracle-checked entry follows.
    first_rows_only = flags.index(False) if False in flags else len(flags)
    assert all(not f for f in flags[first_rows_only:]), (
        "oracle-checked query registered after a rows-only query"
    )
    assert first_rows_only >= WINDOW_SIZE


def test_window_covers_operator_families():
    """One oracle-checked representative of each family sits in the window."""
    window = _window_names()
    families = {
        "e1": r"^q_e1_",
        "e2": r"^q_e2_",
        "e3": r"^q_e3_",
        "e4": r"^q_e4_",
        "e5": r"^q_e5_",
        "e6": r"^q_e6_",
        "e7": r"^q_e7_",
        "tpch": r"^q_tpch_",
        "asof": r"^q_asof_",
        "range": r"^q_range_",
        "sessionize": r"sessionize",
        "windows": r"^q_w_",
        "reference_core": r"^q_(f|j|a|s|x|b)\d",
    }
    missing = [
        fam for fam, pat in families.items() if not any(re.search(pat, n) for n in window)
    ]
    assert missing == [], f"operator families missing from driver window: {missing}"


def test_all_queries_still_registered():
    # Reordering must not drop or duplicate entries.
    names = list(plans.queries().keys())
    assert len(names) == len(set(names))
    assert len(names) >= 129
