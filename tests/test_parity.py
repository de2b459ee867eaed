"""Driver-mirroring parity suite: every registered query vs its DuckDB oracle
at sf0.01 (the driver's t2 gate)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT
from tests.oracle import check_query


def _names():
    from opcua_ingestion_engine_spark.plans import QUERIES

    return sorted(QUERIES)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, duck, name):
    n = check_query(spark, duck, name, SF_CORRECT)
    assert n >= 0
