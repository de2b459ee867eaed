"""Plan-audit invariants as a regression gate (SURVEY.md §6): for EVERY
registered query, the physical plan must contain

- zero CartesianProduct, ever;
- BroadcastNestedLoopJoin only where a 1-row scalar threshold rides a
  broadcast (flagship/liveness logical-now, heartbeat now, default-row
  injection, TPC-H Q11/Q22 thresholds, capped embedding slice);
- SortMergeJoin only for full-outer joins and the O(state)-sized anti
  joins AQE broadcast-converts at runtime (Venn reconcile, S10 seed,
  E7 near-dup removal);
- each base table scanned at most once, except the documented
  same-table-slices queries (as-of/range event-type slices, LSH
  query-vs-corpus, nation in two dimension roles, per-column profile
  union, scalar-threshold re-scan of a dimension).

A new query that silently introduces a cartesian product, an extra fact
scan, or an unplanned sort-merge join fails here before it ever reaches
a cluster.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE

TABLES = (
    "lineitem", "orders", "customer", "events", "documents",
    "embeddings", "part", "supplier", "nation", "region",
)

# query -> (max BroadcastNestedLoopJoin, max SortMergeJoin,
#           {table: max scans}); unlisted queries get (0, 0, {}) and a
# global max of ONE scan per table.
ALLOW: dict[str, tuple[int, int, dict[str, int]]] = {
    "q_a3_device_liveness": (1, 0, {}),
    "q_asof_join_purchase_view": (0, 0, {"events": 2}),
    "q_e2_embedding_neardup": (1, 0, {"embeddings": 2}),
    "q_e2_embedding_neardup_lsh": (0, 0, {"embeddings": 2}),
    "q_e2_minhash_neardup": (0, 0, {"documents": 2}),
    "q_e3_ivf_ann": (0, 0, {"embeddings": 2}),
    "q_e3_lsh_ann": (0, 0, {"embeddings": 2}),
    "q_e7_curation_clustered": (0, 2, {}),
    "q_e7_curation_pipeline": (0, 1, {}),
    "q_f8_online_probe": (1, 0, {}),
    "q_flagship_modvalues": (1, 0, {}),
    "q_j5_venn_reconcile": (0, 1, {}),
    "q_join_full_nation_supplier": (0, 1, {}),
    "q_profile_lineitem": (0, 0, {"lineitem": 2}),
    "q_range_join_purchase_errors": (0, 0, {"events": 2}),
    "q_s10_insert_if_missing": (0, 1, {}),
    "q_s8_default_injection": (1, 0, {}),
    "q_t3_heartbeat_refresh": (2, 0, {}),
    "q_t4_server_watchdog_batch": (1, 0, {}),
    "q_tpch_q11_important_stock": (1, 0, {}),
    "q_tpch_q15_top_supplier": (1, 0, {}),
    "q_tpch_q22_sales_opportunity": (1, 0, {"customer": 2}),
    "q_tpch_q7_volume_shipping": (0, 0, {"nation": 2}),
    "q_tpch_q8_market_share": (0, 0, {"nation": 2}),
}


def _names():
    from opcua_ingestion_engine_spark.plans import QUERIES

    return sorted(QUERIES)


@pytest.mark.parametrize("name", _names())
def test_plan_invariants(spark, name):
    from opcua_ingestion_engine_spark.plans import QUERIES

    df = QUERIES[name].fn(spark, SF_SMOKE)
    p = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    max_bnlj, max_smj, scan_allow = ALLOW.get(name, (0, 0, {}))
    assert p.count("CartesianProduct") == 0, f"{name}: cartesian product\n{p}"
    assert p.count("BroadcastNestedLoopJoin") <= max_bnlj, (
        f"{name}: unexpected BroadcastNestedLoopJoin\n{p}"
    )
    assert p.count("SortMergeJoin") <= max_smj, (
        f"{name}: unexpected SortMergeJoin\n{p}"
    )
    for t in TABLES:
        n = p.count(f"/{t}.parquet")
        assert n <= scan_allow.get(t, 1), (
            f"{name}: {t} scanned {n}x (allowed {scan_allow.get(t, 1)})\n{p}"
        )
