#!/usr/bin/env python
"""Drive the full driver contract locally — the repeatable form of the
round gate:

1. ``entry(spark)`` smoke at sf0.001 (rows >= 0, stable schema);
2. every ``queries()`` entry vs its ``oracle_sql()`` DuckDB string at
   the given SF: row count, pandas dtypes, and order-insensitive
   stringified values (columns sorted by name — the driver's compare);
3. prints one summary line; exits nonzero on any mismatch.

Usage::

    python scripts/verify_contract.py                 # sf0.01 (driver gate)
    python scripts/verify_contract.py /root/testdata/sf0.1   # scale check
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import duckdb

    import __spark_entry__ as E
    from opcua_ingestion_engine_spark.session import get_spark

    spark = get_spark("verify_contract")
    spark.sparkContext.setLogLevel("ERROR")

    rows = len(E.entry(spark).collect())
    print(f"entry rows: {rows}")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    oracles = E.oracle_sql()
    value_bad, dtype_bad, rowsonly = [], [], 0
    for name, fn in E.queries().items():
        sql = oracles.get(name)
        sdf = fn(spark, sf_dir).toPandas()
        if sql is None:
            rowsonly += 1
            assert len(sdf) >= 0
            continue
        odf = con.sql(sql).df()
        sd, od = sdf.dtypes.to_dict(), odf.dtypes.to_dict()
        if any(str(sd[c]) != str(od.get(c)) for c in sd):
            dtype_bad.append(name)
        cols = sorted(sdf.columns)
        s = sdf[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)
        o = odf[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)
        ok = s.shape == o.shape and all(
            (s[c].astype(str).values == o[c].astype(str).values).all()
            for c in s.columns
        )
        if not ok:
            value_bad.append(name)

    print(
        f"queries: {len(E.queries())} oracle-checked: {len(oracles)} "
        f"rows-only: {rowsonly} value-mismatch: {value_bad} "
        f"dtype-mismatch: {dtype_bad}"
    )
    return 1 if (value_bad or dtype_bad) else 0


if __name__ == "__main__":
    raise SystemExit(main())
