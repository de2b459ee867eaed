"""Local mirror of the driver's DuckDB-oracle comparison: row count + schema
+ order-insensitive value comparison (columns sorted by name)."""

from __future__ import annotations

import math

import pandas as pd


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v,
                na_action="ignore",
            )
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, duck_rel, float_ulp_exact: bool = True) -> None:
    """Raise AssertionError with a diff summary if results differ."""
    sp = _normalize(spark_df.toPandas())
    dk = _normalize(duck_rel.df())
    assert list(sp.columns) == list(dk.columns), f"columns: {list(sp.columns)} vs {list(dk.columns)}"
    assert len(sp) == len(dk), f"row count: spark={len(sp)} duckdb={len(dk)}"
    for c in sp.columns:
        a, b = sp[c], dk[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            af = a.astype(float).to_numpy()
            bf = b.astype(float).to_numpy()
            for i, (x, y) in enumerate(zip(af, bf)):
                if math.isnan(x) and math.isnan(y):
                    continue
                if x != y:
                    raise AssertionError(
                        f"col {c} row {i}: spark={x!r} duckdb={y!r} (diff={x - y!r})\n"
                        f"spark row: {sp.iloc[i].to_dict()}\nduck row: {dk.iloc[i].to_dict()}"
                    )
        else:
            neq = a.fillna("\0NULL").ne(b.fillna("\0NULL"))
            if neq.any():
                i = int(neq.idxmax())
                raise AssertionError(
                    f"col {c} row {i}: spark={a[i]!r} duckdb={b[i]!r}\n"
                    f"spark row: {sp.iloc[i].to_dict()}\nduck row: {dk.iloc[i].to_dict()}"
                )


def check_query(spark, duck, name: str, sf_dir: str) -> int:
    from opcua_ingestion_engine_spark.plans import QUERIES

    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    if q.oracle is None:
        n = sdf.count()
        assert n >= 0
        return n
    rel = duck.sql(q.oracle)
    compare(sdf, rel)
    return len(rel.df())
