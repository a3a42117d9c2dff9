"""Oracle-differential comparison helper, replicating the driver's check:
row count + schema (column names) + order-insensitive value equality.

Mirrors SURVEY.md §3 EP3 (two engines validating each other over the
same parquet substrate): our Spark result vs DuckDB running the
registered oracle SQL on the same files.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from local_datalakehouse_phase2_spark.sources.loaders import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.map(lambda v: _norm_value(v))
    # order-insensitive: sort rows by all columns
    if len(df.columns) and len(df):
        df = df.sort_values(by=list(df.columns), na_position="last", kind="stable")
    return df.reset_index(drop=True)


def _norm_value(v: Any) -> Any:
    # ndarray cells (Spark array columns via toPandas) break pandas
    # sort_values; stringify sequence cells the way the driver's value
    # hash does (str() over normalized elements)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return str(tuple(_norm_value(x) for x in v))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    got = _normalize(spark_df.toPandas())
    exp = _normalize(con.execute(sql).df())
    assert list(got.columns) == list(exp.columns), f"columns: {list(got.columns)} != {list(exp.columns)}"
    assert len(got) == len(exp), f"row count: {len(got)} != {len(exp)}"
    for c in got.columns:
        g, e = got[c], exp[c]
        # dtype-class mismatch (e.g. Spark BIGINT vs DuckDB HUGEINT→float)
        # would change the driver's stringified value hash — fail loudly.
        assert pd.api.types.is_float_dtype(g) == pd.api.types.is_float_dtype(e), (
            f"col {c}: dtype class mismatch {g.dtype} vs {e.dtype}"
        )
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(e):
            for i, (a, b) in enumerate(zip(g.astype(float), e.astype(float))):
                ok = (math.isnan(a) and math.isnan(b)) or a == b
                assert ok, f"col {c} row {i}: {a!r} != {b!r}"
        else:
            mism = (g.astype(str) != e.astype(str))
            assert not mism.any(), (
                f"col {c}: {int(mism.sum())} mismatches, first at row {int(mism.idxmax())}: "
                f"{g[mism].iloc[0]!r} != {e[mism].iloc[0]!r}"
            )
