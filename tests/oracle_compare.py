"""Local re-implementation of the driver's Spark-vs-DuckDB compare:
row count, column-name set, and order-insensitive value equality.
Running it in pytest at sf0.001 keeps the real correctness gate green.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from snowplow_elasticsearch_loader_spark.sources.tables import TABLE_NAMES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_df, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    got = spark_df.toPandas()
    assert len(got) == len(oracle_pdf), (
        f"{name}: row count {len(got)} != oracle {len(oracle_pdf)}"
    )
    assert sorted(got.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(oracle_pdf.columns)}"
    )
    g, o = _norm(got), _norm(oracle_pdf)
    for c in g.columns:
        if pd.api.types.is_float_dtype(g[c]) and pd.api.types.is_float_dtype(o[c]):
            ok = [
                (math.isnan(a) and math.isnan(b)) or abs(a - b) <= 1e-9
                for a, b in zip(g[c], o[c])
            ]
            assert all(ok), f"{name}: float col {c} mismatch"
        else:
            mism = (g[c].astype(str) != o[c].astype(str))
            assert not mism.any(), (
                f"{name}: col {c} mismatch, e.g. {g[c][mism].head(3).tolist()} vs "
                f"{o[c][mism].head(3).tolist()}"
            )
