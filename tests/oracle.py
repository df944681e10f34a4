"""Local mirror of the driver's DuckDB-oracle comparison.

Registers the testdata parquet as DuckDB views, runs an oracle SQL and
a Spark DataFrame side by side, and compares row count + schema (column
names) + order-insensitive values.
"""

from __future__ import annotations

import datetime as _dt
import glob
import os

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if glob.glob(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm_cell(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, (_dt.datetime, pd.Timestamp)):
        return pd.Timestamp(v).tz_localize(None).isoformat() if pd.Timestamp(v).tzinfo else pd.Timestamp(v).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].dt.tz_localize(None) if getattr(df[c].dt, "tz", None) else df[c]
            df[c] = df[c].astype("datetime64[us]").astype(str)
        else:
            df[c] = df[c].map(_norm_cell)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_df, oracle_pdf: pd.DataFrame) -> None:
    got = normalize(spark_df.toPandas())
    want = normalize(oracle_pdf)
    assert list(got.columns) == list(want.columns), f"schema: {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"rowcount: {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
