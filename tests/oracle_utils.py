"""Local mirror of the driver's DuckDB differential oracle.

Compares a Spark result and a DuckDB result the way the driver does:
row count, column names, and an order-insensitive value comparison with
columns sorted by name. Used by tests/test_oracle_parity.py so parity
breaks locally before they break in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from big_data_trend_analysis_spark.sources.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[col]):
            df[col] = df[col].astype("datetime64[us]").astype(str)
        elif df[col].dtype == object:
            df[col] = df[col].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: columns {sorted(spark_pdf.columns)} != {sorted(oracle_pdf.columns)}"
    )
    left = _canonical(spark_pdf)
    right = _canonical(oracle_pdf)
    for col in left.columns:
        lv, rv = left[col], right[col]
        if pd.api.types.is_float_dtype(lv) or pd.api.types.is_float_dtype(rv):
            bad = [
                (i, a, b)
                for i, (a, b) in enumerate(zip(lv.astype(float), rv.astype(float)))
                if not (
                    (math.isnan(a) and math.isnan(b)) or a == b
                )
            ]
        else:
            bad = [
                (i, a, b) for i, (a, b) in enumerate(zip(lv, rv)) if str(a) != str(b)
            ]
        assert not bad, f"{name}.{col}: {len(bad)} mismatches, first 5: {bad[:5]}"
