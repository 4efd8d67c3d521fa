"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet
tables and compares row count + (sorted-column, sorted-row) values —
the same contract CORRECTNESS_r{N}.json grades.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from updating_datasets_data_engineering_spark.tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None or (isinstance(v, float) and math.isnan(v)) else v)
    key = df.astype(str)
    order = key.sort_values(by=list(key.columns), kind="mergesort").index
    return df.loc[order].reset_index(drop=True)


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str = "") -> None:
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count mismatch spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
    )
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    s = _normalize(spark_pdf)
    o = _normalize(oracle_pdf)
    for c in s.columns:
        sc, oc = s[c], o[c]
        if pd.api.types.is_float_dtype(sc) or pd.api.types.is_float_dtype(oc):
            sc = pd.to_numeric(sc, errors="coerce")
            oc = pd.to_numeric(oc, errors="coerce")
            bad = ~((sc.isna() & oc.isna()) | (sc == oc))
            assert not bad.any(), (
                f"{name}: value mismatch in float column {c}: "
                f"{list(zip(sc[bad].head(5), oc[bad].head(5)))}"
            )
        else:
            sc = sc.astype(str)
            oc = oc.astype(str)
            bad = sc != oc
            assert not bad.any(), (
                f"{name}: value mismatch in column {c}: "
                f"{list(zip(sc[bad].head(5), oc[bad].head(5)))}"
            )
