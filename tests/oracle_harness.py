"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL on the same parquet
tables and compares row count + (sorted-column, sorted-row) values —
the same contract CORRECTNESS_r{N}.json grades.

Two hardenings added after round 8 (VERDICT r8 "What's wrong"):

* **Memory cap** — the driver's sandbox OOM'd five oracles that passed
  locally (global memory exhaustion in its DuckDB process, allocation
  failures as small as 2 KB).  ``run_oracle`` now runs every oracle
  under ``SET memory_limit`` (default 2 GB, override via
  ``SPARK_GRAFT_ORACLE_MEMLIMIT``) with a spill ``temp_directory``, so
  a memory-hungry oracle fails (or spills) locally before it fails in
  the driver.
* **Type-strict compare** — the driver's value hash is format
  sensitive: DuckDB HUGEINT reaches pandas as float64 and renders
  ``1085.0`` against Spark's ``1085`` (the r8 ``q12_priority_counts``
  red row; values were equal).  The old harness numerically coerced
  whenever either side was float, so it was *looser* than the driver.
  ``compare_frames`` now fails on any int-vs-float dtype split between
  the two sides, which is exactly the class the driver's hash rejects.
"""

from __future__ import annotations

import math
import os
import tempfile

import duckdb
import pandas as pd

from updating_datasets_data_engineering_spark.tables import TABLE_NAMES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    memlimit = os.environ.get("SPARK_GRAFT_ORACLE_MEMLIMIT", "2GB")
    con.sql(f"SET memory_limit='{memlimit}'")
    con.sql(f"SET temp_directory='{tempfile.gettempdir()}/duckdb_oracle_spill'")
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
        s_float = pd.api.types.is_float_dtype(sc)
        o_float = pd.api.types.is_float_dtype(oc)
        s_int = pd.api.types.is_integer_dtype(sc)
        o_int = pd.api.types.is_integer_dtype(oc)
        # Driver-hash strictness: an int column on one side rendering
        # against a float column on the other hashes "1085" vs "1085.0"
        # even when every value is equal (r8 q12 red row).  NaN-bearing
        # int results legitimately arrive as float64 from pandas, so
        # only flag when the float side is NaN-free (a true dtype split).
        if (s_int and o_float and not oc.isna().any()) or (
            o_int and s_float and not sc.isna().any()
        ):
            raise AssertionError(
                f"{name}: dtype split in column {c}: spark={sc.dtype} vs "
                f"oracle={oc.dtype} — the driver's value hash is format-"
                f"sensitive; CAST the integer aggregate to BIGINT on the "
                f"oracle side (or align the Spark type)"
            )
        if s_float or o_float:
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
