"""Typed loaders for the fixture tables (TESTDATA.md).

All tables are columnar Parquet; ``spark.read.parquet`` gives Catalyst
full pushdown/pruning freedom — filters and projections land in the
scan node (check ``PushedFilters`` / ``ReadSchema`` in ``.explain``).

At 100 TB these tables would be partitioned (orders/lineitem by date,
events by day) and the loaders below would point at the partitioned
roots unchanged — partition pruning is free once predicates are
declarative.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .session import prep_session

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Timestamp normalization: the engine's contract is that every fixture
# timestamp column arrives as TimestampType (UTC session, micros).  The
# driver has shipped two parquet generations:
#   * INT64 TIMESTAMP(NANOS) — rejected by Spark's vectorized reader;
#     read nanos as long (legacy conf) and convert (truncate to micros,
#     same as DuckDB).
#   * timestamp[us] without timezone — Spark reads TIMESTAMP_NTZ, which
#     functions like unix_micros reject; cast to TIMESTAMP.  The cast
#     interprets the naive value in the session timeZone, and
#     prep_session pins UTC on ANY session (including the grading
#     driver's plain one), so the epoch value is identical to DuckDB's
#     epoch()/epoch_us() on the same naive micros.
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prep_session(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NANO_TS_COLS.get(name, ()):
        dtype = dict(df.dtypes).get(c)
        if dtype == "bigint":
            # integer `div` keeps full precision (float division would
            # lose low bits at 1e18-nano magnitudes)
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
        elif dtype == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    if os.environ.get("SPARK_GRAFT_PARALLELIZE_SCAN") and name not in (
        "region",
        "nation",
        "supplier",
    ):
        # The fixture files are single-row-group parquet, so the scan is
        # ONE task no matter how many cores exist; a real table at scale
        # is many files/row-groups and splits natively.  This opt-in
        # (bench sets it) restores that parallelism for CPU-heavy chains
        # at the cost of a tiny shuffle of the 2 MB source.
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def fan_out_if_narrow(df: DataFrame) -> DataFrame:
    """Round-robin repartition a DataFrame whose scan would serialize a
    CPU-bound chain, using the cheap ``inputFiles`` metadata probe
    (~30 ms) rather than ``rdd.getNumPartitions`` (which plans the
    whole query, ~1.5 s on a wide plan).

    Heuristic: a plan reading a handful of files yields that many scan
    tasks; a real table at scale is thousands of files/row-groups and
    splits natively, so it skips the shuffle.  Streaming frames and
    plans where Spark cannot enumerate files (joins, generated data)
    are left untouched.
    """
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        return df
    if 0 < n_files < max(target // 4, 2):
        return df.repartition(target)
    return df
