"""SparkSession factory tuned for this engine.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default all cores), but
every conf below is chosen for a real multi-executor cluster at ~100 TB:

  * AQE on (runtime partition coalescing, skew-join splitting) — the
    single most important knob for shuffle-heavy plans at scale.
  * ``spark.sql.shuffle.partitions`` sized explicitly; AQE coalesces
    down, so err on the high side for big clusters.
  * Arrow execution for the few pandas-UDF paths (multimodal decode),
    so Python exchange is columnar batches, not pickled rows.
  * Session timezone pinned to UTC so date extraction is deterministic
    and matches the DuckDB oracle regardless of host TZ.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "updating-datasets-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cpus), 8)
        except ValueError:
            shuffle_partitions = 32
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Let AQE optimize CACHE MATERIALIZATION too (default false):
        # a .persist() otherwise compiles its plan statically — the
        # wedge build on a persisted edge frame measured 1.8 s with
        # AQE vs 7.2 s without, and an interleaved 6-query heavy-row
        # A/B at sf0.1 ran 72.0 s (on) vs 79.5 s (off).  The price the
        # default guards against (cached output partitioning may
        # change between runs) doesn't bind here: no consumer assumes
        # a cached frame's partitioning.
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def prep_session(spark: SparkSession) -> SparkSession:
    """Pin the runtime confs every query in this engine assumes.

    Safe to call on a session we did not build (the correctness driver
    hands us one): only runtime-settable confs are touched.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # runtime-settable; see get_spark — AQE for cache builds
    spark.conf.set(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
    )
    return spark
