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
        # canChangeCachedPlanOutputPartitioning stays at Spark's
        # default (false) since r13: the r12 session-wide adoption was
        # confounded with the simultaneous broadcast pins and
        # single-consumer persist drops, and the isolated interleaved
        # A/Bs (ab_probe_aqecache.py, COVERAGE.md) measured the
        # config's MARGINAL effect as ±0.25 s at sf1 on the five
        # BENCH_SF1 drift rows (the drifts were ambient load) and
        # neutral-to-harmful at sf0.1 on its own former evidence rows
        # — up to +3.0 s on users_triangles_streaming, where
        # AQE-coalesced cache builds fight the explicit hour
        # repartition pins.  The 1.8-vs-7.2 s wedge-build quirk the
        # config once addressed is fixed in code (no single-consumer
        # persists on that path), not config.
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
    # canChangeCachedPlanOutputPartitioning deliberately NOT set — see
    # get_spark: the r13 isolated A/Bs measured it neutral-to-harmful
    # with the broadcast/repartition pins in place
    return spark
