"""Scale-layout properties: partition pruning and AQE runtime behavior
must be observable on plans, not just claimed."""

from __future__ import annotations

from pyspark.sql import functions as F

from updating_datasets_data_engineering_spark.plans.audit import formatted_plan
from updating_datasets_data_engineering_spark.sinks import write_partitioned_archive
from updating_datasets_data_engineering_spark.tables import load_table


def test_partition_pruning_on_date_layout(spark, sf_dir, tmp_path):
    """The 100 TB layout: events partitioned by day — a day predicate
    must prune to PartitionFilters (scan touches one directory)."""
    events = load_table(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    path = str(tmp_path / "events_by_day")
    write_partitioned_archive(events, path, partition_by=("event_date",))

    df = spark.read.parquet(path).where(F.col("event_date") == "2024-01-01")
    text = formatted_plan(df)
    assert "PartitionFilters" in text
    assert "event_date" in text.split("PartitionFilters", 1)[1].split("]", 1)[0]
    assert df.count() > 0

    # pruned scan reads strictly fewer files than the full scan
    full = spark.read.parquet(path)
    n_days = full.select("event_date").distinct().count()
    assert n_days > 1  # layout actually split by day


def test_aqe_coalesces_shuffle_partitions(spark, sf_dir):
    """AQE must shrink the 5-group aggregate's shuffle to far fewer
    partitions than spark.sql.shuffle.partitions at runtime."""
    events = load_table(spark, sf_dir, "events")
    df = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    df.collect()  # execute so AQE finalizes the plan
    text = formatted_plan(df)
    assert "AdaptiveSparkPlan" in text
    assert "isFinalPlan=true" in text
    assert "AQEShuffleRead" in text  # runtime-coalesced shuffle read
