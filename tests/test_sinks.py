"""Sink round-trips: partitioned parquet, single-file CSV, tgz parity."""

from __future__ import annotations

import os

from updating_datasets_data_engineering_spark import sinks
from updating_datasets_data_engineering_spark.functions import play_parser  # noqa: F401
from updating_datasets_data_engineering_spark.operators import ingest as I
from updating_datasets_data_engineering_spark.sources import shot_synth as SS
from updating_datasets_data_engineering_spark.tables import load_table


def _enriched(spark, sf_dir):
    return I.ingest_pipeline(SS.synth_kafka_records(load_table(spark, sf_dir, "events")))


def test_partitioned_archive_roundtrip(spark, sf_dir, tmp_path):
    df = _enriched(spark, sf_dir)
    path = str(tmp_path / "archive_parq")
    sinks.write_partitioned_archive(df, path, partition_by=("quarter",))
    back = spark.read.parquet(path)
    assert back.count() == df.count()
    # partition dirs exist -> partition pruning is available to scans
    assert any(d.startswith("quarter=") for d in os.listdir(path))


def test_single_csv_export(spark, sf_dir, tmp_path):
    df = _enriched(spark, sf_dir).limit(100)
    out = sinks.export_single_csv(df, str(tmp_path / "out" / "shots.csv"))
    assert os.path.isfile(out)
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == 100
    assert set(back.columns) == set(df.columns)


def test_season_tgz_parity_roundtrip(spark, sf_dir, tmp_path):
    df = _enriched(spark, sf_dir).limit(50)
    tgz = sinks.export_season_tgz(df, str(tmp_path / "shots-2025.tgz"))
    back = sinks.read_season_tgz(spark, tgz)
    assert back.count() == 50
    assert set(back.columns) == set(df.columns)
