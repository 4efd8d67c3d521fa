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


def test_orc_archive_roundtrip_and_dynamic_overwrite(spark, sf_dir, tmp_path):
    """ORC write/read parity + dynamic partition overwrite touches only
    the written partition (same contract as the parquet archive)."""
    df = _enriched(spark, sf_dir)
    path = str(tmp_path / "archive_orc")
    sinks.write_orc_archive(df, path, partition_by=("quarter",))
    back = sinks.read_orc_archive(spark, path)
    assert back.count() == df.count()
    assert any(d.startswith("quarter=") for d in os.listdir(path))

    from pyspark.sql import functions as F

    one_q = back.select("quarter").where(F.col("quarter").isNotNull()).first()[0]
    before_other = back.where(F.col("quarter") != one_q).count()
    patch = df.where(F.col("quarter") == one_q).limit(5)
    sinks.write_orc_archive(patch, path, partition_by=("quarter",))
    after = sinks.read_orc_archive(spark, path)
    # untouched partitions intact; the overwritten one now holds 5 rows
    assert after.where(F.col("quarter") != one_q).count() == before_other
    assert after.where(F.col("quarter") == one_q).count() == 5


def test_jsonl_roundtrip_schema_given(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").limit(200)
    path = str(tmp_path / "docs_jsonl")
    sinks.write_jsonl_delta(docs, path)
    back = sinks.read_jsonl_delta(spark, path, schema=docs.schema)
    assert back.schema == docs.schema
    assert sorted(r.doc_id for r in back.select("doc_id").collect()) == sorted(
        r.doc_id for r in docs.select("doc_id").collect()
    )


def test_parquet_merged_schema_evolution(spark, sf_dir, tmp_path):
    """A later writer adds a column; mergeSchema surfaces it with nulls
    for the older files."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    path = str(tmp_path / "evolved")
    docs.limit(50).write.parquet(path)
    docs.limit(30).withColumn("quality", F.lit(0.5)).write.mode("append").parquet(path)
    back = sinks.read_parquet_merged_schema(spark, path)
    assert "quality" in back.columns
    assert back.count() == 80
    assert back.where(F.col("quality").isNull()).count() == 50


def test_jsonl_corrupt_record_handling(spark, tmp_path):
    """Operational contract for JSONL shards with broken lines:
    PERMISSIVE surfaces them in _corrupt_record (audit path),
    DROPMALFORMED silently excludes them (ingest path) — both with the
    schema given, so neither pays an inference pass."""
    import pyspark.sql.types as T

    src = tmp_path / "shards"
    src.mkdir()
    (src / "part-0.json").write_text(
        '{"doc_id": 1, "text": "ok"}\n'
        "{broken json line\n"
        '{"doc_id": 2, "text": "also ok"}\n'
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    permissive = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .json(str(src))
        .cache()  # required: referencing _corrupt_record alone is disallowed on the lazy plan
    )
    assert permissive.count() == 3
    bad = permissive.where(permissive["_corrupt_record"].isNotNull())
    assert bad.count() == 1
    assert "{broken" in bad.first()["_corrupt_record"]
    permissive.unpersist()

    dropped = (
        spark.read.schema("doc_id long, text string")
        .option("mode", "DROPMALFORMED")
        .json(str(src))
    )
    assert sorted(r.doc_id for r in dropped.collect()) == [1, 2]
