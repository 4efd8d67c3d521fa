"""Job entry points mirroring the reference's two spark-submit scripts,
so a reference user can run the same daily cycle against local/object
storage with one engine and no driver-side data movement.

  * :func:`run_processing_job` — the `spark_processing.py` shape
    (reference: scripts/spark_processing.py:266-285): records source ->
    parse -> enrich -> delta sink.  Input is any records DataFrame
    (Kafka batch/stream or files); output is Parquet, with the
    reference's headerful-CSV delta available via sinks.write_csv_delta.
  * :func:`run_merge_job` — the `spark_merge_dfs.py <season>` shape
    (reference: scripts/spark_merge_dfs.py:131-160): archive ∪ delta ->
    upsert -> archive′, expressed as one Spark plan (the reference
    round-trips the whole archive through driver memory and repacks a
    tarball, scripts/spark_merge_dfs.py:56-121).

Both are thin compositions of the tested operators — the CLI wrapper
(`python -m updating_datasets_data_engineering_spark.jobs ...`) exists for drop-in
spark-submit parity.
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import fs, sinks
from .operators import ingest as I
from .operators import merge as M


def run_processing_job(records: DataFrame, delta_path: str, csv_parity: bool = False) -> None:
    enriched = I.ingest_pipeline(records)
    if csv_parity:
        sinks.write_csv_delta(enriched, delta_path)
    else:
        enriched.write.mode("overwrite").parquet(delta_path)


def run_merge_job(
    spark: SparkSession,
    archive_path: str,
    delta_path: str,
    out_path: str,
    key=M.SHOT_KEY,
    partition_by: tuple[str, ...] = ("game_date",),
    export_tgz: str | None = None,
) -> None:
    """archive ∪ delta -> out_path, partitioned for pruning.

    * Layout defaults to ``game_date`` partitions (SURVEY §1.4): a date
      predicate prunes the scan to one directory, and each daily merge
      rewrites only touched partitions via dynamic partition overwrite.
      (Round-1 hard-coded ``quarter`` — 4 giant partitions at scale and
      broken for non-shot schemas; ADVICE item 5.)  ``game_date`` is
      derived from year/month/day if the delta carries the reference's
      string columns but no typed date yet.
    * ``out_path == archive_path`` (the natural in-place daily cycle)
      is handled by stage-and-swap through the Hadoop FS API instead of
      failing with Spark's cannot-overwrite-path-being-read error.
    * Archive detection is recursive and path-agnostic (a partitioned
      archive on any filesystem is seen, then merged — not replaced).
    """
    delta = spark.read.parquet(delta_path)
    fs.recover_swap(spark, archive_path)
    if fs.has_parquet(spark, archive_path):
        archive = spark.read.parquet(archive_path)
        merged = M.merge_anti_join(archive, delta, key=list(key))
    else:
        merged = delta.dropDuplicates(list(key))
    if "game_date" in partition_by and "game_date" not in merged.columns:
        merged = merged.withColumn(
            "game_date",
            F.to_date(
                F.concat_ws("-", F.col("year"), F.lpad("month", 2, "0"), F.lpad("day", 2, "0"))
            ),
        )
    missing = [c for c in partition_by if c not in merged.columns]
    if missing:
        raise ValueError(f"partition columns {missing} not in merged schema")
    if out_path == archive_path:
        staging = fs.staging_path(out_path)
        fs.delete(spark, staging)
        sinks.write_partitioned_archive(merged, staging, partition_by=partition_by)
        # the write action above already materialized the staging files —
        # no read-back pass before the swap (the _swap_in discipline)
        fs.swap_directory(spark, staging, out_path)
    else:
        sinks.write_partitioned_archive(merged, out_path, partition_by=partition_by)
    if export_tgz:
        # archive-format parity export (the reference's shots-{season}.tgz)
        sinks.export_season_tgz(spark.read.parquet(out_path), export_tgz)


def main() -> None:
    ap = argparse.ArgumentParser(description="updating-datasets engine jobs")
    sub = ap.add_subparsers(dest="job", required=True)

    p = sub.add_parser("process", help="records -> enriched delta")
    p.add_argument("--records-json-dir", required=True, help="dir of text files, one JSON value per line")
    p.add_argument("--delta-path", required=True)
    p.add_argument("--csv", action="store_true", help="reference-parity CSV delta")

    m = sub.add_parser("merge", help="archive ∪ delta -> archive'")
    m.add_argument("--archive-path", required=True)
    m.add_argument("--delta-path", required=True)
    m.add_argument("--out-path", required=True)
    m.add_argument("--export-tgz", default=None)

    args = ap.parse_args()
    from .session import get_spark

    spark = get_spark("updating-datasets-job")
    if args.job == "process":
        records = spark.read.text(args.records_json_dir)
        run_processing_job(records, args.delta_path, csv_parity=args.csv)
    else:
        run_merge_job(
            spark, args.archive_path, args.delta_path, args.out_path, export_tgz=args.export_tgz
        )


if __name__ == "__main__":
    main()
