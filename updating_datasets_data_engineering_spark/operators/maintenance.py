"""Table-maintenance operators for continuously-updating archives.

Daily upserts fragment storage: each run writes small files, and after
a season the archive is thousands of kilobyte-scale files whose open/
footer costs dominate scans.  Compaction bin-packs them back to target
size.  (Table formats like Iceberg/Delta ship this as a service; the
operator here is the engine-native equivalent for plain Parquet.)
"""

from __future__ import annotations

import math
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession


def parquet_file_stats(path: str) -> tuple[int, int]:
    """(file_count, total_bytes) of a parquet directory."""
    n = total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact(
    spark: SparkSession, path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> tuple[int, int]:
    """Rewrite a fragmented parquet directory into ~target-size files.

    Returns (files_before, files_after).  Stage-and-swap keeps readers
    working until the atomic move; file count is computed from actual
    bytes, so compaction is idempotent and size-aware (not a blind
    coalesce(1)).
    """
    files_before, total_bytes = parquet_file_stats(path)
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))
    df = spark.read.parquet(path)
    staging = tempfile.mkdtemp(prefix="compact_stage_")
    df.repartition(n_files).write.mode("overwrite").parquet(staging)
    spark.read.parquet(staging).count()  # materialize before swap
    shutil.rmtree(path)
    shutil.move(staging, path)
    files_after, _ = parquet_file_stats(path)
    return files_before, files_after
