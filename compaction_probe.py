"""Measure BM25 state compaction at sf1 (VERDICT r9 item 6).

At daily cadence the streaming BM25 maintainer appends one partition
per micro-batch to the additive df/stat partial stores and the
row-preserving postings/doclen stores; consumers SUM (or union) across
partitions filtered by ``_batch_id``.  This probe streams the sf1
corpus through ``maintain_bm25_index_each_batch`` as N direct
foreachBatch calls (the per-batch maintenance work itself, minus the
availableNow scheduler), then measures — before and after the
between-runs compaction pass — the state's file count / bytes and the
reader's per-probe cost (the merged-df top-NQ pick + the stats sum,
i.e. exactly what every later micro-batch pays to refresh the served
ranking), plus the compaction runs themselves.

Usage: python compaction_probe.py [sf_dir] [n_batches]
Prints one JSON line; numbers land in COVERAGE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def _probe_reader(spark, df_path, stats_path, nq=8, reps=3):
    """min-of-reps wall time of the state read every micro-batch pays:
    fold the df partials to one row per term, pick the top-NQ terms,
    and fold the corpus stats."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        merged = (
            spark.read.parquet(df_path)
            .groupBy("term")
            .agg(F.sum("df").cast("long").alias("df"))
        )
        merged.orderBy(F.col("df").desc(), "term").limit(nq).collect()
        (
            spark.read.parquet(stats_path)
            .agg(F.sum("n").cast("long"), F.sum("sumdl").cast("long"))
            .collect()
        )
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from updating_datasets_data_engineering_spark.operators import maintenance as MNT
    from updating_datasets_data_engineering_spark.session import get_spark
    from updating_datasets_data_engineering_spark.streaming import pipeline as SP
    from updating_datasets_data_engineering_spark.tables import load_table

    spark = get_spark("compaction-probe")
    base = tempfile.mkdtemp(prefix="compaction_probe_")
    paths = {
        k: os.path.join(base, k)
        for k in ("postings", "doclen", "df", "stats", "ranking")
    }
    fn = SP.maintain_bm25_index_each_batch(
        paths["postings"], paths["doclen"], paths["df"], paths["stats"],
        paths["ranking"],
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = docs.persist()
    n_docs = docs.count()

    t0 = time.time()
    for i in range(n_batches):
        fn(docs.where(F.col("doc_id") % n_batches == i), i)
    stream_s = round(time.time() - t0, 1)

    def stats_of(key):
        files, bytes_ = MNT.parquet_file_stats(spark, paths[key])
        return {"files": files, "mb": round(bytes_ / 1e6, 2)}

    before = {k: stats_of(k) for k in ("postings", "doclen", "df", "stats")}
    probe_before = _probe_reader(spark, paths["df"], paths["stats"])

    t0 = time.time()
    MNT.compact_additive_partials(spark, paths["df"], ["term"], ["df"])
    MNT.compact_additive_partials(spark, paths["stats"], [], ["n", "sumdl"])
    t_additive = round(time.time() - t0, 2)
    t0 = time.time()
    MNT.compact_batch_index(spark, paths["postings"])
    MNT.compact_batch_index(spark, paths["doclen"])
    t_batchidx = round(time.time() - t0, 2)

    after = {k: stats_of(k) for k in ("postings", "doclen", "df", "stats")}
    probe_after = _probe_reader(spark, paths["df"], paths["stats"])

    # one more batch on top of compacted state: per-batch cost stays flat
    extra = docs.where(F.col("doc_id") % n_batches == 0).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"), "text"
    )
    t0 = time.time()
    fn(extra, n_batches)
    post_compact_batch_s = round(time.time() - t0, 2)

    print(json.dumps({
        "sf_dir": sf_dir, "n_docs": n_docs, "n_batches": n_batches,
        "stream_total_s": stream_s,
        "state_before": before, "state_after": after,
        "reader_probe_before_s": probe_before,
        "reader_probe_after_s": probe_after,
        "compact_additive_s": t_additive,
        "compact_batch_index_s": t_batchidx,
        "post_compact_batch_s": post_compact_batch_s,
    }))
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
