"""Bench the triangle maintainer's two edge-state disciplines on a
genuinely MULTI-MONTH corpus (VERDICT r12 item 1: the epoch mode was
correctness-pinned but had no bench evidence on the corpus shape it
exists for — the graded fixture is single-month, where global wins by
measurement).

Fixture: the sf0.1 events table (100k rows, one calendar month)
split into N equal slices (``event_id % N``), slice i shifted by
i months (``ts + INTERVAL i MONTH`` — keeps time-of-day, clamps
day 29/30 into short months), same user ids — so pairs recur across
months and the lift carries genuine cross-epoch terms.  Total volume
stays sf0.1-equivalent; arrival is time-ordered, one wave per month —
the shape a daily/weekly ingest has at 100 TB.

Each mode streams the N waves as direct foreachBatch calls (the
compaction-probe convention: maintainer cost without the availableNow
scheduler) against fresh state; per-batch wall time is printed so the
claim under test is visible in the row itself: epoch-mode per-batch
cost should TRACK THE ARRIVAL EPOCH (flat once months stop growing the
touched slice) while global-mode cost grows with total history.  The
``auto`` row shows the dispatcher following global early and switching
at ``epoch_min_months``.

``batches_per_month`` > 1 is the cadence knob: the month-tier store is
bounded by CALENDAR MONTHS while the shared additive pair store grows
one layer per MICRO-BATCH, so the two disciplines only diverge when
batches outnumber months (daily cadence over years at 100 TB; the
compaction maintenance op closes the same gap out-of-band).

Usage: python triangle_mode_probe.py [sf_dir] [n_months] [batches_per_month]
Prints one JSON line per mode; numbers land in COVERAGE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_months = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    bpm = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from updating_datasets_data_engineering_spark.session import get_spark
    from updating_datasets_data_engineering_spark.streaming import pipeline as SP
    from updating_datasets_data_engineering_spark.tables import load_table

    spark = get_spark("triangle-mode-probe")
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")

    work = tempfile.mkdtemp(prefix="tri_mode_probe_")
    waves_dir = os.path.join(work, "waves")
    n_batches = n_months * bpm
    for i in range(n_months):
        for j in range(bpm):
            (
                ev.where(
                    (F.col("event_id") % n_months == i)
                    & ((F.col("event_id") / n_months).cast("long") % bpm == j)
                )
                .select(
                    (F.col("ts") + F.expr(f"INTERVAL '{i}' MONTH")).alias("ts"),
                    "user_id",
                )
                .write.mode("overwrite")
                .parquet(os.path.join(waves_dir, f"b{i * bpm + j}"))
            )

    try:
        for mode in ("global", "epoch", "auto"):
            base = os.path.join(work, f"state_{mode}")
            paths = {
                k: os.path.join(base, k)
                for k in ("active", "pairs", "occ", "edges_snap", "tri")
            }
            fn = SP.maintain_triangles_each_batch(
                paths["active"], paths["pairs"], paths["occ"],
                paths["edges_snap"], paths["tri"], mode=mode,
            )
            per_batch = []
            for i in range(n_batches):
                b = spark.read.parquet(os.path.join(waves_dir, f"b{i}"))
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                fn(b, i)
                per_batch.append(round(time.perf_counter() - t0, 2))
            tri = SP.serve_triangles(
                spark, paths["tri"], paths["pairs"], paths["occ"]
            )
            checksum = tri.agg(
                F.sum("triangles").cast("long").alias("t"),
                F.count(F.lit(1)).cast("long").alias("n"),
            ).collect()[0]
            print(
                json.dumps(
                    {
                        "probe": "triangle_mode_multimonth",
                        "sf_dir": sf_dir,
                        "n_months": n_months,
                        "batches_per_month": bpm,
                        "mode": mode,
                        "per_batch_s": per_batch,
                        "total_s": round(sum(per_batch), 2),
                        "served_nodes": checksum["n"],
                        "served_triangles_sum": checksum["t"],
                    }
                ),
                flush=True,
            )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
