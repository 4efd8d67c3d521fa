#!/usr/bin/env python
"""Steady-state per-job breakdown for one registry query: the query
runs once untimed (state build), then the SECOND run's jobs are listed
from the AppStatusStore (stream_job_probe.py's view, bench-aligned).

Usage: python steady_job_probe.py <query> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from updating_datasets_data_engineering_spark.registry import queries  # noqa: E402
from updating_datasets_data_engineering_spark.session import get_spark  # noqa: E402

from stream_job_probe import jobs_snapshot  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("steady-job-probe")
    qs = queries()
    qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # untimed state-build pass
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.sparkContext._jvm.System.gc()
    before_ids = {j["id"] for j in jobs_snapshot(spark)}
    t0 = time.perf_counter()
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    jobs = [j for j in jobs_snapshot(spark) if j["id"] not in before_ids]
    print(f"query={name} steady wall={wall:.2f}s n_jobs={len(jobs)}")
    rollup: dict[str, list[float]] = {}
    prev_comp = None
    total_job = total_gap = 0.0
    print(f"{'id':>5} {'dur_s':>7} {'gap_s':>7}  callsite")
    for j in jobs:
        dur = (j["comp"] - j["sub"]) if j["comp"] and j["sub"] else 0.0
        gap = (j["sub"] - prev_comp) if (prev_comp and j["sub"]) else 0.0
        prev_comp = j["comp"] or prev_comp
        total_job += dur
        total_gap += max(gap, 0.0)
        key = j["name"].split("\n")[0][:60]
        rollup.setdefault(key, []).append(dur)
        print(f"{j['id']:>5} {dur:>7.2f} {gap:>7.2f}  {key}")
    print(f"\nsum(job)={total_job:.2f}s sum(gap)={total_gap:.2f}s wall={wall:.2f}s")
    print("\nby callsite:")
    for k, v in sorted(rollup.items(), key=lambda kv: -sum(kv[1])):
        print(f"{sum(v):>8.2f}s  n={len(v):>3}  {k}")


if __name__ == "__main__":
    main()
