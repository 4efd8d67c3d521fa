#!/usr/bin/env python
"""Per-Spark-job cost breakdown for one registry query (guide §1/§7.1).

With the UI disabled the AppStatusStore still records every job's
callsite name and submission/completion times; grouping job durations
by callsite shows where a streaming query's wall-clock goes (writes vs
isEmpty probes vs collect watermarks vs the maintenance computation)
without touching engine code.

Usage: python stream_job_probe.py <query> [sf_dir]
Prints total wall, per-job table (duration, gap-before, callsite), and
a by-callsite rollup.  Gap-before = idle driver time between the
previous job's completion and this job's submission — scheduling and
driver-side work (planning, py4j, file listing) lives in the gaps.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from updating_datasets_data_engineering_spark.registry import queries  # noqa: E402
from updating_datasets_data_engineering_spark.session import get_spark  # noqa: E402


def jobs_snapshot(spark):
    store = spark.sparkContext._jsc.sc().statusStore()
    out = []
    seq = store.jobsList(None)
    for i in range(seq.size()):
        j = seq.apply(i)
        sub = j.submissionTime()
        comp = j.completionTime()
        out.append(
            {
                "id": j.jobId(),
                "name": j.name(),
                "sub": sub.get().getTime() / 1000.0 if sub.isDefined() else None,
                "comp": comp.get().getTime() / 1000.0 if comp.isDefined() else None,
            }
        )
    return sorted(out, key=lambda d: d["id"])


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("stream-job-probe")
    qs = queries()
    # warmup (JVM/codegen/session init) with an unrelated cheap query
    qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    before_ids = {j["id"] for j in jobs_snapshot(spark)}
    t0 = time.perf_counter()
    df = qs[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    jobs = [j for j in jobs_snapshot(spark) if j["id"] not in before_ids]
    print(f"query={name} wall={wall:.2f}s n_jobs={len(jobs)}")
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
