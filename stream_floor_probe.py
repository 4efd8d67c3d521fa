#!/usr/bin/env python
"""Quantify the availableNow micro-batch MACHINERY floor (r13 "not yet
optimized" item 1): how much of a graded streaming row is Spark's
fixed per-run / per-batch cost (file-source listing, offset+commit WAL,
micro-batch planning, the availableNow scheduler) versus the engine's
own foreachBatch maintenance work.

Method: drive the registry's own wave harness
(`_stream_waves_available_now` — the exact code path every graded
streaming row runs, including the one-file-per-wave mtime ordering and
the harness-boundary respread) over the triangle stream's wave shape
with a NO-OP foreachBatch maintainer, at 2..K waves.  The no-op run's
wall clock is pure machinery: zero engine jobs are submitted inside
the batches.  The slope over wave count is the per-micro-batch
machinery cost; the intercept is the per-run start/stop cost.  Both
are the irreducible price of the graded contract (ordered single-file
micro-batches through ONE checkpointed availableNow run) — this probe
exists so the per-query floors in OPTIMIZATION_r13.md are a measured
number, not an estimate.

Usage: python stream_floor_probe.py [sf_dir] [max_waves]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from updating_datasets_data_engineering_spark.queries.indexes import (  # noqa: E402
    _stream_waves_available_now,
)
from updating_datasets_data_engineering_spark.queries.specs import (  # noqa: E402
    load_table,
)
from updating_datasets_data_engineering_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    max_waves = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("stream-floor-probe")
    ev = load_table(spark, sf_dir, "events").select("ts", "user_id")
    # warmup: JVM, codegen, parquet reader, py4j
    ev.write.format("noop").mode("overwrite").save()

    def noop_fn(batch_df, batch_id):  # the machinery-only maintainer
        return None

    print("waves  prep_s  stream_s   (stream_s = start..awaitTermination)")
    results = []
    for n in range(2, max_waves + 1):
        # n equal-size waves by day-of-month band (shape-compatible with
        # the graded tail splits; exact content does not matter to the
        # machinery, only file count and schema)
        waves = [
            ev.where(F.pmod(F.dayofmonth("ts"), F.lit(n)) == i)
            for i in range(n)
        ]
        for rep in range(2):  # min-of-2, the bench convention
            base = tempfile.mkdtemp(prefix="graft_floor_probe_")
            src = os.path.join(base, "src")
            os.makedirs(src)
            t0 = time.perf_counter()
            # wave prep (repartition(1) source writes) happens inside
            # the harness; time it separately by pre-writing nothing —
            # the harness does prep + stream in one call, so split via
            # a second timestamp captured through a wrapper
            marks = {}

            def timed_fn(batch_df, batch_id):
                marks.setdefault("first_batch", time.perf_counter())
                return noop_fn(batch_df, batch_id)

            _stream_waves_available_now(
                spark, waves, src, os.path.join(base, "ckpt"), timed_fn
            )
            total = time.perf_counter() - t0
            results.append((n, rep, total))
            shutil.rmtree(base, ignore_errors=True)
        best = min(t for (w, _r, t) in results if w == n)
        print(f"{n:5d}  {'':6}  {best:8.2f}")
    # least-squares slope over wave count (min-of-2 per point)
    pts = {}
    for w, _r, t in results:
        pts[w] = min(pts.get(w, float("inf")), t)
    xs, ys = list(pts.keys()), list(pts.values())
    nx = len(xs)
    mx, my = sum(xs) / nx, sum(ys) / nx
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )
    print(
        f"per-extra-batch machinery ~{slope:.2f}s; "
        f"per-run fixed ~{my - slope * mx:.2f}s (incl. wave prep writes)"
    )


if __name__ == "__main__":
    main()
