#!/usr/bin/env python
"""Steady-state action attribution for one registry query (guide §1).

Same monkeypatch as stream_phase_probe.py, but the query runs TWICE and
only the SECOND run is attributed — matching bench.py's methodology
(state pre-build pass, then timed steady-state runs), so one-time
`_persisted_index` builds and codegen warmup do not pollute the numbers.

Usage: python steady_phase_probe.py <query> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
from pyspark.sql.readwriter import DataFrameWriter  # noqa: E402

from updating_datasets_data_engineering_spark.registry import queries  # noqa: E402
from updating_datasets_data_engineering_spark.session import get_spark  # noqa: E402

LOG: list[tuple[str, str, float, str]] = []
ARMED = False


def _caller() -> str:
    for fr in reversed(traceback.extract_stack()):
        fn = fr.filename
        if "updating_datasets_data_engineering_spark" in fn:
            return f"{os.path.basename(fn)}:{fr.lineno}"
    return "?"


def _wrap(cls, name, label=None):
    orig = getattr(cls, name)

    def wrapped(self, *a, **kw):
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **kw)
        finally:
            if ARMED:
                dt = time.perf_counter() - t0
                tgt = ""
                if a and isinstance(a[0], str):
                    tgt = "/".join(a[0].rstrip("/").split("/")[-2:])
                LOG.append((label or name, tgt, dt, _caller()))

    setattr(cls, name, wrapped)


def main() -> None:
    global ARMED
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("steady-phase-probe")
    qs = queries()
    qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    _wrap(DataFrameWriter, "parquet", "write.parquet")
    _wrap(DataFrameWriter, "save", "write.save")
    _wrap(DataFrame, "collect")
    _wrap(DataFrame, "isEmpty")
    _wrap(DataFrame, "count")

    # untimed state-build pass (bench.py convention)
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    spark.sparkContext._jvm.System.gc()
    ARMED = True
    t0 = time.perf_counter()
    df = qs[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    ARMED = False

    print(f"query={name} steady wall={wall:.2f}s attributed={sum(r[2] for r in LOG):.2f}s")
    print(f"{'s':>7}  {'action':<14} {'caller':<22} target")
    for action, tgt, dt, caller in LOG:
        print(f"{dt:>7.2f}  {action:<14} {caller:<22} {tgt}")
    print("\nby caller:")
    agg: dict[str, list[float]] = {}
    for action, tgt, dt, caller in LOG:
        agg.setdefault(f"{action} @ {caller}", []).append(dt)
    for k, v in sorted(agg.items(), key=lambda kv: -sum(kv[1])):
        print(f"{sum(v):>8.2f}s n={len(v):>3}  {k}")


if __name__ == "__main__":
    main()
