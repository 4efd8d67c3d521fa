#!/usr/bin/env python
"""Dump `.explain("formatted")` text for named registry queries.

Usage: python dump_plans.py <out_dir> <suffix> <query1> [query2 ...]

Writes <out_dir>/<query>_<suffix>.txt for each query — the r13
optimization-round deliverable (plans/r13/<query>_{before,after}.txt).
Runs against $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01, the
PLANS.md convention — plan SHAPE is scale-invariant; the bench numbers
are the scale evidence).  Note the known blind spot documented in
PLANS.md: work inside foreachBatch micro-batches and behind
localCheckpoint lineage cuts does not appear in the final explain —
for streaming-graded specs the dumped plan is the SERVED view.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from updating_datasets_data_engineering_spark.plans.audit import formatted_plan  # noqa: E402
from updating_datasets_data_engineering_spark.registry import queries  # noqa: E402
from updating_datasets_data_engineering_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("updating-datasets-plan-dump")
    qs = queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        text = formatted_plan(df)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
        print(path)


if __name__ == "__main__":
    main()
