"""Same-session interleaved A/B of the r13 parallel-store-writes
change (``streaming/pipeline._parallel_store_writes``, guide §2.6):
the helper re-reads ``SPARK_GRAFT_SERIAL_WRITES`` on every call, so the
serial and parallel arms interleave inside ONE session — the repo's
drift protocol (ambient load hits both arms equally; min-of-N per arm;
floor probes bracketing each block).

Note the serial arm still carries the r13 ``_swap_in`` single-execution
fix (not runtime-togglable); that change's evidence is structural —
the phase probe's ``isEmpty @ pipeline.py`` rows disappear and each
swap costs one job instead of three (stream_phase_probe.py output in
OPTIMIZATION_r13.md).

Usage: python ab_probe_writes.py [sf_dir] [runs_per_arm] [names_csv]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names_arg = sys.argv[3] if len(sys.argv) > 3 else None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from bench import force
    from updating_datasets_data_engineering_spark.registry import queries
    from updating_datasets_data_engineering_spark.session import get_spark

    names = (
        names_arg.split(",")
        if names_arg
        else [
            "docs_bm25_streaming",
            "docs_tfidf_streaming",
            "dedup_semantic_streaming",
            "users_sig_edges_streaming",
            "users_triangles_streaming",
            "knn_ann_streaming",
            "streaming_dedup_archive",
        ]
    )

    spark = get_spark("ab-parallel-writes")
    qs = queries()

    def floor_probe() -> float:
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        force(
            spark.range(50_000_000)
            .withColumn(
                "k",
                F.pmod(F.hash(F.md5(F.col("id").cast("string"))), F.lit(1024)),
            )
            .groupBy("k")
            .count()
        )
        return time.perf_counter() - t0

    for name in names:
        q = qs[name]
        os.environ.pop("SPARK_GRAFT_SERIAL_WRITES", None)
        force(q(spark, sf_dir))  # unmeasured warm run
        f_pre = round(min(floor_probe(), floor_probe()), 3)
        best = {"serial": float("inf"), "parallel": float("inf")}
        for _ in range(runs):
            for arm in ("serial", "parallel"):
                if arm == "serial":
                    os.environ["SPARK_GRAFT_SERIAL_WRITES"] = "1"
                else:
                    os.environ.pop("SPARK_GRAFT_SERIAL_WRITES", None)
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                force(q(spark, sf_dir))
                best[arm] = min(best[arm], time.perf_counter() - t0)
        f_post = round(min(floor_probe(), floor_probe()), 3)
        os.environ.pop("SPARK_GRAFT_SERIAL_WRITES", None)
        print(
            json.dumps(
                {
                    "probe": "parallel_writes_ab",
                    "sf_dir": sf_dir,
                    "query": name,
                    "serial_s": round(best["serial"], 2),
                    "parallel_s": round(best["parallel"], 2),
                    "delta_s": round(best["parallel"] - best["serial"], 2),
                    "floor_pre_s": f_pre,
                    "floor_post_s": f_post,
                    "runs_per_arm": runs,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
