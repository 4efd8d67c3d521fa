"""Same-session interleaved A/B of
``spark.sql.optimizer.canChangeCachedPlanOutputPartitioning`` (VERDICT
r12 item 3): the config was adopted session-wide on sf0.1 streaming
evidence (bm25 11.2→8.6 s, tfidf 9.0→7.4, semantic 10.5→8.5), but
BENCH_SF1 showed +2-4 s drifts on five rows OUTSIDE that evidence set,
confounded with an unrecorded ambient floor.  This probe runs the
repo's own drift protocol — same session, interleaved on/off,
min-of-N per arm, machine-floor probe bracketing each block — so each
delta can be attributed to the config or to load.

The conf is runtime-settable (SQLConf, non-static), so flipping it
between runs changes cache-materialization planning for every
``tracked_persist`` inside the query's foreachBatch maintainers.

Usage: python ab_probe_aqecache.py [sf_dir] [runs_per_arm] [names_csv]
Prints one JSON line per query; numbers land in COVERAGE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    names_arg = sys.argv[3] if len(sys.argv) > 3 else None

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from pyspark.sql import functions as F

    from bench import force, shuffle_totals
    from updating_datasets_data_engineering_spark.registry import queries
    from updating_datasets_data_engineering_spark.session import get_spark

    conf = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
    # default: the five BENCH_SF1 drift rows; pass a comma-separated
    # list as argv[3] to A/B other rows (e.g. the sf0.1 win list the
    # config was adopted on)
    names = (
        names_arg.split(",")
        if names_arg
        else [
            "users_sig_edges_incremental",
            "streaming_dedup_archive",
            "knn_ann_streaming",
            "dedup_semantic_retract",
            "events_hourly_streaming",
        ]
    )

    spark = get_spark("ab-aqe-cache")
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
        # one unmeasured warm run (state-dir creation, file cache)
        spark.conf.set(conf, "true")
        force(q(spark, sf_dir))
        f_pre = round(min(floor_probe(), floor_probe()), 3)
        best = {"true": float("inf"), "false": float("inf")}
        # r14: per-arm shuffle-write bytes (load-independent plan
        # evidence — VERDICT r13 item 1 asks for byte-level attribution,
        # not wall time).  Identical runs per arm, so delta/runs is the
        # arm's per-run shuffle.
        sh = {"true": 0, "false": 0}
        # interleave arms within each repetition so ambient drift hits
        # both arms equally (quirk #4: cross-minute A/Bs are invalid)
        for _ in range(runs):
            for arm in ("true", "false"):
                spark.conf.set(conf, arm)
                spark.sparkContext._jvm.System.gc()
                _, w0 = shuffle_totals(spark)
                t0 = time.perf_counter()
                force(q(spark, sf_dir))
                best[arm] = min(best[arm], time.perf_counter() - t0)
                _, w1 = shuffle_totals(spark)
                sh[arm] += w1 - w0
        f_post = round(min(floor_probe(), floor_probe()), 3)
        spark.conf.set(conf, "true")
        print(
            json.dumps(
                {
                    "probe": "aqe_cache_ab",
                    "sf_dir": sf_dir,
                    "query": name,
                    "on_s": round(best["true"], 2),
                    "off_s": round(best["false"], 2),
                    "delta_s": round(best["true"] - best["false"], 2),
                    "on_shuffle_mb": round(sh["true"] / runs / 1e6, 2),
                    "off_shuffle_mb": round(sh["false"] / runs / 1e6, 2),
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
