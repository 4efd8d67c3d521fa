"""Per-stage shuffle accounting for the salted co-occurrence pair
reduce (VERDICT r12 item 4): BENCH_FULL measured the salted spec's
TOTAL shuffle write at ~2× the unsalted row (118.2 vs 58.8 MB at
sf0.1), while the docstring argued stage-one parity — both are true,
and this probe records WHERE the bytes go so COVERAGE.md can state the
per-stage split instead of a stage-one-only claim.

Decomposition by cumulative-shuffle-write deltas (bench.shuffle_totals)
over four forced plans sharing the same upstream:

  upstream   = guarded_self_pairs grid (the per-hour self-join)
  stage1     = partial groupBy(pair, salt)        -> W(partial) - W(up)
  stage2     = exact re-sum groupBy(pair)         -> W(salted)  - W(partial)
  unsalted   = single groupBy(pair)               -> W(plain)   - W(up)

Usage: python shuffle_probe_salt.py [sf_dir ...]
Defaults to /root/testdata/sf0.1 and /tmp/graft_sf1 (if present).
Prints one JSON line per sf_dir; numbers land in COVERAGE.md.
"""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import functions as F


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import force, shuffle_totals
    from updating_datasets_data_engineering_spark.operators import skew
    from updating_datasets_data_engineering_spark.session import get_spark
    from updating_datasets_data_engineering_spark.tables import load_table

    dirs = sys.argv[1:] or [
        d for d in ("/root/testdata/sf0.1", "/tmp/graft_sf1") if os.path.isdir(d)
    ]
    spark = get_spark("shuffle-probe-salt")

    for sf_dir in dirs:
        ev = load_table(spark, sf_dir, "events")
        active = ev.select(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hour"),
            "user_id",
        ).distinct()
        support = active.groupBy("user_id").agg(F.count(F.lit(1)).alias("_w"))
        eligible = support.where(F.col("_w") >= 2).select("user_id")
        active = active.join(eligible, "user_id", "left_semi")

        def pairs_df():
            return skew.guarded_self_pairs(
                active, ["hour"], "user_id", bucket_cap=4096, n_salts=8
            ).select(
                "hour",
                F.col("user_id_a").alias("user_a"),
                F.col("user_id_b").alias("user_b"),
            )

        def partial_df():
            p = pairs_df().withColumn("_salt", F.pmod(F.hash("hour"), F.lit(16)))
            return p.groupBy("user_a", "user_b", "_salt").agg(
                F.count(F.lit(1)).alias("_p")
            )

        def salted_df():
            return skew.salted_agg(
                pairs_df(),
                ["user_a", "user_b"],
                {"shared_windows": ("", "count")},
                n_salts=16,
                salt_expr=F.hash("hour"),
            )

        def unsalted_df():
            return pairs_df().groupBy("user_a", "user_b").agg(
                F.count(F.lit(1)).alias("shared_windows")
            )

        deltas = {}
        for name, fn in [
            ("upstream", pairs_df),
            ("partial", partial_df),
            ("salted", salted_df),
            ("unsalted", unsalted_df),
        ]:
            _, w0 = shuffle_totals(spark)
            force(fn())
            _, w1 = shuffle_totals(spark)
            deltas[name] = w1 - w0

        mb = lambda b: round(b / 1e6, 2)  # noqa: E731
        out = {
            "probe": "salted_cooccurrence_stage_bytes",
            "sf_dir": sf_dir,
            "upstream_mb": mb(deltas["upstream"]),
            "stage1_mb": mb(deltas["partial"] - deltas["upstream"]),
            "stage2_mb": mb(deltas["salted"] - deltas["partial"]),
            "unsalted_agg_mb": mb(deltas["unsalted"] - deltas["upstream"]),
            "salted_total_mb": mb(deltas["salted"]),
            "unsalted_total_mb": mb(deltas["unsalted"]),
        }
        print(json.dumps(out))

    spark.stop()


if __name__ == "__main__":
    main()
