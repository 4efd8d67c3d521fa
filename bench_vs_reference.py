#!/usr/bin/env python
"""Head-to-head: reference-style row-UDF pipeline vs this engine's
native-expression pipeline, same data, same session, same output.

The reference enriches shot events with ten row-at-a-time Python UDFs
(reference: scripts/spark_processing.py:94-133).  To quantify what the
Spark-first rewrite buys, this harness implements the same *semantics*
as row-UDFs (independently written, same grammar spec as
functions/play_parser.py) and times both paths end to end on the
synthesized shot events at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"native_sec": ..., "row_udf_sec": ..., "speedup": ..., "rows": ...,
   "results_equal": true}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import StringType  # noqa: E402

from updating_datasets_data_engineering_spark.functions import play_parser as P  # noqa: E402
from updating_datasets_data_engineering_spark.session import get_spark  # noqa: E402
from updating_datasets_data_engineering_spark.sources import shot_synth as SS  # noqa: E402
from updating_datasets_data_engineering_spark.tables import load_table  # noqa: E402

TWO_WORD = {"LA", "New", "San", "Golden"}


# -- reference-style row UDFs (independent implementation of the same
#    grammar; regex-based, not a transcription of the reference code) --

def _seg(play: str, i: int) -> str:
    return play.split("<br>")[i]


def u_quarter(play):
    return play.split(" ")[0][0]


def u_time(play):
    return play.split(" ")[2]


def u_shots_by(play):
    t = _seg(play, 1).split(" ")
    return f"{t[0]} {t[1]}"


def u_outcome(play):
    m = re.search(r"made|missed", _seg(play, 1))
    return m.group(0) if m else None


def u_attempt(play):
    m = re.search(r"[0-9]-pointer?", _seg(play, 1))
    return m.group(0) if m else None


def u_distance(play):
    t = _seg(play, 1).split(" ")
    return t[-2] + t[-1]


def u_team(play):
    t = _seg(play, 2).split(" ")
    return f"{t[0]} {t[1]}" if t[0] in TWO_WORD else t[0]


def _score_pair(play):
    d = _seg(play, 2).split(" ")
    base = 2 if d[0] in TWO_WORD else 1
    if d[base] in ("leads", "trails"):
        pair, tied = d[base + 1], False
    elif d[base + 1] in ("leads", "trails"):
        pair, tied = d[base + 2], False
    elif d[base] == "tied":
        pair, tied = d[base + 1], True
    else:
        pair, tied = d[base + 2], True
    first, second = pair.split("-")[0], pair.split("-")[1]
    return first, second, tied


def u_winner_score(winner, team, play):
    first, second, tied = _score_pair(play)
    return first if tied or winner == team else second


def u_loser_score(loser, team, play):
    first, second, tied = _score_pair(play)
    return first if tied or loser == team else second


def row_udf_enrich(df):
    """The reference's shape: ten sequential withColumn row-UDFs."""
    udfs = {
        "quarter": F.udf(u_quarter, StringType()),
        "time_remaining": F.udf(u_time, StringType()),
        "shots_by": F.udf(u_shots_by, StringType()),
        "outcome": F.udf(u_outcome, StringType()),
        "attempt": F.udf(u_attempt, StringType()),
        "distance": F.udf(u_distance, StringType()),
        "team": F.udf(u_team, StringType()),
    }
    for name, u in udfs.items():
        df = df.withColumn(name, u(F.col("play")))
    w = F.udf(u_winner_score, StringType())
    l = F.udf(u_loser_score, StringType())
    df = df.withColumn("winner_score", w(F.col("winner"), F.col("team"), F.col("play")))
    df = df.withColumn("loser_score", l(F.col("loser"), F.col("team"), F.col("play")))
    return df


def force(df):
    df.write.mode("overwrite").format("noop").save()


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("updating-datasets-vs-reference")

    # Materialize the synthesized raw shots to multi-file parquet first
    # so both paths are measured on the ENRICHMENT alone (parallel scan,
    # no synth cost in the timed section) — the reference's input is
    # likewise pre-existing Kafka records, not synthesized strings.
    import tempfile

    shots_path = os.path.join(tempfile.mkdtemp(prefix="vs_ref_"), "shots")
    base = SS.synth_shot_events(load_table(spark, sf_dir, "events")).drop("event_id")
    replicas = int(os.environ.get("SPARK_GRAFT_VS_REF_REPLICAS", "10"))
    big = base
    for _ in range(replicas - 1):
        big = big.unionAll(base)
    big.repartition(32).write.mode("overwrite").parquet(shots_path)
    shots = spark.read.parquet(shots_path)

    native = P.enrich(shots)
    udf = row_udf_enrich(shots)

    force(native)  # warmup both paths
    force(udf)

    def best_of(df, n=3):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            force(df)
            best = min(best, time.perf_counter() - t0)
        return best

    native_sec = best_of(native)
    udf_sec = best_of(udf)

    cols = sorted(native.columns)
    left = sorted(tuple(r) for r in native.select(cols).collect())
    right = sorted(tuple(r) for r in udf.select(cols).collect())
    sample_equal = left == right
    print(
        json.dumps(
            {
                "native_sec": round(native_sec, 3),
                "row_udf_sec": round(udf_sec, 3),
                "speedup": round(udf_sec / native_sec, 2),
                "rows": shots.count(),
                "results_equal": bool(sample_equal),
            }
        )
    )


if __name__ == "__main__":
    main()
