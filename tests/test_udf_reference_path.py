"""The sanctioned BatchEvalPython example (SURVEY §2.10): ONE
reference-faithful row-at-a-time Python UDF, kept to prove (a) the
engine still supports the reference's extension mechanism, and (b) the
native Column expression computes the identical result — the policy
argument for keeping every hot-path function native.

Reference: scripts/spark_processing.py:158-163 (get_team, one of the
ten row UDFs that form the reference's entire extension surface)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from updating_datasets_data_engineering_spark.functions import play_parser as P
from updating_datasets_data_engineering_spark.plans.audit import analyze
from updating_datasets_data_engineering_spark.sources import shot_synth as SS
from updating_datasets_data_engineering_spark.tables import load_table


def _reference_style_get_team():
    """Row-at-a-time UDF transcribing the reference's Python logic."""

    def get_team(play: str) -> str | None:
        if play is None:
            return None
        segs = play.split("<br>")
        if len(segs) < 3:
            return None
        toks = segs[2].split(" ")
        if toks and toks[0] in ("LA", "New", "San", "Golden"):
            return " ".join(toks[:2])
        return toks[0] if toks else None

    return F.udf(get_team, T.StringType())


def test_row_udf_equals_native_and_shows_batch_eval_python(spark, sf_dir):
    shots = SS.synth_shot_events(load_table(spark, sf_dir, "events")).select(
        "event_id", "play"
    )
    udf_team = _reference_style_get_team()
    via_udf = shots.select("event_id", udf_team(F.col("play")).alias("team"))
    via_native = shots.select("event_id", P.team(F.col("play")).alias("team"))

    # the UDF path really is BatchEvalPython (the slow path the audit bans
    # from hot queries); the native path is not
    assert analyze(via_udf).has_python_udf
    assert not analyze(via_native).has_python_udf

    # identical results, row for row
    u = {r["event_id"]: r["team"] for r in via_udf.collect()}
    n = {r["event_id"]: r["team"] for r in via_native.collect()}
    assert u == n
