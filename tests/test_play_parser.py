"""Branch-complete golden corpus for the native play-parser expressions
(FIXTURES.md §3): every grammar branch of the reference's ten UDFs —
made/missed, 2/3-pointer, one-/two-word teams, all six verb phrases,
winner==team and winner!=team, tied-both-scores-equal."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from updating_datasets_data_engineering_spark.functions import play_parser as P

# (play, winner, loser) -> expected enrichment dict
CORPUS = [
    (
        "1st quarter, 11:30.0 remaining<br>LeBron James made 3-pointer from 25 ft<br>Lakers leads 15-10",
        "Lakers",
        "Celtics",
        dict(quarter="1", time_remaining="11:30.0", shots_by="LeBron James", outcome="made",
             attempt="3-pointer", distance="25ft", team="Lakers", winner_score="15", loser_score="10"),
    ),
    (
        "2nd quarter, 0:42.1 remaining<br>Stephen Curry missed 3-pointer from 30 ft<br>Golden State trails 40-48",
        "Golden State",
        "Boston",
        dict(quarter="2", time_remaining="0:42.1", shots_by="Stephen Curry", outcome="missed",
             attempt="3-pointer", distance="30ft", team="Golden State", winner_score="40", loser_score="48"),
    ),
    (
        "3rd quarter, 6:05.3 remaining<br>Jayson Tatum made 2-pointer from 12 ft<br>Boston now leads 61-60",
        "Cleveland",
        "Boston",
        dict(quarter="3", time_remaining="6:05.3", shots_by="Jayson Tatum", outcome="made",
             attempt="2-pointer", distance="12ft", team="Boston", winner_score="60", loser_score="61"),
    ),
    (
        "4th quarter, 2:00.0 remaining<br>Luka Doncic made 2-pointer from 8 ft<br>Dallas tied 88-88",
        "Dallas",
        "Phoenix",
        dict(quarter="4", time_remaining="2:00.0", shots_by="Luka Doncic", outcome="made",
             attempt="2-pointer", distance="8ft", team="Dallas", winner_score="88", loser_score="88"),
    ),
    (
        "4th quarter, 0:09.9 remaining<br>Kawhi Leonard missed 3-pointer from 27 ft<br>LA Clippers now tied 101-101",
        "Denver",
        "LA Clippers",
        dict(quarter="4", time_remaining="0:09.9", shots_by="Kawhi Leonard", outcome="missed",
             attempt="3-pointer", distance="27ft", team="LA Clippers", winner_score="101", loser_score="101"),
    ),
    (
        "1st quarter, 9:15.4 remaining<br>Zion Williamson made 2-pointer from 3 ft<br>New Orleans now trails 12-20",
        "Utah",
        "New Orleans",
        dict(quarter="1", time_remaining="9:15.4", shots_by="Zion Williamson", outcome="made",
             attempt="2-pointer", distance="3ft", team="New Orleans", winner_score="20", loser_score="12"),
    ),
    (
        "2nd quarter, 5:00.0 remaining<br>Victor Wembanyama missed 3-pointer from 28 ft<br>San Antonio leads 33-31",
        "San Antonio",
        "Houston",
        dict(quarter="2", time_remaining="5:00.0", shots_by="Victor Wembanyama", outcome="missed",
             attempt="3-pointer", distance="28ft", team="San Antonio", winner_score="33", loser_score="31"),
    ),
    (
        "3rd quarter, 1:23.7 remaining<br>Ja Morant made 2-pointer from 15 ft<br>Memphis trails 70-75",
        "Phoenix",
        "Memphis",
        dict(quarter="3", time_remaining="1:23.7", shots_by="Ja Morant", outcome="made",
             attempt="2-pointer", distance="15ft", team="Memphis", winner_score="75", loser_score="70"),
    ),
]


@pytest.fixture(scope="module")
def enriched_rows(spark):
    df = spark.createDataFrame(
        [Row(play=p, winner=w, loser=l) for p, w, l, _ in CORPUS]
    )
    out = P.enrich(df).collect()
    return {r["play"]: r for r in out}


@pytest.mark.parametrize("play,winner,loser,expected", CORPUS, ids=range(len(CORPUS)))
def test_golden(enriched_rows, play, winner, loser, expected):
    row = enriched_rows[play].asDict()
    for col, want in expected.items():
        assert row[col] == want, f"{col}: got {row[col]!r}, want {want!r} for {play!r}"


def test_typed_extensions(spark):
    df = spark.createDataFrame(
        [Row(play=CORPUS[0][0], winner=CORPUS[0][1], loser=CORPUS[0][2])]
    )
    from pyspark.sql import functions as F

    row = df.select(
        P.seconds_remaining(F.col("play")).alias("secs"),
        P.distance_ft(F.col("play")).alias("dft"),
        P.time_remaining_ts(F.col("play")).alias("ts"),
    ).collect()[0]
    assert row["secs"] == pytest.approx(11 * 60 + 30.0)
    assert row["dft"] == 25
    assert row["ts"] is not None  # '%H:%M.%S'-style parse of 11:30.0


def test_malformed_play_yields_nulls_not_crash(spark):
    """Robustness the reference lacks: its UDFs raise IndexError on
    malformed plays (scripts/spark_processing.py:137-246 index blindly);
    native expressions degrade to null/empty values instead."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(play="garbage", winner="A", loser="B"),
            Row(play="", winner="A", loser="B"),
            Row(play="1st quarter, 1:00.0 remaining", winner="A", loser="B"),  # 1 segment
        ]
    )
    rows = P.enrich(df).collect()  # must not raise
    assert len(rows) == 3
    assert rows[0]["outcome"] in (None, "")
