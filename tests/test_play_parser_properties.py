"""Property-based grammar tests (SURVEY.md §5.2 item 4).

Plays are generated from the documented grammar; the native parser's
output must satisfy the grammar's invariants, checked against an
independent pure-Python evaluation of the same spec (written from the
FIXTURES.md §3 grammar, not ported from the reference UDFs)."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from updating_datasets_data_engineering_spark.functions import play_parser as P

TEAMS = ["Boston", "Cleveland", "Dallas", "Golden State", "LA Clippers", "New Orleans", "San Antonio"]
VERBS = ["leads", "trails", "now leads", "now trails", "tied", "now tied"]
QTRS = ["1st", "2nd", "3rd", "4th"]

play_parts = st.tuples(
    st.sampled_from(QTRS),
    st.integers(0, 11),        # minutes
    st.integers(0, 59),        # seconds
    st.integers(0, 9),         # tenths
    st.sampled_from(["Alpha Beta", "Gamma Delta"]),
    st.sampled_from(["made", "missed"]),
    st.sampled_from(["2-pointer", "3-pointer"]),
    st.integers(0, 40),        # distance ft
    st.sampled_from(TEAMS),
    st.sampled_from(VERBS),
    st.integers(0, 150),       # score A
    st.integers(0, 150),       # score B
    st.booleans(),             # winner == team ?
)


def build_play(parts):
    qtr, mins, secs, tenth, player, outcome, attempt, dist, team, verb, a, b, _ = parts
    return (
        f"{qtr} quarter, {mins}:{secs:02d}.{tenth} remaining<br>"
        f"{player} {outcome} {attempt} from {dist} ft<br>"
        f"{team} {verb} {a}-{b}"
    )


def expected(parts):
    """Independent spec evaluation via regex over the trailing segment."""
    qtr, mins, secs, tenth, player, outcome, attempt, dist, team, verb, a, b, winner_is_team = parts
    m = re.search(r"(\d+)-(\d+)$", build_play(parts))
    first, second = m.group(1), m.group(2)
    tied = "tied" in verb
    if tied:
        ws = ls = first
    elif winner_is_team:
        ws, ls = first, second
    else:
        ws, ls = second, first
    return dict(
        quarter=qtr[0],
        time_remaining=f"{mins}:{secs:02d}.{tenth}",
        shots_by=player,
        outcome=outcome,
        attempt=attempt,
        distance=f"{dist}ft",
        team=team,
        winner_score=ws,
        loser_score=ls,
    )


@settings(max_examples=20, deadline=None)
@given(st.lists(play_parts, min_size=1, max_size=30))
def test_parser_matches_grammar_spec(spark, batch):
    rows = []
    for parts in batch:
        winner_is_team = parts[-1]
        team = parts[8]
        winner = team if winner_is_team else "Opponent"
        loser = "Opponent" if winner_is_team else team
        rows.append(Row(play=build_play(parts), winner=winner, loser=loser))
    out = P.enrich(spark.createDataFrame(rows)).collect()
    for parts, row in zip(batch, out):
        want = expected(parts)
        got = row.asDict()
        for col, val in want.items():
            assert got[col] == val, f"{col}: {got[col]!r} != {val!r} for {row['play']!r}"
