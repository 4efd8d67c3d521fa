"""Deterministic shot-event synthesis from the ``events`` fixture.

The driver's testdata has no play-by-play strings, so the shot-pipeline
queries derive them *deterministically* from ``events`` columns using
expressions written in engine-portable ANSI SQL (CASE/lpad/%/||) — the
exact same expression text runs through ``selectExpr`` on the Spark
side and verbatim inside the DuckDB oracle.  That makes the play-parser
oracle-checkable end to end: both engines construct identical inputs,
then each parses with its own independent implementation.

Grammar produced (FIXTURES.md §3):
    <qtr> quarter, <m:ss.s> remaining<br><First> <Last> <made|missed>
    <N>-pointer from <D> ft<br><Team> <verb> <A>-<B>
covering every branch: all four quarters, made/missed, 2/3-pointer,
one-word and two-word (LA/New/San/Golden) teams, all six verb phrases,
winner==team and winner!=team.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Engine-portable SQL fragments (valid in Spark SQL and DuckDB alike).
_QTR = "CASE event_id % 4 WHEN 0 THEN '1st' WHEN 1 THEN '2nd' WHEN 2 THEN '3rd' ELSE '4th' END"
_TIME = "(user_id % 12) || ':' || lpad(CAST((event_id * 7) % 60 AS STRING), 2, '0') || '.' || (event_id % 10)"
_PLAYER = "'P' || (user_id % 20) || ' Q' || (user_id % 7)"
_OUTCOME = "CASE WHEN value > 100 THEN 'made' ELSE 'missed' END"
_ATTEMPT = "CASE WHEN event_id % 3 = 0 THEN '3-pointer' ELSE '2-pointer' END"
_DIST = "(event_id % 40) || ' ft'"
_TEAM = (
    "CASE event_id % 7 WHEN 0 THEN 'Boston' WHEN 1 THEN 'Cleveland' "
    "WHEN 2 THEN 'Golden State' WHEN 3 THEN 'LA Clippers' WHEN 4 THEN 'San Antonio' "
    "WHEN 5 THEN 'New Orleans' ELSE 'Dallas' END"
)
_VERB = (
    "CASE event_id % 6 WHEN 0 THEN 'leads' WHEN 1 THEN 'trails' WHEN 2 THEN 'now leads' "
    "WHEN 3 THEN 'now trails' WHEN 4 THEN 'tied' ELSE 'now tied' END"
)
_SCORE = "(user_id % 120) || '-' || ((user_id * 3) % 120)"

PLAY_EXPR = (
    f"{_QTR} || ' quarter, ' || {_TIME} || ' remaining<br>' || "
    f"{_PLAYER} || ' ' || {_OUTCOME} || ' ' || {_ATTEMPT} || ' from ' || {_DIST} || '<br>' || "
    f"{_TEAM} || ' ' || {_VERB} || ' ' || {_SCORE}"
)

WINNER_EXPR = f"CASE WHEN event_id % 2 = 0 THEN {_TEAM} ELSE 'Memphis' END"
LOSER_EXPR = f"CASE WHEN event_id % 2 = 0 THEN 'Memphis' ELSE {_TEAM} END"

SHOT_EXPRS: dict[str, str] = {
    "game_id": "'G' || (event_id % 50)",
    "year": "'2025'",
    "month": "'1'",
    "day": "'15'",
    "winner": WINNER_EXPR,
    "loser": LOSER_EXPR,
    "x": "CAST(event_id % 500 AS STRING)",
    "y": "CAST(user_id % 400 AS STRING)",
    "play": PLAY_EXPR,
}

# Kafka-record JSON value built by string concatenation (none of the
# fields contain quotes/escapes by construction).
JSON_VALUE_EXPR = (
    "'{' || "
    + " || ',' || ".join(
        f"'\"{name}\":\"' || ({expr}) || '\"'" for name, expr in SHOT_EXPRS.items()
    )
    + " || '}'"
)


def _fan_out(events: DataFrame) -> DataFrame:
    """Spread a single-row-group fixture scan across the executors.

    Every consumer of the synth source runs a CPU-bound regex/JSON
    chain on top of it; the fixture parquet is one row group, so
    without this the whole chain runs on ONE task (a real topic /
    multi-file table splits natively and skips this branch).  The
    shuffle moves only the raw event columns, BEFORE the play-string
    expansion — measured 3.4s -> 2.1s on the sf0.1 ingest chain vs
    1.6x slower when repartitioning the expanded JSON records instead.
    """
    from ..tables import fan_out_if_narrow

    return fan_out_if_narrow(events)


def synth_shot_events(events: DataFrame) -> DataFrame:
    """events -> raw 9-column shot rows (plus event_id as row identity)."""
    return _fan_out(events).selectExpr(
        "event_id", *[f"({expr}) AS {name}" for name, expr in SHOT_EXPRS.items()]
    )


def synth_kafka_records(events: DataFrame) -> DataFrame:
    """events -> Kafka-shaped records: (key, value) with JSON value.

    ~4% of rows get a truncated value to exercise the malformed-row
    guard in operators.ingest.parse_shot_events (FIXTURES.md §1).
    """
    return _fan_out(events).selectExpr(
        "CAST(event_id AS STRING) AS key",
        f"CASE WHEN event_id % 25 = 24 THEN substring(({JSON_VALUE_EXPR}), 1, 20) "
        f"ELSE ({JSON_VALUE_EXPR}) END AS value",
    )


def duckdb_shot_cte(events_table: str = "events") -> str:
    """The same synthesis as a DuckDB CTE body (identical expressions)."""
    cols = ",\n        ".join(f"({expr}) AS {name}" for name, expr in SHOT_EXPRS.items())
    return f"SELECT event_id,\n        {cols}\n    FROM {events_table}"
