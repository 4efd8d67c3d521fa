"""Native-expression play-string parser.

The reference implements this as ten row-at-a-time Python UDFs
(reference: scripts/spark_processing.py:94-246).  Each one forces a
JVM -> Python worker round trip per batch and is opaque to Catalyst.
Here every function is a pure Column expression: whole-stage codegen
spans the entire enrichment, common sub-expressions (the ``<br>`` and
space splits) are eliminated once, and column pruning still sees that
only ``play``/``winner``/``loser`` are consumed.

Grammar (reference: FIXTURES.md §3):

    <qtr> quarter, <m:ss.s> remaining<br>
    <Player First> <Last> <made|missed> <N>-pointer from <D> ft<br>
    <Team> <leads|trails|now leads|now trails|tied|now tied> <A>-<B>

Semantics preserved bug-for-bug where observable (SURVEY.md §2.6):
  * the two-word-team heuristic only recognizes first tokens
    {LA, New, San, Golden} (reference: scripts/spark_processing.py:158-163);
  * "now leads"/"now trails" shift the score token by one
    (reference: scripts/spark_processing.py:174,193);
  * tied games return the *first* number of the pair for both the
    winner and the loser score (reference: scripts/spark_processing.py:180-185).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TWO_WORD_CITY_TOKENS = ("LA", "New", "San", "Golden")


def _seg(play: Column, i: int) -> Column:
    """i-th (0-based) ``<br>``-separated segment of the play string.

    ``F.get`` (null on out-of-bounds) instead of ``getItem``: under
    Spark's default ANSI mode an index error would fail the whole job —
    one malformed record must degrade to nulls, not kill a 100 TB run.
    """
    return F.get(F.split(play, "<br>"), i)


def quarter(play: Column) -> Column:
    """First char of the first token: ``"3rd quarter, ..." -> "3"``.

    Reference: scripts/spark_processing.py:140-141.
    """
    return F.substring(F.get(F.split(play, " "), 0), 1, 1)


def time_remaining(play: Column) -> Column:
    """Third space-token, e.g. ``"11:30.0"``.

    Reference: scripts/spark_processing.py:143-144.
    """
    return F.get(F.split(play, " "), 2)


def time_remaining_ts(play: Column) -> Column:
    """Typed variant of the (dead) first UDF: parse ``m:ss.s`` as a
    timestamp.  Reference: scripts/spark_processing.py:137-138 parses
    with ``%H:%M.%S`` (hour:minute.second); we mirror that token order.
    """
    return F.to_timestamp(time_remaining(play), "H:m.s")


def seconds_remaining(play: Column) -> Column:
    """Engine extension: time remaining as a number (seconds), the
    typed column the all-string reference never materialized."""
    t = time_remaining(play)
    mins = F.get(F.split(t, ":"), 0).cast("double")
    secs = F.get(F.split(t, ":"), 1).cast("double")
    return mins * 60 + secs


def shots_by(play: Column) -> Column:
    """First two tokens of the 2nd segment -> player name.

    Reference: scripts/spark_processing.py:146-147.
    """
    toks = F.split(_seg(play, 1), " ")
    return F.concat_ws(" ", F.get(toks, 0), F.get(toks, 1))


def outcome(play: Column) -> Column:
    """``made`` | ``missed`` via regex on the 2nd segment.

    Reference: scripts/spark_processing.py:149-150.
    """
    return F.regexp_extract(_seg(play, 1), "made|missed", 0)


def attempt(play: Column) -> Column:
    """``2-pointer`` / ``3-pointer`` via regex ``[0-9]-pointer?``.

    Reference: scripts/spark_processing.py:152-153.
    """
    return F.regexp_extract(_seg(play, 1), "[0-9]-pointer?", 0)


def distance(play: Column) -> Column:
    """Concat of the last two tokens of the 2nd segment -> ``"25ft"``.

    Reference: scripts/spark_processing.py:155-156.
    """
    toks = F.split(_seg(play, 1), " ")
    return F.concat(F.try_element_at(toks, F.lit(-2)), F.try_element_at(toks, F.lit(-1)))


def distance_ft(play: Column) -> Column:
    """Engine extension: shot distance as an INT (feet)."""
    toks = F.split(_seg(play, 1), " ")
    return F.try_element_at(toks, F.lit(-2)).cast("int")


def _is_two_word_team(desc: Column) -> Column:
    return F.get(desc, 0).isin(*TWO_WORD_CITY_TOKENS)


def team(play: Column) -> Column:
    """Team from the 3rd segment; two tokens iff the first token is one
    of the known two-word city prefixes.

    Reference: scripts/spark_processing.py:158-163 (including its known
    truncation of unlisted multi-word cities to one token).
    """
    desc = F.split(_seg(play, 2), " ")
    return F.when(
        _is_two_word_team(desc),
        F.concat_ws(" ", F.get(desc, 0), F.get(desc, 1)),
    ).otherwise(F.get(desc, 0))


def _score_components(play: Column) -> tuple[Column, Column, Column]:
    """(first_num, second_num, is_tied) of the trailing score grammar.

    Re-expresses the verb-position branch structure of
    scripts/spark_processing.py:165-246 as one ``when`` chain:

      base = 1 (one-word team) or 2 (two-word team)
      desc[base]   in {leads, trails}          -> pair at desc[base+1]
      desc[base+1] in {leads, trails}          -> pair at desc[base+2]  ("now …")
      desc[base]   == tied                      -> pair at desc[base+1]
      otherwise ("now tied")                    -> pair at desc[base+2]
    """
    desc = F.split(_seg(play, 2), " ")
    two_word = _is_two_word_team(desc)
    base = F.when(two_word, F.lit(2)).otherwise(F.lit(1))
    verb0 = F.try_element_at(desc, base + 1)  # 1-based, null on OOB
    verb1 = F.try_element_at(desc, base + 2)
    direct = verb0.isin("leads", "trails")
    shifted = verb1.isin("leads", "trails")
    tied_direct = verb0 == "tied"
    pair = (
        F.when(direct, F.try_element_at(desc, base + 2))
        .when(shifted, F.try_element_at(desc, base + 3))
        .when(tied_direct, F.try_element_at(desc, base + 2))
        .otherwise(F.try_element_at(desc, base + 3))  # "now tied"
    )
    first = F.get(F.split(pair, "-"), 0)
    second = F.get(F.split(pair, "-"), 1)
    is_tied = ~(direct | shifted)
    return first, second, is_tied


def winner_score(winner: Column, team_col: Column, play: Column) -> Column:
    """Winner's score from the trailing ``A-B`` pair.

    Reference: scripts/spark_processing.py:165-205.  Tied games return
    the first number unconditionally (reference lines 180-185).
    """
    first, second, is_tied = _score_components(play)
    return F.when(is_tied, first).when(winner == team_col, first).otherwise(second)


def loser_score(loser: Column, team_col: Column, play: Column) -> Column:
    """Mirror of :func:`winner_score` for the loser.

    Reference: scripts/spark_processing.py:207-246.
    """
    first, second, is_tied = _score_components(play)
    return F.when(is_tied, first).when(loser == team_col, first).otherwise(second)


def enrich(df: DataFrame, play_col: str = "play") -> DataFrame:
    """Full enrichment: append all derived columns in ONE ``withColumns``
    pass (the reference chains 12 separate ``withColumn`` calls, each a
    new projection; reference: scripts/spark_processing.py:95-133).
    """
    p = F.col(play_col)
    derived = {
        "quarter": quarter(p),
        "time_remaining": time_remaining(p),
        "shots_by": shots_by(p),
        "outcome": outcome(p),
        "attempt": attempt(p),
        "distance": distance(p),
        "team": team(p),
    }
    df = df.withColumns(derived)
    return df.withColumns(
        {
            "winner_score": winner_score(F.col("winner"), F.col("team"), p),
            "loser_score": loser_score(F.col("loser"), F.col("team"), p),
        }
    )
