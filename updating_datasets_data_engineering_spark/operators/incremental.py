"""Incremental aggregate maintenance for continuously-updating datasets.

The reference recomputes everything per run (full topic re-read + full
archive rewrite).  At 100 TB the daily delta is ~10^-5 of the archive,
so the summary tables users actually query must be maintained
*incrementally*: combine the previous aggregate state with the delta's
partial aggregate — never rescan the archive.

Algebraic aggregates (count/sum/min/max under insert-only deltas)
re-combine exactly; avg is carried as (sum, count).  The combine is a
tiny outer join on the group key — broadcastable when the delta touches
few groups.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COMBINABLE = {"count", "sum", "min", "max"}


def partial_agg(df: DataFrame, key: Sequence[str], aggs: dict[str, tuple[str, str]]) -> DataFrame:
    """Aggregate state for a batch of rows.  ``aggs`` maps output col ->
    (input col, fn) with fn in COMBINABLE."""
    exprs = []
    for out, (col, fn) in aggs.items():
        if fn not in COMBINABLE:
            raise ValueError(f"{fn!r} is not algebraically combinable")
        if fn == "count":
            exprs.append(F.count(F.lit(1)).alias(out))
        else:
            exprs.append(getattr(F, fn)(col).alias(out))
    return df.groupBy(*key).agg(*exprs)


def combine_states(
    prev: DataFrame,
    delta_state: DataFrame,
    key: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    broadcast_delta: bool = True,
) -> DataFrame:
    """prev ⊕ delta: full-outer join on the key, re-combine each state
    column.  With a small delta the join broadcasts — the previous
    state (the big side) never shuffles."""
    d = F.broadcast(delta_state) if broadcast_delta else delta_state
    p = prev.alias("p")
    d = d.alias("d")
    cond = [F.col(f"p.{k}").eqNullSafe(F.col(f"d.{k}")) for k in key]
    joined = p.join(d, cond, "full_outer")
    out_cols = [
        F.coalesce(F.col(f"p.{k}"), F.col(f"d.{k}")).alias(k) for k in key
    ]
    for out, (_, fn) in aggs.items():
        a, b = F.col(f"p.{out}"), F.col(f"d.{out}")
        if fn in ("count", "sum"):
            combined = F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))
        elif fn == "min":
            combined = F.least(F.coalesce(a, b), F.coalesce(b, a))
        else:  # max
            combined = F.greatest(F.coalesce(a, b), F.coalesce(b, a))
        out_cols.append(combined.alias(out))
    return joined.select(*out_cols)


def incremental_update(
    prev: DataFrame,
    delta_rows: DataFrame,
    key: Sequence[str],
    aggs: dict[str, tuple[str, str]],
) -> DataFrame:
    """One maintenance step: aggregate the delta, combine with the
    previous state.  Cost is O(|delta| + |touched groups|), not
    O(|archive|)."""
    return combine_states(prev, partial_agg(delta_rows, key, aggs), key, aggs)
