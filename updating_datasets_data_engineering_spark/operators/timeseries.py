"""Time-series operators Spark lacks as built-ins: as-of join, range
(interval) join, hypertable-style multi-granularity rollup.

The reference is a continuously-updating EVENT table (SURVEY.md §1.1);
these are the standard query shapes over such tables, expressed with
scale-safe plans:

  * as-of join — the union+window formulation (tag sides, union on the
    key, one window ordered by time carrying the last right-side row
    forward with ignoreNulls).  ONE shuffle on the join key, no range
    explosion, no BroadcastNestedLoop — the classic distributed as-of
    (kdb's aj / Flink temporal join semantics).
  * range join — equi-join on (key, time-bucket) with the right side
    exploded to every bucket its interval touches, then an exact range
    filter.  Turns an inequality join (which Spark plans as BNLJ) into
    a uniform hash join; bucket width trades fan-out vs selectivity.
  * hypertable rollup — ROLLUP over (day, hour) time dimensions with
    grouping_id, the multi-granularity continuous-aggregate shape
    (TimescaleDB's hypertable rollups) in one pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: Sequence[str],
    ts_col: str,
    right_cols: Sequence[str],
    tie_col: str,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row within the key
    group: ``direction="backward"`` (default) takes the greatest right
    timestamp <= left's, ``"forward"`` the smallest right timestamp >=
    left's (rows at the exact same timestamp match in both modes).

    Union both sides tagged, sort one window per key by
    (ts, side, tie_col) — right rows sort before left rows at equal
    ts — and carry the last non-null right payload forward.  Forward
    mode is the same plan with the sort reversed (ts DESC, tie DESC —
    so the smallest qualifying tie_col wins, mirroring the oracle).
    The ``tie_col`` makes equal-timestamp right rows deterministic.
    Exactly one shuffle on the key; state per group is one row.
    """
    lcols = [c for c in left.columns]
    l = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r = right.select(
        *[
            F.col(c) if c in (*key, ts_col) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    unioned = l.unionByName(r)
    if direction == "backward":
        order = [F.col(ts_col), F.col("_side"), F.col(f"_r_{tie_col}")]
    elif direction == "forward":
        order = [F.col(ts_col).desc(), F.col("_side"), F.col(f"_r_{tie_col}").desc()]
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    w = (
        Window.partitionBy(*key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in right_cols
        ],
    )
    return (
        carried.where(F.col("_side") == 1)
        .drop("_side", *[f"_r_{c}" for c in right_cols])
        .withColumnsRenamed({f"_asof_{c}": f"asof_{c}" for c in right_cols})
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    key: Sequence[str],
    left_ts: str,
    right_ts: str,
    lookback_seconds: int,
    bucket_seconds: int | None = None,
) -> DataFrame:
    """Count right rows with ``left_ts - lookback < right_ts <=
    left_ts`` per left row, as a BUCKETED band join: both sides get a
    time bucket; the left row probes every bucket its window overlaps
    (lookback/bucket + 1 buckets, exploded map-side); the join is a
    plain equi-join on (key, bucket); the exact range predicate filters
    after.  No inequality-only join condition ever reaches the planner,
    so Spark never falls back to BroadcastNestedLoop — candidate volume
    is bounded by bucket width, not |left| x |right|.
    """
    if bucket_seconds is None:
        bucket_seconds = lookback_seconds
    # ceiling division: with a non-divisor bucket width (or a bucket
    # wider than the lookback) the window can straddle
    # ceil(lookback/bucket) bucket boundaries, so floor would leave the
    # oldest qualifying bucket unprobed (silent undercount)
    n_probe = -(-lookback_seconds // bucket_seconds) + 1
    lb = F.floor(F.unix_timestamp(F.col(left_ts)) / bucket_seconds)
    rb = F.floor(F.unix_timestamp(F.col(right_ts)) / bucket_seconds)
    probes = F.array(*[(lb - i).cast("long") for i in range(n_probe)])
    l = left.select(
        *key, F.col(left_ts).alias("_lts"), F.col("event_id").alias("_lid"),
        F.explode(probes).alias("_bucket"),
    )
    r = right.select(
        *[F.col(c).alias(f"_r_{c}") for c in key],
        F.col(right_ts).alias("_rts"),
        rb.cast("long").alias("_rbucket"),
    )
    # the range predicate belongs IN the left-join condition: filtering
    # after the join would drop a left row whose candidates all fall
    # outside the window (it must surface with n_in_range = 0)
    cond = F.col("_bucket") == F.col("_rbucket")
    for c in key:
        cond = cond & (F.col(c) == F.col(f"_r_{c}"))
    cond = (
        cond
        & (F.col("_rts") <= F.col("_lts"))
        & (F.col("_rts") > F.col("_lts") - F.expr(f"INTERVAL {lookback_seconds} SECONDS"))
    )
    joined = l.join(r, cond, "left")
    return (
        joined.groupBy(*key, "_lid", "_lts")
        .agg(F.count(F.col("_rts")).alias("n_in_range"))
        .select(*key, F.col("_lid").alias("event_id"), "n_in_range")
    )


def hypertable_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Multi-granularity continuous-aggregate shape: one ROLLUP pass
    producing (total), (per day), (per day+hour) rows with an explicit
    grain label — the hypertable rollup served from a single shuffle
    (map-side partial aggregation does the heavy lifting).

    ``grain_id`` is ``grouping_id()`` (grp is the MSB): 0 = hour grain,
    1 = day grain, 3 = per-group total, 7 = grand total.  It is the
    authoritative grain marker — a real NULL in ``group_col`` would make
    the null-pattern convention ambiguous, grouping_id never is.
    """
    day = F.date_format(F.col(ts_col), "yyyy-MM-dd")
    hour = F.date_format(F.col(ts_col), "HH")
    return (
        events.select(
            F.col(group_col).alias("grp"), day.alias("day"), hour.alias("hour"), F.col(value_col)
        )
        .rollup("grp", "day", "hour")
        .agg(
            F.grouping_id().alias("grain_id"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 2).alias("sum_value"),
        )
        .select("grp", "day", "hour", "grain_id", "n_events", "sum_value")
    )


def interval_concurrency(
    df: DataFrame,
    key: Sequence[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Maximum number of simultaneously-open intervals per key, by
    sweep line: each interval becomes a (+1 at start, -1 at end) event
    pair, a running sum ordered by time reconstructs the concurrency
    curve, and one aggregate takes its peak.  Half-open ``[start,
    end)`` semantics: at a tie the ``-1`` sorts first, so an interval
    ending exactly when another starts never counts as overlap.

    The classic alternative — self-join on ``a.start < b.end AND
    b.start < a.end`` — is an inequality-only join: quadratic candidate
    volume and a nested-loop plan.  The sweep line is one map-side
    explode (2 rows per interval) plus one window sort per key: linear
    data volume, one shuffle, survives any scale-up that a sort does.

    The peak value is order-insensitive within a tie group: ties are
    (time, delta)-ordered, same-sign runs only strengthen monotonically
    toward their last row, and the pre-group running total is itself a
    candidate — so whatever order equal rows land in, the max is the
    same (the per-row running sums are not unique, the PEAK is).
    """
    key = list(key)
    ev = df.select(
        *key,
        F.explode(
            F.array(
                F.struct(F.col(start_col).alias("t"), F.lit(1).alias("delta")),
                F.struct(F.col(end_col).alias("t"), F.lit(-1).alias("delta")),
            )
        ).alias("e"),
    ).select(*key, F.col("e.t").alias("t"), F.col("e.delta").alias("delta"))
    w = (
        Window.partitionBy(*key)
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = ev.withColumn("open_now", F.sum("delta").over(w))
    return running.groupBy(*key).agg(
        F.max("open_now").alias("max_concurrent"),
        (F.count(F.lit(1)) / 2).cast("long").alias("n_intervals"),
    )


def group_trend(
    df: DataFrame,
    key: Sequence[str],
    x: str,
    y: str,
    decimals: int = 6,
) -> DataFrame:
    """Per-group least-squares trend line — slope, intercept, fit (R²),
    and sample count of ``y`` over ``x`` — via the SQL regression
    aggregates (``regr_slope`` etc.), which Catalyst computes as one
    pass of running moments: a single map-side-combined hash aggregate,
    no window, no second scan.  The closed-form moments are exactly the
    summaries an INCREMENTAL maintainer can fold delta-wise (same state
    algebra as operators/incremental.py), which is why the trend family
    belongs to a continuously-updating 100 TB table.

    Both sides of a cross-engine comparison must round: the moment sums
    accumulate in data order, so last-bit sum differences reach the
    slope ratio (same discipline as q2/q11/q15).
    """
    key = list(key)
    xc, yc = F.col(x), F.col(y)
    return df.groupBy(*key).agg(
        F.round(F.regr_slope(yc, xc), decimals).alias("slope"),
        F.round(F.regr_intercept(yc, xc), decimals).alias("intercept"),
        F.round(F.regr_r2(yc, xc), decimals).alias("r2"),
        F.regr_count(yc, xc).alias("n"),
    )


def funnel_stages(
    df: DataFrame,
    key: Sequence[str],
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> DataFrame:
    """Ordered-funnel detection: per key, the earliest time each step
    of ``steps`` was reached IN ORDER (step N counts only at/after the
    time step N-1 was first reached), plus the depth reached.  The
    MATCH_RECOGNIZE / funnel-analytics shape, join-free.

    Formulation: chained conditional window minima —
    ``t_1 = min(ts | type = s_1)``, ``t_i = min(ts | type = s_i AND
    ts >= t_{i-1})`` — all over the same key partition, so Catalyst
    plans ONE exchange and a stack of Window operators over it; no
    self-joins, no per-key sequence materialization (the collect_list
    alternative drags every event row of a key into one buffer —
    this keeps events columnar and the state per key at |steps|
    timestamps).  A 100 TB event log funnels in one shuffle.
    """
    key = list(key)
    w = Window.partitionBy(*key).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    out = df
    prev = None
    for i, s in enumerate(steps, start=1):
        cond = F.col(type_col) == s
        if prev is not None:
            cond = cond & (F.col(ts_col) >= F.col(prev))
        name = f"t_{s}"
        out = out.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = name
    stage = F.lit(0)
    for i, s in enumerate(steps, start=1):
        stage = F.when(F.col(f"t_{s}").isNotNull(), F.lit(i)).otherwise(stage)
    return (
        out.groupBy(*key)
        .agg(
            *[F.min(f"t_{s}").alias(f"t_{s}") for s in steps],
            F.max(stage).alias("funnel_stage"),
        )
    )
