"""Unit semantics for the time-series operators (as-of join, bucketed
range join, hypertable rollup) on hand-built edge-case frames; the
fixture-scale behavior is oracle-checked via the registry."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from updating_datasets_data_engineering_spark.operators import timeseries as TS


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            Row(event_id=100, user_id=1, ts=_ts("2024-01-01 10:00:00")),
            Row(event_id=101, user_id=1, ts=_ts("2024-01-01 12:00:00")),
            Row(event_id=102, user_id=2, ts=_ts("2024-01-01 09:00:00")),  # no prior right
        ]
    )
    right = spark.createDataFrame(
        [
            Row(event_id=7, user_id=1, ts=_ts("2024-01-01 09:30:00"), value=1.0),
            # exactly AT the left timestamp -> matches; tie on ts picks max event_id
            Row(event_id=8, user_id=1, ts=_ts("2024-01-01 10:00:00"), value=2.0),
            Row(event_id=9, user_id=1, ts=_ts("2024-01-01 10:00:00"), value=3.0),
            Row(event_id=5, user_id=2, ts=_ts("2024-01-01 11:00:00"), value=9.0),  # after left
        ]
    )
    out = {
        r["event_id"]: (r["asof_event_id"], r["asof_value"])
        for r in TS.asof_join(
            left, right, key=["user_id"], ts_col="ts",
            right_cols=["event_id", "value"], tie_col="event_id",
        ).collect()
    }
    assert out[100] == (9, 3.0)   # same-ts rows match; greatest event_id wins
    assert out[101] == (9, 3.0)   # carried forward
    assert out[102] == (None, None)  # nothing at-or-before


def test_range_join_count_semantics(spark):
    left = spark.createDataFrame(
        [
            Row(event_id=1, user_id=1, ts=_ts("2024-01-01 10:00:00")),
            Row(event_id=2, user_id=1, ts=_ts("2024-01-01 23:00:00")),  # zero matches
        ]
    )
    right = spark.createDataFrame(
        [
            Row(user_id=1, ts=_ts("2024-01-01 09:00:01")),  # just inside 1h lookback
            Row(user_id=1, ts=_ts("2024-01-01 09:00:00")),  # exactly -1h -> excluded (open)
            Row(user_id=1, ts=_ts("2024-01-01 10:00:00")),  # at left ts -> included (closed)
            Row(user_id=1, ts=_ts("2024-01-01 10:00:01")),  # after -> excluded
            Row(user_id=2, ts=_ts("2024-01-01 10:00:00")),  # other key
        ]
    )
    out = {
        r["event_id"]: r["n_in_range"]
        for r in TS.range_join_count(
            left, right, key=["user_id"], left_ts="ts", right_ts="ts",
            lookback_seconds=3600,
        ).collect()
    }
    assert out == {1: 2, 2: 0}


def test_range_join_count_non_divisor_bucket(spark):
    """Bucket widths that don't divide the lookback (and buckets wider
    than the lookback) must still probe the oldest qualifying bucket —
    floor division silently dropped it (ADVICE r2)."""
    left = spark.createDataFrame(
        [Row(event_id=1, user_id=1, ts=_ts("2024-01-01 00:02:00"))]  # unix 120 in-day
    )
    right = spark.createDataFrame(
        [
            Row(user_id=1, ts=_ts("2024-01-01 00:00:31")),  # in range, bucket floor(31/60)=0
            Row(user_id=1, ts=_ts("2024-01-01 00:01:59")),  # in range
            Row(user_id=1, ts=_ts("2024-01-01 00:00:29")),  # outside 90s lookback
        ]
    )
    for bucket in (60, 7, 240):  # non-divisor, tiny, wider-than-lookback
        out = {
            r["event_id"]: r["n_in_range"]
            for r in TS.range_join_count(
                left, right, key=["user_id"], left_ts="ts", right_ts="ts",
                lookback_seconds=90, bucket_seconds=bucket,
            ).collect()
        }
        assert out == {1: 2}, f"bucket_seconds={bucket}: {out}"


def test_hypertable_rollup_grains(spark, sf_dir):
    from updating_datasets_data_engineering_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    out = TS.hypertable_rollup(events)
    # grain_id is the authoritative marker (grp MSB): 7=grand, 3=group, 1=day, 0=hour
    total = out.where(F.col("grain_id") == 7).collect()
    assert len(total) == 1 and total[0]["n_events"] == events.count()
    per_type = out.where(F.col("grain_id") == 3).count()
    assert per_type == events.select("event_type").distinct().count()
    # grain_id agrees with the null pattern on null-free data
    assert out.where((F.col("grain_id") == 1) & F.col("hour").isNotNull()).count() == 0
    # hour-grain rows sum back to the day-grain rows
    day_rows = out.where(F.col("grain_id") == 1)
    hour_sum = (
        out.where(F.col("grain_id") == 0)
        .groupBy("grp", "day")
        .agg(F.sum("n_events").alias("n"))
    )
    joined = day_rows.join(hour_sum, ["grp", "day"])
    assert joined.where(F.col("n_events") != F.col("n")).count() == 0


# ---------------------------------------------------------------------------
# interval concurrency (sweep line) + group trend (r5)
# ---------------------------------------------------------------------------

import datetime as _dt

from updating_datasets_data_engineering_spark.operators.timeseries import (
    group_trend,
    interval_concurrency,
)


def _min(minute):
    return _dt.datetime(2024, 1, 1, 12, minute, 0)


def test_interval_concurrency_counts_overlap(spark):
    rows = [
        # k=a: [0,10) [5,15) [20,30) -> peak 2
        ("a", _min(0), _min(10)),
        ("a", _min(5), _min(15)),
        ("a", _min(20), _min(30)),
        # k=b: three nested -> peak 3
        ("b", _min(0), _min(30)),
        ("b", _min(5), _min(25)),
        ("b", _min(10), _min(20)),
    ]
    df = spark.createDataFrame(rows, ["k", "s", "e"])
    out = {r["k"]: r for r in interval_concurrency(df, ["k"], "s", "e").collect()}
    assert out["a"]["max_concurrent"] == 2 and out["a"]["n_intervals"] == 3
    assert out["b"]["max_concurrent"] == 3 and out["b"]["n_intervals"] == 3


def test_interval_concurrency_touching_is_not_overlap(spark):
    # [0,10) then [10,20): half-open — end==start never counts as 2
    df = spark.createDataFrame(
        [("a", _min(0), _min(10)), ("a", _min(10), _min(20))], ["k", "s", "e"]
    )
    out = interval_concurrency(df, ["k"], "s", "e").collect()[0]
    assert out["max_concurrent"] == 1


def test_group_trend_recovers_known_line(spark):
    # y = 3x + 2 exactly -> slope 3, intercept 2, r2 1
    rows = [("g", float(x), 3.0 * x + 2.0) for x in range(10)]
    df = spark.createDataFrame(rows, ["g", "x", "y"])
    out = group_trend(df, ["g"], "x", "y").collect()[0]
    assert out["slope"] == 3.0
    assert out["intercept"] == 2.0
    assert out["r2"] == 1.0
    assert out["n"] == 10


def test_funnel_requires_order(spark):
    from updating_datasets_data_engineering_spark.operators.timeseries import funnel_stages

    rows = [
        # u=1: full in-order funnel
        (1, _min(0), "view"), (1, _min(1), "click"), (1, _min(2), "purchase"),
        # u=2: purchase BEFORE click -> only stage 2 (view, click)
        (2, _min(0), "view"), (2, _min(1), "purchase"), (2, _min(2), "click"),
        # u=3: click only, no view -> stage 0
        (3, _min(0), "click"),
        # u=4: view then purchase, no click -> stage 1
        (4, _min(0), "view"), (4, _min(1), "purchase"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = {r["user_id"]: r for r in funnel_stages(
        df, ["user_id"], "ts", "event_type", ["view", "click", "purchase"]
    ).collect()}
    assert out[1]["funnel_stage"] == 3
    assert out[2]["funnel_stage"] == 2 and out[2]["t_purchase"] is None
    assert out[3]["funnel_stage"] == 0
    assert out[4]["funnel_stage"] == 1


def test_funnel_same_timestamp_step_counts(spark):
    from updating_datasets_data_engineering_spark.operators.timeseries import funnel_stages

    # click at the SAME instant as view: >= semantics admits it
    rows = [(1, _min(0), "view"), (1, _min(0), "click")]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    out = funnel_stages(df, ["user_id"], "ts", "event_type", ["view", "click"]).collect()[0]
    assert out["funnel_stage"] == 2
