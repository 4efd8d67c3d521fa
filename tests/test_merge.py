"""Merge/upsert semantics: cardinality, key uniqueness, schema-drift
null-fill, winner determinism, variant equivalence (FIXTURES.md §4)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from updating_datasets_data_engineering_spark.operators import merge as M

KEY = ["game_id", "time_remaining", "quarter"]


@pytest.fixture(scope="module")
def archive(spark):
    # archive-only column: legacy_flag (missing from delta -> null-fill)
    return spark.createDataFrame(
        [
            Row(game_id="G1", time_remaining="11:30.0", quarter="1", team="Boston", legacy_flag="x"),
            Row(game_id="G1", time_remaining="10:00.0", quarter="1", team="Boston", legacy_flag="x"),
            Row(game_id="G2", time_remaining="5:00.0", quarter="2", team="Dallas", legacy_flag="x"),
        ]
    )


@pytest.fixture(scope="module")
def delta(spark):
    # delta-only column: new_col (missing from archive); one key overlaps
    # archive (G1/11:30.0/1) with a conflicting team value
    return spark.createDataFrame(
        [
            Row(game_id="G1", time_remaining="11:30.0", quarter="1", team="REVISED", new_col="y"),
            Row(game_id="G3", time_remaining="1:00.0", quarter="4", team="Memphis", new_col="y"),
        ]
    )


def test_reference_merge_cardinality(archive, delta):
    merged = M.merge_reference(archive, delta, key=KEY)
    assert merged.count() == 3 + 2 - 1  # N + M - K
    assert merged.select(*KEY).distinct().count() == 4


def test_schema_drift_null_fill(archive, delta):
    merged = M.merge_reference(archive, delta, key=KEY)
    assert set(merged.columns) == {"game_id", "time_remaining", "quarter", "team", "legacy_flag", "new_col"}
    g3 = merged.where("game_id = 'G3'").collect()[0]
    assert g3["legacy_flag"] is None  # archive-only column null on delta rows
    g2 = merged.where("game_id = 'G2'").collect()[0]
    assert g2["new_col"] is None  # delta-only column null on archive rows


def test_deterministic_delta_wins(archive, delta):
    merged = M.merge_deterministic(archive, delta, key=KEY, delta_wins=True)
    overlap = merged.where("game_id = 'G1' AND time_remaining = '11:30.0'").collect()
    assert len(overlap) == 1
    assert overlap[0]["team"] == "REVISED"
    assert overlap[0]["new_col"] == "y"


def test_deterministic_archive_wins(archive, delta):
    merged = M.merge_deterministic(archive, delta, key=KEY, delta_wins=False)
    overlap = merged.where("game_id = 'G1' AND time_remaining = '11:30.0'").collect()
    assert overlap[0]["team"] == "Boston"


def test_anti_join_equals_window_variant(archive, delta):
    a = M.merge_deterministic(archive, delta, key=KEY, delta_wins=True)
    b = M.merge_anti_join(archive, delta, key=KEY)
    cols = sorted(a.columns)
    key = lambda t: tuple((x is None, str(x)) for x in t)  # None-safe sort
    rows_a = sorted((tuple(r[c] for c in cols) for r in a.collect()), key=key)
    rows_b = sorted((tuple(r[c] for c in cols) for r in b.select(*a.columns).collect()), key=key)
    assert rows_a == rows_b


def test_merge_idempotent(archive, delta):
    once = M.merge_deterministic(archive, delta, key=KEY)
    twice = M.merge_deterministic(once, delta, key=KEY)
    assert twice.count() == once.count()
    cols = sorted(once.columns)
    key = lambda t: tuple((x is None, str(x)) for x in t)
    assert sorted((tuple(r[c] for c in cols) for r in once.collect()), key=key) == sorted(
        (tuple(r[c] for c in cols) for r in twice.select(*once.columns).collect()), key=key
    )


@pytest.fixture(scope="module")
def cdc_delta(spark):
    # tombstone for an archive key, tombstone for an ABSENT key (no-op),
    # an upsert, and a duplicate-key pair (late 'delete' must win under
    # the tiebreak) — every CDC convention in one frame
    return spark.createDataFrame(
        [
            Row(game_id="G1", time_remaining="11:30.0", quarter="1", team="REVISED", seq=1, op="upsert"),
            Row(game_id="G2", time_remaining="5:00.0", quarter="2", team="-", seq=1, op="delete"),
            Row(game_id="G9", time_remaining="9:99.0", quarter="9", team="-", seq=1, op="delete"),
            Row(game_id="G1", time_remaining="10:00.0", quarter="1", team="early", seq=1, op="upsert"),
            Row(game_id="G1", time_remaining="10:00.0", quarter="1", team="-", seq=2, op="delete"),
        ]
    )


def test_cdc_delete_removes_archive_key(archive, cdc_delta):
    merged = M.merge_cdc(archive, cdc_delta, key=KEY, tiebreak=["seq"])
    assert merged.where("game_id = 'G2'").count() == 0


def test_cdc_upsert_wins_and_absent_delete_noop(archive, cdc_delta):
    merged = M.merge_cdc(archive, cdc_delta, key=KEY, tiebreak=["seq"])
    assert merged.where("game_id = 'G9'").count() == 0  # delete of absent key: no-op
    overlap = merged.where("game_id = 'G1' AND time_remaining = '11:30.0'").collect()
    assert len(overlap) == 1 and overlap[0]["team"] == "REVISED"


def test_cdc_latest_op_wins_within_key(archive, cdc_delta):
    # key G1/10:00.0/1 has upsert(seq=1) then delete(seq=2): the delete
    # is the latest op, so the key must vanish despite the earlier upsert
    merged = M.merge_cdc(archive, cdc_delta, key=KEY, tiebreak=["seq"])
    assert merged.where("game_id = 'G1' AND time_remaining = '10:00.0'").count() == 0
    # and no op/seq plumbing leaks into the output schema
    assert "op" not in merged.columns


# ---------------------------------------------------------------------------
# SCD Type-2 + snapshot diff (r5)
# ---------------------------------------------------------------------------

import datetime as _dt

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def scd_current(spark):
    d = _dt.date
    return spark.createDataFrame(
        [
            # k=1: one closed + one open version
            Row(k=1, attr="a0", valid_from=d(2019, 1, 1), valid_to=d(2020, 1, 1), is_current=False),
            Row(k=1, attr="a1", valid_from=d(2020, 1, 1), valid_to=None, is_current=True),
            # k=2: open only
            Row(k=2, attr="b0", valid_from=d(2020, 1, 1), valid_to=None, is_current=True),
            # k=3: open only, delta will carry an identical snapshot
            Row(k=3, attr="c0", valid_from=d(2020, 1, 1), valid_to=None, is_current=True),
        ]
    )


@pytest.fixture(scope="module")
def scd_delta(spark):
    d = _dt.date
    return spark.createDataFrame(
        [
            Row(k=1, attr="a2", eff_date=d(2024, 6, 1)),   # changed -> new version
            Row(k=3, attr="c0", eff_date=d(2024, 6, 1)),   # identical -> no-op
            Row(k=4, attr="d0", eff_date=d(2024, 6, 1)),   # brand-new key
        ]
    )


def test_scd2_versions(spark, scd_current, scd_delta):
    out = M.merge_scd2(scd_current, scd_delta, key=["k"], attrs=["attr"]).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    # k=1: history + closed-out a1 + open a2
    k1 = sorted(by_key[1], key=lambda r: r["valid_from"])
    assert [r["attr"] for r in k1] == ["a0", "a1", "a2"]
    assert k1[1]["valid_to"] == _dt.date(2024, 6, 1) and not k1[1]["is_current"]
    assert k1[2]["valid_to"] is None and k1[2]["is_current"]
    # k=2 untouched (no delta row)
    assert len(by_key[2]) == 1 and by_key[2][0]["is_current"]
    # k=3 identical snapshot: still exactly one open row, original start
    assert len(by_key[3]) == 1
    assert by_key[3][0]["valid_from"] == _dt.date(2020, 1, 1)
    # k=4 first version
    assert len(by_key[4]) == 1 and by_key[4][0]["valid_from"] == _dt.date(2024, 6, 1)
    # invariant: exactly one open row per live key
    opens = [r for r in out if r["is_current"]]
    assert len(opens) == len({r["k"] for r in opens}) == 4


def test_scd2_duplicate_delta_rows_do_not_fork(spark, scd_current, scd_delta):
    doubled = scd_delta.unionByName(scd_delta)
    out = M.merge_scd2(scd_current, doubled, key=["k"], attrs=["attr"])
    opens = out.where("is_current").groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in opens)


def test_snapshot_diff_ops(spark):
    old = spark.createDataFrame(
        [Row(k=1, v="x"), Row(k=2, v="y"), Row(k=3, v="z"), Row(k=4, v=None)]
    )
    new = spark.createDataFrame(
        [Row(k=1, v="x"), Row(k=2, v="Y"), Row(k=5, v="w"), Row(k=4, v=None)]
    )
    out = {r["k"]: r for r in M.snapshot_diff(old, new, key=["k"]).collect()}
    # k=1 unchanged (absent), k=4 null==null unchanged (absent)
    assert set(out) == {2, 3, 5}
    assert out[2]["op"] == "update" and out[2]["v"] == "Y"   # new side wins
    assert out[3]["op"] == "delete" and out[3]["v"] == "z"   # old side values
    assert out[5]["op"] == "insert" and out[5]["v"] == "w"


def test_snapshot_diff_null_to_value_is_update(spark):
    old = spark.createDataFrame([Row(k=1, v=None)], schema="k long, v string")
    new = spark.createDataFrame([Row(k=1, v="now-set")], schema="k long, v string")
    out = M.snapshot_diff(old, new, key=["k"]).collect()
    assert len(out) == 1 and out[0]["op"] == "update"


def test_scd2_roundtrips_through_snapshot_diff(spark, scd_current, scd_delta):
    """The two operators are inverses on the open slice: applying the
    diff between old-open and new-open as CDC reproduces new-open."""
    new_table = M.merge_scd2(scd_current, scd_delta, key=["k"], attrs=["attr"])
    old_open = scd_current.where("is_current").select("k", "attr")
    new_open = new_table.where("is_current").select("k", "attr")
    cdc = M.snapshot_diff(old_open, new_open, key=["k"])
    replayed = M.merge_cdc(old_open, cdc, key=["k"], op_col="op")
    assert replayed.exceptAll(new_open).count() == 0
    assert new_open.exceptAll(replayed).count() == 0
