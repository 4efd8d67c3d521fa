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
