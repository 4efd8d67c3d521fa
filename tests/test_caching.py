"""Tracked-persist lifecycle: the ADVICE-r3 regression.

The original implementation held weakrefs; operators drop their local
DataFrame variables when they return, so every ref was dead by release
time and ``release_tracked()`` was a verified no-op while the JVM
CacheManager kept the partitions.  These tests pin the strong-ref fix:
running an operator that persists must leave live tracked entries, and
releasing must actually clear the JVM-side storage level.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from updating_datasets_data_engineering_spark import caching
from updating_datasets_data_engineering_spark.operators import merge as M


def _consume_operator(spark):
    """Run an operator that calls tracked_persist internally, drop the
    local reference, and consume the result — the exact lifecycle that
    killed the weakref design."""
    archive = spark.range(0, 100).select(
        F.col("id").alias("k"), F.lit("old").alias("v")
    )
    delta = spark.range(50, 150).select(
        F.col("id").alias("k"), F.lit("new").alias("v")
    )
    out = M.merge_anti_join(archive, delta, key=("k",))
    assert out.count() == 150  # consume; local frames die on return


def test_release_tracked_positive_after_operator(spark):
    caching.release_tracked()  # clean slate
    _consume_operator(spark)
    # the operator's internal persist must still be tracked (strong ref)
    released = caching.release_tracked()
    assert released > 0, (
        "release_tracked() returned 0 after an operator that persists — "
        "the weakref no-op regression (ADVICE r3) is back"
    )
    # idempotent: second release finds nothing
    assert caching.release_tracked() == 0


def test_release_clears_jvm_storage_level(spark):
    caching.release_tracked()
    df = caching.tracked_persist(spark.range(10).select(F.col("id")))
    df.count()  # materialize the cache
    assert df.storageLevel != StorageLevel.NONE
    assert caching.release_tracked(blocking=True) == 1
    assert df.storageLevel == StorageLevel.NONE


def test_scope_releases_only_its_suffix(spark):
    """ADVICE r4: a scoped release must not unpersist frames tracked
    BEFORE the scope (a concurrent query's caches)."""
    caching.release_tracked()
    outer = caching.tracked_persist(spark.range(5).select(F.col("id")))
    outer.count()
    with caching.scope(blocking=True):
        inner = caching.tracked_persist(spark.range(7).select(F.col("id")))
        inner.count()
        assert inner.storageLevel != StorageLevel.NONE
    # scope exit released the inner frame only
    assert inner.storageLevel == StorageLevel.NONE
    assert outer.storageLevel != StorageLevel.NONE
    # the outer frame is still tracked and releasable
    assert caching.release_tracked(blocking=True) == 1
    assert outer.storageLevel == StorageLevel.NONE


def test_scope_releases_on_exception(spark):
    """ADVICE r4: a failed batch must not leak its caches — the scope's
    finally releases even when the body raises."""
    caching.release_tracked()
    inner = None
    try:
        with caching.scope(blocking=True):
            inner = caching.tracked_persist(spark.range(3).select(F.col("id")))
            inner.count()
            raise RuntimeError("batch failed")
    except RuntimeError:
        pass
    assert inner.storageLevel == StorageLevel.NONE
    assert caching.release_tracked() == 0
