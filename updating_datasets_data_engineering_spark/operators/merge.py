"""Archive ∪ delta upsert-merge operators.

The reference's whole update model is
``archive(season) <- dedup(archive(season) ∪ delta)`` on the natural key
``(game_id, time_remaining, quarter)`` (scripts/spark_merge_dfs.py:82-83).

Three variants:

  * :func:`merge_reference` — byte-faithful ``unionByName`` +
    ``dropDuplicates`` (keeps an arbitrary row per key, like the
    reference).
  * :func:`merge_deterministic` — window ``row_number`` over an explicit
    source-priority ordering: delta-wins (or archive-wins), reproducible
    — the variant the correctness oracle uses.
  * :func:`merge_anti_join` — ``delta ∪ (archive ⟕anti delta)``: same
    delta-wins semantics as an anti-join, often cheaper than the window
    when the delta is small enough to broadcast.
  * :func:`merge_cdc` — anti-join upsert plus tombstones: delta rows
    op-tagged ``delete`` retract their key from the archive.

Scale notes (100 TB): all variants shuffle once on the merge key.  For
a daily delta of ~10^3 rows against a ~10^8-row season archive, the
anti-join variant with ``broadcast(delta_keys)`` turns the shuffle into
a broadcast hash join — zero archive movement.  With the archive stored
bucketed by the key, even the window variant is shuffle-free on the
archive side.  AQE skew-join handles hot keys.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..caching import tracked_persist

SHOT_KEY: tuple[str, ...] = ("game_id", "time_remaining", "quarter")


def merge_reference(archive: DataFrame, delta: DataFrame, key: Sequence[str] = SHOT_KEY) -> DataFrame:
    """Reference-faithful merge: schema-tolerant union, arbitrary-winner
    dedup (scripts/spark_merge_dfs.py:82-83)."""
    return archive.unionByName(delta, allowMissingColumns=True).dropDuplicates(list(key))


def merge_deterministic(
    archive: DataFrame,
    delta: DataFrame,
    key: Sequence[str] = SHOT_KEY,
    delta_wins: bool = True,
    tiebreak: Sequence[str] | None = None,
) -> DataFrame:
    """Deterministic upsert: tag each side with a priority, keep the
    highest-priority row per key via ``row_number``.  Exactly one
    shuffle (the window's hash partitioning on the key).

    ``tiebreak`` columns order rows *within* the same priority so the
    result is reproducible even when distinct rows collide on the key
    (``dropDuplicates`` would pick arbitrarily there — the reference's
    nondeterminism, SURVEY.md §7.3).
    """
    a = archive.withColumn("_src_priority", F.lit(0 if delta_wins else 1))
    d = delta.withColumn("_src_priority", F.lit(1 if delta_wins else 0))
    unioned = a.unionByName(d, allowMissingColumns=True)
    order = [F.col("_src_priority").desc()] + [F.col(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*key).orderBy(*order)
    return (
        unioned.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_src_priority")
    )


def merge_bucketed_window(
    spark,
    archive_table: str,
    delta: DataFrame,
    key: Sequence[str] = SHOT_KEY,
    tiebreak: Sequence[str] | None = None,
) -> DataFrame:
    """Deterministic delta-wins merge where the ARCHIVE side never
    shuffles: the archive is a table bucketed on the merge key, so its
    dedup window runs directly on the bucketed scan (zero Exchange —
    asserted on the plan in tests/test_plans.py), and survivors leave
    via a broadcast anti-join.  The delta gets its own window (it is
    the small side; its shuffle is negligible).

    Equivalent to :func:`merge_deterministic` with ``delta_wins=True``:
    in the joint union-window, every delta row sorts before every
    archive row within a key (src priority), so the winner for a key
    present in the delta is exactly the delta's own best row, and for
    archive-only keys it is the archive's best row.  Decomposing the
    window this way is THE layout win at 100 TB — the daily merge
    touches the archive only through a map-side scan + broadcast probe.
    """
    order = [F.col(c) for c in (tiebreak or [])]
    archive = spark.table(archive_table)
    wa = Window.partitionBy(*key).orderBy(*order) if order else Window.partitionBy(*key).orderBy(F.lit(1))
    archive_best = (
        archive.withColumn("_rn", F.row_number().over(wa)).where(F.col("_rn") == 1).drop("_rn")
    )
    wd = Window.partitionBy(*key).orderBy(*order) if order else Window.partitionBy(*key).orderBy(F.lit(1))
    # persist: the deduped delta is consumed twice (broadcast anti-join
    # probe + union side), and the delta is typically the OUTPUT of an
    # ingest pipeline — without materialization the whole parse/enrich
    # chain runs twice.  It is the small (daily) side by construction.
    delta_best = tracked_persist(
        delta.withColumn("_rn", F.row_number().over(wd)).where(F.col("_rn") == 1).drop("_rn")
    )
    survivors = archive_best.join(
        F.broadcast(delta_best.select(*key)), on=list(key), how="left_anti"
    )
    return survivors.unionByName(delta_best, allowMissingColumns=True)


def merge_cdc(
    archive: DataFrame,
    delta: DataFrame,
    key: Sequence[str] = SHOT_KEY,
    op_col: str = "op",
    delete_op: str = "delete",
    tiebreak: Sequence[str] | None = None,
) -> DataFrame:
    """CDC upsert-merge with tombstones: each delta row carries
    ``op_col`` — ``delete_op`` removes the key from the archive, any
    other value upserts (delta wins).  The reference only upserts
    (scripts/spark_merge_dfs.py:83); a continuously-updating dataset at
    100 TB eventually has to retract rows too (GDPR erasure, late
    corrections), so the merge family carries the CDC shape as a
    first-class variant (VERDICT r2 item 7).

    Same scale shape as :func:`merge_anti_join`: the delta is deduped
    per key (latest op wins under ``tiebreak``), then EVERY delta key —
    deleted or upserted — leaves the archive via one broadcast
    anti-join (the archive never shuffles), and only the non-tombstone
    delta rows rejoin via union.  A delete for an absent key is a
    no-op, matching upsert-engine conventions (e.g. Delta Lake MERGE
    ``WHEN MATCHED THEN DELETE``).
    """
    order = [F.col(c).desc() for c in (tiebreak or [])] or [F.lit(1).asc()]
    w = Window.partitionBy(*key).orderBy(*order)
    # persist: consumed twice (anti-join probe + union side)
    delta_best = tracked_persist(
        delta.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    )
    survivors = archive.join(
        F.broadcast(delta_best.select(*key)), on=list(key), how="left_anti"
    )
    # eqNullSafe (ADVICE r3): a NULL op must upsert, not vanish — plain
    # `!=` evaluates to NULL on a malformed CDC record, filtering the row
    # from upserts AFTER its key was already anti-joined out of the
    # archive, i.e. a stealth delete.
    upserts = delta_best.where(~F.col(op_col).eqNullSafe(F.lit(delete_op))).drop(op_col)
    return survivors.unionByName(upserts, allowMissingColumns=True)


def merge_anti_join(
    archive: DataFrame,
    delta: DataFrame,
    key: Sequence[str] = SHOT_KEY,
    broadcast_delta: bool = True,
) -> DataFrame:
    """Delta-wins upsert as ``dedup(delta) ∪ (archive anti-join delta)``.

    The delta is deduped on the key first (a scrape window can carry
    internal duplicates — the reference's ``dropDuplicates`` absorbed
    those too); without it the merged archive would violate key
    uniqueness.  With a small delta (the daily-scrape case) the
    anti-join broadcasts: the archive never shuffles — the right plan
    at 100 TB.
    """
    # persist: consumed twice (anti-join probe + union side); the delta
    # is the small side and often carries an upstream parse pipeline
    delta_unique = tracked_persist(delta.dropDuplicates(list(key)))
    d = F.broadcast(delta_unique) if broadcast_delta else delta_unique
    survivors = archive.join(d.select(*key), on=list(key), how="left_anti")
    return survivors.unionByName(delta_unique, allowMissingColumns=True)
