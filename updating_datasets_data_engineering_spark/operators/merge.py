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


def merge_scd2(
    current: DataFrame,
    delta: DataFrame,
    key: Sequence[str],
    attrs: Sequence[str],
    eff_col: str = "eff_date",
    start_col: str = "valid_from",
    end_col: str = "valid_to",
    flag_col: str = "is_current",
    open_end: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension Type-2 maintenance: version history as
    data.  ``current`` is the full SCD2 table (``key`` + ``attrs`` +
    ``[start_col, end_col, flag_col]``); ``delta`` carries one new
    attribute snapshot per key effective at ``eff_col``.  A delta row
    whose attrs differ from the key's OPEN row closes that row
    (``end_col = eff``, flag false) and appends a new open version;
    an identical snapshot is a no-op; a key with no open row inserts
    its first version.  Closed history rows pass through untouched.

    This is the "updating datasets" model one level up from the
    reference's overwrite-merge (scripts/spark_merge_dfs.py:82-83):
    instead of the delta *replacing* the archive row, the archive keeps
    every version with its validity interval — the standard warehouse
    answer to "what did this row say when we trained last month?".

    Scale shape (100 TB dimension): the table is stored partitioned by
    ``flag_col``, so the closed-history partition — the bulk of the
    data — is PASSED THROUGH without a join, a shuffle, or even a
    comparison; partition pruning means it is never scanned for the
    merge decision at all.  Only the open slice (≤ one row per live
    key) joins the delta, and a daily delta broadcasts: zero shuffle
    end to end.
    """
    key = list(key)
    attrs = list(attrs)
    hist = current.where(~F.col(flag_col))
    open_rows = current.where(F.col(flag_col))

    # one row per key in the delta: a malformed feed with two snapshots
    # for a key would otherwise fork the open interval
    d = F.broadcast(tracked_persist(delta.dropDuplicates(key)))

    # attrs identical <=> every column null-safe-equal
    same = None
    for a in attrs:
        eq = open_rows[a].eqNullSafe(d[a])
        same = eq if same is None else (same & eq)

    changed_keys = (
        open_rows.join(d, on=key, how="inner")
        .where(~same)
        .select(*[open_rows[k] for k in key])
    )
    changed_keys = F.broadcast(tracked_persist(changed_keys))

    untouched_open = open_rows.join(changed_keys, on=key, how="left_anti")
    closed_out = (
        open_rows.join(changed_keys, on=key, how="left_semi")
        .join(d.select(*key, F.col(eff_col).alias("_eff")), on=key)
        .withColumn(end_col, F.col("_eff"))
        .withColumn(flag_col, F.lit(False))
        .drop("_eff")
    )
    new_open = (
        d.join(changed_keys, on=key, how="left_semi")
        .unionByName(d.join(open_rows.select(*key), on=key, how="left_anti"))
        .select(
            *key,
            *attrs,
            F.col(eff_col).alias(start_col),
            # open rows end at NULL, or at the sentinel high date when the
            # store's convention is BETWEEN-friendly (e.g. '9999-12-31')
            F.lit(open_end).cast(open_rows.schema[end_col].dataType).alias(end_col),
            F.lit(True).alias(flag_col),
        )
    )
    out_cols = [*key, *attrs, start_col, end_col, flag_col]
    return (
        hist.select(*out_cols)
        .unionByName(untouched_open.select(*out_cols))
        .unionByName(closed_out.select(*out_cols))
        .unionByName(new_open.select(*out_cols))
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: Sequence[str],
    compare: Sequence[str] | None = None,
    op_col: str = "op",
) -> DataFrame:
    """Change-data-feed generation: diff two snapshots of a keyed table
    into insert / update / delete rows (the inverse of ``merge_cdc`` —
    given only before/after states, recover the delta that connects
    them).  Unchanged keys are dropped.  Values come from the NEW side
    for inserts/updates and the OLD side for deletes.

    Scale shape: one co-partitioned full-outer join on the key — both
    snapshots shuffle once, or ZERO times when both are stored bucketed
    by the key (operators/bucketing.py), which is how a 100 TB archive
    would run a daily diff.  The per-column null-safe comparison stays
    in whole-stage codegen; no row hashing round-trip, no driver
    involvement.
    """
    key = list(key)
    compare = list(compare) if compare is not None else [
        c for c in new.columns if c not in key
    ]
    # alias-qualified refs: old/new typically derive from the same scan
    # (yesterday's vs today's snapshot of one table), so bare column
    # objects are ambiguous under Spark's self-join analysis
    o = old.alias("_sd_o")
    n = new.alias("_sd_n")
    oc_ = lambda c: F.col(f"_sd_o.`{c}`")  # noqa: E731
    nc_ = lambda c: F.col(f"_sd_n.`{c}`")  # noqa: E731
    cond = None
    for k in key:
        eq = oc_(k).eqNullSafe(nc_(k))
        cond = eq if cond is None else (cond & eq)
    j = o.join(n, on=cond, how="full_outer")

    old_present = oc_(key[0]).isNotNull()
    new_present = nc_(key[0]).isNotNull()
    same = None
    for c in compare:
        eq = oc_(c).eqNullSafe(nc_(c))
        same = eq if same is None else (same & eq)

    op = (
        F.when(~old_present, F.lit("insert"))
        .when(~new_present, F.lit("delete"))
        .when(~same, F.lit("update"))
    )  # NULL for unchanged -> filtered
    pick = lambda c: F.when(new_present, nc_(c)).otherwise(oc_(c))  # noqa: E731
    return (
        j.withColumn(op_col, op)
        .where(F.col(op_col).isNotNull())
        .select(
            *[pick(k).alias(k) for k in key],
            *[pick(c).alias(c) for c in compare],
            op_col,
        )
    )


def scd2_asof(
    scd2: DataFrame,
    as_of: str,
    start_col: str = "valid_from",
    end_col: str = "valid_to",
) -> DataFrame:
    """Point-in-time (AS OF) reconstruction over an SCD Type-2 table:
    the row version whose [valid_from, valid_to) interval covers the
    date.  This is the query-side payoff of keeping history — "what
    did the dimension look like on D" is one partition-prunable filter,
    no joins, no log replay.  With the table partitioned or Z-ordered
    on valid_from, the scan prunes to versions opened before D."""
    d = F.lit(as_of).cast("date")
    return scd2.where((F.col(start_col) <= d) & (F.col(end_col) > d))
