"""Tracked persistence: every operator-internal ``.persist()`` goes
through :func:`tracked_persist` so a long-lived session (the grading
driver runs an 80-query registry; a streaming job runs foreachBatch
merges indefinitely) can release cached partitions once the consuming
action finishes, instead of relying on LRU eviction of
MEMORY_AND_DISK storage (ADVICE r2 item 3).

The operators themselves only BUILD plans — the action that consumes a
persisted frame happens in the caller — so the release points are the
natural plan-lifecycle boundaries:

  * the registry wraps each query builder to release the PREVIOUS
    query's frames before building the next (by then the driver has
    collected the previous result, so its caches are dead);
  * the streaming foreachBatch upsert releases after each batch's
    archive swap completes;
  * tests/benchmarks may call :func:`release_tracked` directly.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame

# Weak references: tracking must not keep a plan (and its lineage)
# alive after the caller drops it.
_TRACKED: list[weakref.ref] = []


def tracked_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist()`` that registers the frame for later release."""
    out = df.persist(storage_level) if storage_level is not None else df.persist()
    _TRACKED.append(weakref.ref(out))
    return out


def release_tracked(blocking: bool = False) -> int:
    """Unpersist every tracked frame still alive; returns how many."""
    released = 0
    for ref in _TRACKED:
        df = ref()
        if df is not None:
            try:
                df.unpersist(blocking)
                released += 1
            except Exception:
                pass  # session already stopped — nothing to release
    _TRACKED.clear()
    return released
