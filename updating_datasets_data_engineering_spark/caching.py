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

from contextlib import contextmanager

from pyspark.sql import DataFrame

# STRONG references (ADVICE r3): operators drop their local DataFrame
# variables when they return, so a weakref here is dead long before the
# release point and release_tracked() would be a verified no-op while
# the JVM CacheManager kept the partitions.  Strong refs cannot leak
# past a release because every release point clears the list; between
# releases the held objects are a handful of lightweight plan handles,
# not data.
_TRACKED: list[DataFrame] = []


def tracked_persist(df: DataFrame, storage_level=None) -> DataFrame:
    """``df.persist()`` that registers the frame for later release."""
    out = df.persist(storage_level) if storage_level is not None else df.persist()
    _TRACKED.append(out)
    return out


def release_tracked(blocking: bool = False) -> int:
    """Unpersist every tracked frame; returns how many were released."""
    return _release(_TRACKED, blocking)


def _release(frames: list[DataFrame], blocking: bool = False) -> int:
    released = 0
    for df in frames:
        try:
            df.unpersist(blocking)
            released += 1
        except Exception:
            pass  # session already stopped — nothing to release
    frames.clear()
    return released


@contextmanager
def scope(blocking: bool = False):
    """Scoped release (ADVICE r4): unpersist only the frames tracked
    INSIDE this block, even if the block raises.

    ``release_tracked()`` clears the whole module-global list, so a
    foreachBatch calling it could unpersist frames a concurrent query
    in the same driver had just cached (silent recompute), and a batch
    that raised before its release point leaked its caches.  A scope
    snapshots the list position on entry and, in a ``finally``, releases
    exactly the suffix appended since — frames tracked before the scope
    are left alone.  (If a concurrent thread interleaves appends into
    the suffix its frames are released early — a recompute, never a
    wrong result; single-threaded callers get exact scoping.)
    """
    mark = len(_TRACKED)
    try:
        yield
    finally:
        suffix = _TRACKED[mark:]
        del _TRACKED[mark:]
        _release(suffix, blocking)
