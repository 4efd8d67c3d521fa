"""The bench's HEADLINE list is hand-ordered (display grouping), which
makes it hand-maintained — and in the round-9 continuation it silently
missed six newborn specs until the artifact's query count exposed it.
Pin the invariant: every registered spec is benched except the explicit
quarantine, and every benched name exists."""

from __future__ import annotations

import bench
from updating_datasets_data_engineering_spark.registry import SPECS


def test_headline_covers_registry_minus_quarantine():
    names = {s.name for s in SPECS}
    missing = names - set(bench.HEADLINE) - bench.BENCH_QUARANTINE
    assert not missing, f"registered specs absent from bench HEADLINE: {missing}"


def test_headline_has_no_ghosts_or_dupes():
    names = {s.name for s in SPECS}
    extra = set(bench.HEADLINE) - names
    assert not extra, f"bench HEADLINE names not in the registry: {extra}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_quarantine_is_registered_and_minimal():
    names = {s.name for s in SPECS}
    assert bench.BENCH_QUARANTINE <= names
    # the quarantine exists for exactly the documented O(n^2) baseline
    assert bench.BENCH_QUARANTINE == {"embedding_near_dup"}


def test_sf1_and_exp_subsets_are_registered():
    names = {s.name for s in SPECS}
    assert set(bench.SF1_HEADLINE) <= names
    assert set(bench.EXP_HEADLINE) <= names
