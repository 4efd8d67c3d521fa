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


def test_compact_set_is_registered_unique_and_fits():
    """COMPACT_SET (VERDICT r13 item 2) is the deterministic final-line
    subset: every name registered, no dupes, and the serialized line
    fits the driver's ~1900-char capture window at representative value
    widths — so in practice no name is ever trimmed and consecutive
    rounds' compact lines carry the SAME query set."""
    import json

    names = {s.name for s in SPECS}
    assert set(bench.COMPACT_SET) <= names
    assert len(bench.COMPACT_SET) == len(set(bench.COMPACT_SET))
    payload = {
        "metric": "headline_queries_total_runtime",
        "value": 999.999,
        "unit": "sec",
        "floor_probe_s": 9.999,
        "queries": {n: 99.999 for n in bench.COMPACT_SET},
        "n_queries": 999,
        "detail": "BENCH_FULL.json",
        "sf": 0.1,
    }
    assert len(json.dumps(payload, separators=(",", ":"))) <= 1900
