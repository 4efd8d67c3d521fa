"""Graph-tier tests: PageRank invariants, native Bloom-filter
semantics, and skyline correctness against a brute-force dominance
check (the oracle SQL gates the registry queries; these pin the
operator-level properties the oracle can't see)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from updating_datasets_data_engineering_spark.operators import graph as G
from updating_datasets_data_engineering_spark.registry import queries

Q = queries()


def _edges(spark, pairs):
    return spark.createDataFrame(
        [Row(user_a=a, user_b=b) for a, b in pairs]
    )


def test_pagerank_mass_conserved(spark):
    """With symmetric edges there are no dangling nodes, so total rank
    mass stays 1.0 every iteration (modulo the 12-decimal state
    rounding)."""
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 1)])
    out = G.pagerank(edges, "user_a", "user_b", iters=3).collect()
    assert len(out) == 5
    assert abs(sum(r.rank for r in out) - 1.0) < 1e-6


def test_pagerank_star_center_ranks_highest(spark):
    """On a star graph the hub must outrank every leaf, and leaves are
    symmetric (identical rank)."""
    edges = _edges(spark, [(0, i) for i in range(1, 6)])
    out = {r.node: r.rank for r in G.pagerank(edges, "user_a", "user_b").collect()}
    hub = out.pop(0)
    leaves = set(out.values())
    assert len(leaves) == 1, "leaves must be rank-symmetric"
    assert hub > max(leaves)


def test_pagerank_uniform_on_cycle(spark):
    """A cycle is vertex-transitive: every node gets exactly 1/N."""
    n = 6
    edges = _edges(spark, [(i, (i + 1) % n) for i in range(n)])
    out = G.pagerank(edges, "user_a", "user_b").collect()
    for r in out:
        assert r.rank == pytest.approx(1.0 / n, abs=1e-6)
        assert r.degree == 2


def test_bloom_no_false_negatives_and_verify_removes_fps(spark):
    """Every member key must survive the probe (no false negatives);
    with a deliberately tiny filter, false positives appear and the
    exact verify is what removes them — the contract the registry
    probe query relies on."""
    members = spark.range(0, 200).select(
        F.concat(F.lit("key_"), F.col("id")).alias("k")
    )
    others = spark.range(1000, 1400).select(
        F.concat(F.lit("key_"), F.col("id")).alias("k")
    )
    m_bits, k_hashes = 256, 3  # deliberately saturated: FP-rich
    bits = G.bloom_bits(members, "k", m_bits, k_hashes)
    surv_members = G.bloom_probe(members, "k", bits, m_bits, k_hashes)
    assert surv_members.count() == 200, "false negative: member pruned"
    fp = G.bloom_probe(others, "k", bits, m_bits, k_hashes)
    # saturated filter SHOULD pass some non-members through...
    assert fp.count() > 0
    # ...and exact verify (semi join on the true key set) removes them
    verified = fp.join(members, "k", "left_semi")
    assert verified.count() == 0


def test_bloom_bits_bounded_by_m(spark):
    keys = spark.range(0, 5000).select(F.col("id").cast("string").alias("k"))
    m_bits = 128
    bits = G.bloom_bits(keys, "k", m_bits, 3)
    rows = bits.collect()
    assert len(rows) <= m_bits
    assert all(0 <= r.bit < m_bits for r in rows)


def test_skyline_matches_bruteforce(spark, sf_dir):
    """Window-based frontier == O(n²) dominance scan on the same
    distinct points (the plan avoids the quadratic; the semantics must
    not)."""
    out = Q["orders_skyline"](spark, sf_dir).collect()
    from updating_datasets_data_engineering_spark.tables import load_table

    pts = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.col("o_totalprice").alias("price"),
            F.col("o_orderdate").alias("order_date"),
        )
        .count()
        .collect()
    )
    def dominated(p):
        return any(
            q.price <= p.price
            and q.order_date <= p.order_date
            and (q.price < p.price or q.order_date < p.order_date)
            for q in pts
        )

    expect = {(p.price, p.order_date) for p in pts if not dominated(p)}
    got = {(r.price, r.order_date) for r in out}
    assert got == expect
    assert len(got) > 0


def test_skyline_survivors_undominated_mutually(spark, sf_dir):
    """Frontier members must be pairwise incomparable (no survivor
    dominates another) — the defining skyline property."""
    out = Q["orders_skyline"](spark, sf_dir).collect()
    for a in out:
        for b in out:
            if a is b:
                continue
            assert not (
                a.price <= b.price
                and a.order_date <= b.order_date
                and (a.price < b.price or a.order_date < b.order_date)
            )
