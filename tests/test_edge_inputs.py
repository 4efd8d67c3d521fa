"""Edge-input robustness: operators must behave on empty/degenerate
inputs, not just the happy-path fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from updating_datasets_data_engineering_spark.operators import dedup as D
from updating_datasets_data_engineering_spark.operators import merge as M
from updating_datasets_data_engineering_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id LONG, text STRING, lang STRING, n_chars LONG")


def test_merge_with_empty_delta(spark):
    archive = spark.createDataFrame([Row(game_id="G1", time_remaining="1:00.0", quarter="1", v=1)])
    delta = spark.createDataFrame([], archive.schema)
    out = M.merge_deterministic(archive, delta)
    assert out.count() == 1
    out2 = M.merge_anti_join(archive, delta)
    assert out2.count() == 1


def test_merge_with_empty_archive(spark):
    delta = spark.createDataFrame([Row(game_id="G1", time_remaining="1:00.0", quarter="1", v=1)])
    archive = spark.createDataFrame([], delta.schema)
    assert M.merge_deterministic(archive, delta).count() == 1


def test_dedup_on_empty(empty_docs):
    assert D.dedup_exact(empty_docs).count() == 0
    assert D.minhash_lsh_pairs(empty_docs, ngram=3).count() == 0
    assert D.simhash_groups(empty_docs).count() == 0
    assert D.ngram_jaccard_pairs(empty_docs, ngram=3).count() == 0


def test_dedup_empty_and_short_texts(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="", lang="en", n_chars=0),
            Row(doc_id=2, text="one", lang="en", n_chars=3),
            Row(doc_id=3, text="one", lang="en", n_chars=3),
        ]
    )
    groups = D.dedup_exact(docs)
    dup = groups.where(F.col("n_copies") > 1).collect()
    assert len(dup) == 1 and dup[0]["keep_id"] == 2
    # simhash: empty text -> signature 0, still grouped (not dropped)
    sigs = D.simhash_signatures(docs)
    assert sigs.count() == 3
    assert sigs.where(F.col("doc_id") == 1).collect()[0]["simhash"] == 0


def test_topk_with_k_larger_than_corpus(spark):
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(i), 1.0]) for i in range(3)]
    )
    out = SIM.brute_force_topk(emb, emb.where(F.col("vec_id") == 0), k=10)
    assert out.count() == 2  # only 2 possible neighbors — no padding, no error


def test_parser_none_play(spark):
    from updating_datasets_data_engineering_spark.functions import play_parser as P

    df = spark.createDataFrame(
        [Row(play=None, winner="A", loser="B")], "play STRING, winner STRING, loser STRING"
    )
    rows = P.enrich(df).collect()
    assert len(rows) == 1  # null play -> null derived columns, no crash


def test_bigrams_degenerate_texts(spark):
    from updating_datasets_data_engineering_spark.functions.text import bigrams

    df = spark.createDataFrame(
        [Row(t=""), Row(t="one"), Row(t="  two   words  "), Row(t=None)],
        "t STRING",
    )
    rows = {r["t"]: r["b"] for r in df.select(F.col("t"), bigrams(F.col("t")).alias("b")).collect()}
    assert rows[""] == []
    assert rows["one"] == []
    assert rows["  two   words  "] == ["two words"]
    assert rows[None] in (None, [])  # null text degrades safely, no crash


def test_repetition_single_word_docs_drop_consistently(spark):
    """Docs with < 2 words produce no bigrams and are absent from the
    repetition output on BOTH engines (inner join after explode) —
    the deliberate, oracle-consistent semantics."""
    from pyspark.sql import functions as F2

    from updating_datasets_data_engineering_spark.functions.text import bigrams

    df = spark.createDataFrame([Row(doc_id=1, text="solo"), Row(doc_id=2, text="a b a b")])
    exploded = df.select("doc_id", F2.explode(bigrams(F2.col("text"))).alias("g"))
    assert [r["doc_id"] for r in exploded.select("doc_id").distinct().collect()] == [2]


def test_redact_handles_no_pii_and_multiple_hits(spark):
    from updating_datasets_data_engineering_spark import oracles_ext as OE

    df = spark.createDataFrame(
        [
            Row(t="nothing sensitive here"),
            Row(t="a@b.co and c.d@e-f.org plus 123456789 and 9999"),
        ]
    )
    t1 = F.regexp_replace(F.col("t"), OE.EMAIL_RE, "<EMAIL>")
    out = df.select(
        F.regexp_count(F.col("t"), F.lit(OE.EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t1, F.lit(OE.LONGNUM_RE)).alias("n_nums"),
        F.regexp_replace(t1, OE.LONGNUM_RE, "<NUM>").alias("red"),
    ).collect()
    assert (out[0]["n_emails"], out[0]["n_nums"]) == (0, 0)
    assert out[0]["red"] == "nothing sensitive here"
    assert (out[1]["n_emails"], out[1]["n_nums"]) == (2, 2)
    assert out[1]["red"] == "<EMAIL> and <EMAIL> plus <NUM> and <NUM>"


def test_incremental_minhash_empty_delta(spark):
    """An empty delta must produce zero new pairs (and not error in the
    broadcast probe or the semi-join prune)."""
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="alpha beta gamma delta epsilon zeta") for i in range(5)]
    )
    empty = spark.createDataFrame([], docs.schema)
    out = D.incremental_minhash_pairs(docs, empty, ngram=3)
    assert out.count() == 0


def test_incremental_minhash_archive_empty(spark):
    """Day-zero bootstrap: all docs are delta — every near-dup pair is
    'new', matching the full-corpus run exactly."""
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog today"),
            Row(doc_id=2, text="the quick brown fox jumps over the lazy dog today"),
            Row(doc_id=3, text="completely different words entirely here now"),
        ]
    )
    empty = spark.createDataFrame([], docs.schema)
    inc = D.incremental_minhash_pairs(empty, docs, ngram=3)
    full = D.minhash_lsh_pairs(docs, ngram=3)
    key = lambda r: (r.id_a, r.id_b, r.jaccard)  # noqa: E731
    assert sorted(map(key, inc.collect())) == sorted(map(key, full.collect()))
    assert inc.count() == 1  # the identical pair (1,2)


def test_incremental_simhash_empty_delta(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="alpha beta gamma") for i in range(4)]
    )
    empty = spark.createDataFrame([], docs.schema)
    out = D.incremental_simhash_groups(docs, empty)
    assert out.count() == 0  # no touched signatures


def test_ivf_cells_passthrough_equals_rebuild(spark):
    """Passing a precomputed (persisted) cell assignment must be
    bit-identical to the in-query rebuild — the incremental index
    append's correctness argument."""
    import random

    random.seed(7)
    emb = spark.createDataFrame(
        [Row(vec_id=i, embedding=[random.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    )
    q = emb.where(F.col("vec_id") < 2)
    cells = SIM.ivf_assign_cells(emb, n_cells=4)
    via_cells = SIM.ivf_ann_topk(emb, q, k=3, n_cells=4, n_probe=2, cells=cells)
    rebuilt = SIM.ivf_ann_topk(emb, q, k=3, n_cells=4, n_probe=2)
    key = lambda r: (r.query_id, r.rank, r.neighbor_id, r.cos_sim)  # noqa: E731
    assert sorted(map(key, via_cells.collect())) == sorted(map(key, rebuilt.collect()))


def test_minhash_banding_drops_empty_feature_docs(spark):
    """Skew guard: empty-token docs must produce ZERO banded index rows
    (they'd otherwise all share band key "" — one quadratic hot bucket
    at corpus scale) while the pair output is unchanged (empty sets
    have Jaccard 0 and can never verify)."""
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=""), Row(doc_id=2, text=""), Row(doc_id=3, text="a b c d")]
    )
    toks = D.minhash_features(docs, ngram=3)
    banded = D.minhash_band_index(toks)
    assert banded.count() == 4  # only doc 3 (1 band set of 4), not 12
    assert banded.where(F.col("id").isin(1, 2)).count() == 0
    assert D.minhash_lsh_pairs(docs, ngram=3).count() == 0


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_retract_with_empty_delete_set_is_identity(spark):
    """An empty tombstone batch must leave labels and indexes unchanged."""
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g"), (3, "x y z w v u t")],
        "doc_id long, text string",
    )
    pairs = D.minhash_lsh_pairs(docs, ngram=3)
    labels = D.connected_components(pairs)
    empty = spark.createDataFrame([], "doc_id long")
    assert _rows(D.retract_from_components(labels, pairs, empty)) == _rows(labels)
    band = D.minhash_band_index(D.minhash_features(docs, "doc_id", "text", 3), 16, 4)
    assert _rows(D.retract_index_rows(band, empty, "id")) == _rows(band)


def test_retract_unknown_id_is_noop(spark):
    """Deleting an id that was never indexed must change nothing."""
    docs = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "a b c d e f g")], "doc_id long, text string"
    )
    pairs = D.minhash_lsh_pairs(docs, ngram=3)
    labels = D.connected_components(pairs)
    ghost = spark.createDataFrame([(999,)], "doc_id long")
    assert _rows(D.retract_from_components(labels, pairs, ghost)) == _rows(labels)


def test_retract_bridge_doc_splits_cluster(spark):
    """The case star re-encoding cannot express: A~B and B~C (but not
    A~C) form one cluster through bridge B; deleting B must SPLIT the
    cluster, leaving A and C unpaired (dropped from the store)."""
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "id long, cluster_id long"
    )
    pair_log = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    deleted = spark.createDataFrame([(2,)], "doc_id long")
    got = D.retract_from_components(labels, pair_log, deleted)
    # no surviving pairs -> neither 1 nor 3 is emitted (singleton
    # convention), and 2 is gone
    assert got.count() == 0


def test_retract_partial_split_keeps_surviving_edge(spark):
    """Cluster {1,2,3,4} with edges 1-2, 2-3, 3-4: deleting 2 must
    leave exactly the component {3,4} (via the surviving 3-4 edge)."""
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 1)], "id long, cluster_id long"
    )
    pair_log = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id_a long, id_b long"
    )
    deleted = spark.createDataFrame([(2,)], "doc_id long")
    got = {(r["id"], r["cluster_id"]) for r in
           D.retract_from_components(labels, pair_log, deleted).collect()}
    assert got == {(3, 3), (4, 3)}


def test_salt_grid_with_no_oversized_buckets_matches_plain(spark):
    """bucket_cap higher than every bucket size must leave the plan's
    RESULTS identical to the plain join (the guard arms only on
    oversized buckets)."""
    docs = spark.createDataFrame(
        [(i, f"some unique text {i} with shared words") for i in range(20)],
        "doc_id long, text string",
    )
    plain = D.minhash_lsh_pairs(docs, ngram=3)
    capped = D.minhash_lsh_pairs(docs, ngram=3, bucket_cap=10_000, n_salts=4)
    assert _rows(capped) == _rows(plain)


def test_compact_batch_index_idempotent(spark, tmp_path):
    """Compacting an already-compacted index is a no-op in content and
    leaves one partition tier."""
    from updating_datasets_data_engineering_spark.operators import maintenance as MNT

    path = str(tmp_path / "idx")
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 3).alias("_batch_id")
    )
    df.write.partitionBy("_batch_id").parquet(path)
    MNT.compact_batch_index(spark, path)
    first = _rows(spark.read.parquet(path))
    MNT.compact_batch_index(spark, path)
    assert _rows(spark.read.parquet(path)) == first
    assert spark.read.parquet(path).select("_batch_id").distinct().count() == 1


def test_connected_components_long_chain_converges(spark):
    """Adversarial CHAIN of near-dups: plain min-label propagation
    needs diameter rounds (a 60-node path would blow the 15-round cap
    and raise); the pointer-jumping rounds added after round 4 converge
    in O(log d).  All nodes must label to the chain's minimum."""
    n = 60
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    labels = D.connected_components(pairs)
    got = {(r["id"], r["cluster_id"]) for r in labels.collect()}
    assert got == {(i, 0) for i in range(n)}


def test_connected_components_two_chains_and_a_clique(spark):
    """Mixed topology: two disjoint chains plus a dense clique must
    each close to their own minimum."""
    rows = [(i, i + 1) for i in range(0, 19)]          # chain 0..19
    rows += [(100 + i, 101 + i) for i in range(0, 19)]  # chain 100..119
    rows += [(200 + a, 200 + b) for a in range(5) for b in range(a + 1, 5)]
    pairs = spark.createDataFrame(rows, "id_a long, id_b long")
    got = {(r["id"], r["cluster_id"]) for r in D.connected_components(pairs).collect()}
    expect = {(i, 0) for i in range(20)}
    expect |= {(100 + i, 100) for i in range(20)}
    expect |= {(200 + i, 200) for i in range(5)}
    assert got == expect


def test_hll_within_rsd_of_exact(spark, sf_dir):
    """The HLL estimate itself cannot be hash-compared across engines,
    so the graded spec returns the exact anchor plus a Spark-evaluated
    ``within_5pct`` boolean (VERDICT r10 item 4).  This test pins the
    TIGHTER raw bound the boolean's 5% contract rides on: every
    per-type ``approx_count_distinct(rsd=0.02)`` estimate within 5% of
    exact countDistinct (2.5x headroom on the sketch's rsd), plus the
    graded columns themselves — exact anchor equal to countDistinct
    and the boolean true everywhere."""
    from pyspark.sql import functions as F

    from updating_datasets_data_engineering_spark.registry import queries
    from updating_datasets_data_engineering_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    approx = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n"))
        .collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for t, n in exact.items():
        assert abs(approx[t] - n) <= max(1, 0.05 * n), (t, approx[t], n)
    graded = queries()["events_user_count_approx"](spark, sf_dir).collect()
    assert {r["event_type"] for r in graded} == set(exact)
    for r in graded:
        assert r["exact_users"] == exact[r["event_type"]]
        assert r["within_5pct"] is True, r


def test_semantic_retract_noop_tombstones(spark):
    """Tombstones matching nothing must leave every flag byte-frozen
    (affected-cell set empty -> the re-verify leg runs on an empty
    frame and the union is exactly the state)."""
    import math

    rows = [
        Row(vec_id=i, embedding=[math.cos(i * 0.7 + d) for d in range(8)])
        for i in range(40)
    ]
    corpus = spark.createDataFrame(rows)
    state = SIM.semantic_dedup(corpus, n_cells=4, threshold=0.95)
    tombs = spark.createDataFrame([Row(vec_id=10_000)])
    out = SIM.semantic_dedup_retract(corpus, state, tombs, threshold=0.95)
    a = sorted(tuple(r) for r in state.collect())
    b = sorted(tuple(r) for r in out.collect())
    assert a == b


def test_semantic_retract_delete_everything_in_a_cell(spark):
    """Deleting every member of a cell yields no survivors from it and
    leaves other cells frozen."""
    import math

    rows = [
        Row(vec_id=i, embedding=[math.cos(i * 0.7 + d) for d in range(8)])
        for i in range(40)
    ]
    corpus = spark.createDataFrame(rows)
    state = SIM.semantic_dedup(corpus, n_cells=4, threshold=0.95)
    by_cell = {}
    for r in state.collect():
        by_cell.setdefault(r["cell"], []).append(r["vec_id"])
    cell, members = sorted(by_cell.items())[0]
    tombs = spark.createDataFrame([Row(vec_id=v) for v in members])
    out = SIM.semantic_dedup_retract(corpus, state, tombs, threshold=0.95)
    got = {r["vec_id"]: (r["cell"], r["is_dup"]) for r in out.collect()}
    assert not any(c == cell for c, _ in got.values())
    want = {
        r["vec_id"]: (r["cell"], r["is_dup"])
        for r in state.collect()
        if r["cell"] != cell
    }
    assert got == want
