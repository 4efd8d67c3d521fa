"""Property-based lifecycle checks for the BM25 and semantic-dedup
families: on random corpora, the incremental merge and the tombstone
subtraction must each equal the from-scratch rebuild their DuckDB
oracles encode — re-derived here with independent DataFrame ops on
arbitrary inputs (the fixture parity tests pin one corpus; these pin
the algebra)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from updating_datasets_data_engineering_spark.operators import similarity as SIM
from updating_datasets_data_engineering_spark.queries.indexes import (
    _BM25_NQ,
    _bm25_rank,
    bm25_incremental_rank,
    bm25_retract_rank,
)

VOCAB = [f"w{i}" for i in range(12)]

# a corpus is 4-10 docs of 3-10 tokens over a 12-word vocab — small
# enough that df ties, delta-only terms, and last-holder drop-out all
# actually occur across examples
corpus_strategy = st.lists(
    st.lists(st.integers(min_value=0, max_value=11), min_size=3, max_size=10),
    min_size=4,
    max_size=10,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _tf(docs):
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    return toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )


def _states(tf):
    adf = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("adf"))
    adl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    astats = adl.agg(
        F.count(F.lit(1)).cast("long").alias("an"),
        F.sum("dl").cast("long").alias("asumdl"),
    )
    return adf, adl, astats


def _batch(tf):
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    qterms = dfreq.orderBy(F.col("df").desc(), "term").limit(_BM25_NQ)
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.avg("dl").alias("avgdl")
    )
    return _bm25_rank(tf.join(F.broadcast(qterms), "term"), dl, stats)


def _build(spark, word_lists):
    rows = [
        (i, " ".join(VOCAB[w] for w in words)) for i, words in enumerate(word_lists)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@settings(max_examples=10, deadline=None)
@given(corpus_strategy, st.integers(min_value=1, max_value=4))
def test_bm25_incremental_equals_rebuild(spark, word_lists, mod):
    # mod=1 -> archive EMPTY: the day-one case where the state
    # aggregates yield (an=0, asumdl=NULL) and must not poison avgdl
    docs = _build(spark, word_lists)
    archive = docs.where(F.col("doc_id") % mod != 0)
    delta = docs.where(F.col("doc_id") % mod == 0)
    got = bm25_incremental_rank(
        _tf(archive), *_states(_tf(archive)), _tf(delta)
    )
    want = _batch(_tf(docs))
    assert _rows(got) == _rows(want)


@settings(max_examples=10, deadline=None)
@given(corpus_strategy, st.integers(min_value=2, max_value=4))
def test_bm25_retract_equals_survivor_rebuild(spark, word_lists, mod):
    docs = _build(spark, word_lists)
    tombs = docs.where(F.col("doc_id") % mod == 1)
    survivors = docs.where(F.col("doc_id") % mod != 1)
    got = bm25_retract_rank(_tf(docs), *_states(_tf(docs)), _tf(tombs))
    want = _batch(_tf(survivors))
    assert _rows(got) == _rows(want)


# vectors: 4-dim int grids so cosine ties are exact and clusters form;
# ids 0..n-1, centroids = ids < 2 (n_cells=2) — tombstones never touch
# them (the documented rebuild contract)
vec_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-3, max_value=3),
        st.integers(min_value=-3, max_value=3),
        st.integers(min_value=-3, max_value=3),
        st.integers(min_value=1, max_value=3),
    ),
    min_size=5,
    max_size=12,
)


@settings(max_examples=10, deadline=None)
@given(vec_strategy, st.integers(min_value=2, max_value=3))
def test_semantic_retract_equals_survivor_recompute(spark, vecs, mod):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    state = SIM.semantic_dedup(corpus, n_cells=2, threshold=0.9)
    # tombstones: ids >= 2 only (centroid deletes trip a rebuild, not
    # the incremental path — same contract the graded query documents)
    tombs = corpus.where(
        (F.col("vec_id") % mod == 0) & (F.col("vec_id") >= 2)
    ).select("vec_id")
    got = SIM.semantic_dedup_retract(corpus, state, tombs, threshold=0.9)
    survivors = corpus.join(tombs, "vec_id", "left_anti")
    want = SIM.semantic_dedup(survivors, n_cells=2, threshold=0.9)
    assert _rows(got) == _rows(want)


def test_bm25_incremental_day_one_empty_archive(spark):
    """Deterministic pin of the mod=1 draw: with NO archive (day-one
    state: count aggregates yield an=0, asumdl=NULL), the incremental
    path must equal the batch build of the delta alone — and produce
    real scores, not NULL-poisoned ones."""
    docs = _build(spark, [[0, 1, 2, 0], [1, 2, 3], [0, 3, 4, 5, 1]])
    empty = docs.where(F.lit(False))
    got = bm25_incremental_rank(_tf(empty), *_states(_tf(empty)), _tf(docs))
    want = _batch(_tf(docs))
    rows = _rows(got)
    assert rows == _rows(want)
    assert rows and all(r[2] is not None for r in rows), "NULL scores"
