"""Plan-shape assertions: the scale properties the engine claims must
be visible in the physical plan, not just in docstrings."""

from __future__ import annotations

from updating_datasets_data_engineering_spark.plans.audit import analyze
from updating_datasets_data_engineering_spark.registry import queries

Q = queries()


def test_q1_filter_pushdown_and_pruning(spark, sf_dir):
    f = analyze(Q["q1_pricing_summary"](spark, sf_dir))
    assert f.pushed_filters, "date filter must reach the parquet scan"
    assert any("l_shipdate" in p for p in f.pushed_filters)
    # projection pruning: the scan must not read all 11 lineitem columns
    assert f.read_schemas and "l_orderkey" not in f.read_schemas[0]
    assert not f.has_python_udf


def test_q3_broadcasts_dimension(spark, sf_dir):
    f = analyze(Q["q3_shipping_priority"](spark, sf_dir))
    assert f.n_broadcast_joins >= 1, "filtered customer dim must broadcast"
    assert any("c_mktsegment" in p for p in f.pushed_filters)


def test_q5_join_strategy(spark, sf_dir):
    f = analyze(Q["q5_regional_revenue"](spark, sf_dir))
    assert f.n_broadcast_joins >= 3, "region/nation/customer/supplier should broadcast"


def test_merge_anti_join_broadcasts(spark, sf_dir):
    f = analyze(Q["merge_upsert_anti_join"](spark, sf_dir))
    assert f.n_broadcast_joins >= 1, "delta keys must broadcast (archive never shuffles)"


def test_play_parser_is_native(spark, sf_dir):
    """The reference's ten Python UDFs are native expressions here: no
    BatchEvalPython anywhere in the parse/enrich plan."""
    f = analyze(Q["shot_parse"](spark, sf_dir))
    assert not f.has_python_udf
    assert not f.has_arrow_python
    # parse/enrich never shuffles on a KEY; the only exchange allowed is
    # the round-robin source fan-out for the single-row-group fixture
    assert f.n_key_exchanges == 0, "parse/enrich must not key-shuffle"
    assert f.n_exchanges <= 1, "at most the source fan-out exchange"


def test_flagship_no_python(spark, sf_dir):
    f = analyze(Q["shot_team_summary"](spark, sf_dir))
    assert not f.has_python_udf


def test_multimodal_uses_arrow_not_row_python(spark, sf_dir):
    f = analyze(Q["multimodal_features"](spark, sf_dir))
    assert f.has_arrow_python, "decode path must be Arrow-batched mapInPandas"
    assert not f.has_python_udf


def test_text_metrics_map_only(spark, sf_dir):
    f = analyze(Q["text_metrics"](spark, sf_dir))
    # no key shuffle — the only exchange allowed is the round-robin
    # source fan-out for the single-row-group fixture
    assert f.n_key_exchanges == 0
    assert f.n_exchanges <= 1
    assert not f.has_python_udf


def test_bucketed_flagship_archive_window_no_exchange(spark, sf_dir):
    """VERDICT r1 item 5 done-criterion: the archive-side dedup window
    of the bucketed flagship runs on the bucketed scan with ZERO
    Exchange — the archive never shuffles; survivors leave via a
    broadcast anti-join."""
    import re

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from updating_datasets_data_engineering_spark.operators import merge as M

    Q["shot_team_summary_bucketed"](spark, sf_dir).collect()  # lays out the table
    tname = "shot_archive_bucketed_" + re.sub(
        r"[^0-9A-Za-z]", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1]
    )
    archive = spark.table(tname)
    w = Window.partitionBy(*M.SHOT_KEY).orderBy("play", "winner", "x", "y")
    best = archive.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    f = analyze(best)
    assert f.n_exchanges == 0, "bucketed archive window must not shuffle"

    full = analyze(Q["shot_team_summary_bucketed"](spark, sf_dir))
    assert full.n_broadcast_joins >= 1, "delta keys must broadcast into the anti-join"
    assert not full.has_python_udf


def test_contamination_benchmark_broadcasts(spark, sf_dir):
    """The benchmark slice must broadcast — the corpus scan stays
    map-only at any scale (eval sets are tiny vs the corpus)."""
    f = analyze(Q["docs_contamination"](spark, sf_dir))
    assert f.n_broadcast_joins >= 1, "benchmark shingles must broadcast"
    assert not f.has_python_udf


def test_redact_is_map_only_codegen(spark, sf_dir):
    """Regex redaction is pure projection: no key shuffle, no Python —
    whole-stage codegen end to end (at most the source fan-out)."""
    df = Q["text_redact"](spark, sf_dir)
    # the source fan-out exchange makes the plan adaptive, and an
    # unexecuted AdaptiveSparkPlan prints no codegen ids — execute
    # THIS df's queryExecution (count() would plan a separate one)
    # so the finalized plan exposes the WholeStageCodegen spans
    df.collect()
    f = analyze(df)
    assert f.n_key_exchanges == 0
    assert not f.has_python_udf
    assert not f.has_arrow_python
    assert f.n_codegen_stages >= 1


def test_repetition_no_join_shuffle_beyond_aggregates(spark, sf_dir):
    """Repetition metrics: bigram explode is map-side; the only key
    exchanges are the two hash aggregates + the final doc_id stat join
    (co-partitioned after the first aggregate)."""
    f = analyze(Q["docs_repetition"](spark, sf_dir))
    assert not f.has_python_udf
    assert f.n_key_exchanges <= 3


def test_incremental_dedup_scans_index_not_rebands(spark, sf_dir, tmp_path):
    """VERDICT r4 item 1 done-criterion: with a persisted archive index,
    the incremental dedup plan SCANS the index parquet and bands only
    the delta — the archive-side minhash/banding expressions (concat_ws
    band keys) must vanish from the plan."""
    from pyspark.sql import functions as F

    from updating_datasets_data_engineering_spark.operators import dedup as D
    from updating_datasets_data_engineering_spark.plans.audit import formatted_plan
    from updating_datasets_data_engineering_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    archive = docs.where(F.col("doc_id") % 10 != 0)
    delta = docs.where(F.col("doc_id") % 10 == 0)

    idx_path = str(tmp_path / "minhash_index")
    D.minhash_band_index(D.minhash_features(archive, ngram=3), 16, 4).write.parquet(
        idx_path
    )
    # materialize=False: identical dataflow, but skips the internal
    # localCheckpoints whose RDD-scan placeholders would hide the index
    # scan from explain()
    with_index = D.incremental_minhash_pairs(
        archive, delta, ngram=3,
        archive_index=spark.read.parquet(idx_path), materialize=False,
    )
    rebanding = D.incremental_minhash_pairs(archive, delta, ngram=3, materialize=False)

    p_idx = formatted_plan(with_index)
    p_full = formatted_plan(rebanding)
    assert "minhash_index" in p_idx, "index parquet must be scanned"
    # banding expressions only for the delta: strictly fewer band-key
    # builders than the re-banding variant (which bands the archive too)
    assert p_idx.count("concat_ws") < p_full.count("concat_ws")
    # both paths emit the identical pair set (probe ≡ re-band)
    key = lambda r: (r.id_a, r.id_b, r.jaccard)  # noqa: E731
    assert sorted(map(key, with_index.collect())) == sorted(
        map(key, rebanding.collect())
    )


def test_q21_semi_anti_join_decomposition(spark, sf_dir):
    """Q21's EXISTS/NOT-EXISTS must decompose into semi/anti joins (no
    correlated re-execution) with the supplier dim broadcast."""
    import re

    from updating_datasets_data_engineering_spark.plans.audit import formatted_plan

    plan = formatted_plan(Q["q21_waiting_suppliers"](spark, sf_dir))
    assert re.search(r"Join LeftSemi|BroadcastHashJoin.*LeftSemi", plan, re.S)
    assert re.search(r"Join LeftAnti|BroadcastHashJoin.*LeftAnti", plan, re.S)
    f = analyze(Q["q21_waiting_suppliers"](spark, sf_dir))
    assert f.n_broadcast_joins >= 1
    assert not f.has_python_udf


def test_q20_supplier_never_shuffles(spark, sf_dir):
    """The outer supplier probe is a broadcast LeftSemi — only the
    lineitem aggregates shuffle."""
    f = analyze(Q["q20_dominant_suppliers"](spark, sf_dir))
    assert f.n_broadcast_joins >= 2, "part semi + supplier probe broadcast"
    assert not f.has_python_udf


def test_tfidf_window_formulation_is_lean(spark, sf_dir):
    """TF-IDF: df and doc-length are WINDOW aggregates over the single
    (doc, term) frame, not self-joins — the join formulation measured
    12 exchanges, the window one 7; no SMJ, no Python."""
    f = analyze(Q["docs_tfidf_keywords"](spark, sf_dir))
    assert f.n_exchanges <= 8
    assert f.n_sortmerge_joins == 0
    assert not f.has_python_udf


def test_repeated_spans_single_aggregate_shape(spark, sf_dir):
    """Repeated-span detection is chunk → explode → ONE span aggregate:
    no joins, no Python."""
    f = analyze(Q["docs_repeated_spans"](spark, sf_dir))
    assert f.n_broadcast_joins == 0 and f.n_sortmerge_joins == 0
    assert not f.has_python_udf


def test_mixture_rebalance_broadcasts_rates(spark, sf_dir):
    """The per-source rate summary is tiny at any corpus size — it must
    come back as a broadcast join so the corpus pass never shuffles on
    source (a low-cardinality, skew-prone key)."""
    f = analyze(Q["docs_mixture_rebalance"](spark, sf_dir))
    assert f.n_broadcast_joins >= 1, "keep-rate summary must broadcast"
    assert f.n_sortmerge_joins == 0, "corpus must not sort-merge on source"
    assert not f.has_python_udf


def test_shuffle_shards_single_key_exchange(spark, sf_dir):
    """Deterministic global shuffle: exactly one key shuffle (the
    in-shard window) — the md5 shard key is uniform by construction."""
    f = analyze(Q["docs_shuffle_shards"](spark, sf_dir))
    assert f.n_key_exchanges == 1
    assert not f.has_python_udf


def test_retention_cohorts_two_key_exchanges(spark, sf_dir):
    """Cohort matrix = user-partition window + one aggregate: two key
    shuffles, no join back to the events scan."""
    f = analyze(Q["events_retention_cohorts"](spark, sf_dir))
    assert f.n_key_exchanges <= 3  # user window + agg (+ distinct expand)
    assert f.n_sortmerge_joins == 0 and f.n_broadcast_joins == 0
    assert not f.has_python_udf


def test_quantize_stats_broadcast(spark, sf_dir):
    """The 64-row per-dimension stats frame must broadcast — the coding
    pass over the corpus is map-only at any scale."""
    f = analyze(Q["embedding_quantize"](spark, sf_dir))
    assert f.n_broadcast_joins >= 1
    assert f.n_sortmerge_joins == 0
    assert not f.has_python_udf


def test_incremental_containment_scans_state_not_reshingles(spark, sf_dir, tmp_path):
    """VERDICT r7 item 6 done-criterion: the containment delta probe
    SCANS the persisted posting/df/sizes state and shingles only the
    delta — the archive-side shingle builders must vanish — and its
    output equals the full recompute restricted to delta-endpoint
    pairs (the documented contract)."""
    from pyspark.sql import functions as F

    from updating_datasets_data_engineering_spark.operators import dedup as D
    from updating_datasets_data_engineering_spark.plans.audit import formatted_plan
    from updating_datasets_data_engineering_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    archive = docs.where(F.col("doc_id") % 10 != 0)
    delta = docs.where(F.col("doc_id") % 10 == 0)

    post_path = str(tmp_path / "cont_posting")
    D.containment_posting(archive).write.parquet(post_path)
    posting = spark.read.parquet(post_path)
    df_path = str(tmp_path / "cont_df")
    D.containment_df(posting).write.parquet(df_path)
    sizes_path = str(tmp_path / "cont_sizes")
    D.containment_sizes(posting).write.parquet(sizes_path)

    probe = D.incremental_containment_pairs(
        delta,
        posting,
        spark.read.parquet(df_path),
        spark.read.parquet(sizes_path),
        threshold=0.5,
        max_df=100,
    )
    batch = D.containment_pairs(docs, threshold=0.5, max_df=100)

    import re

    p_probe = formatted_plan(probe)
    assert "cont_posting" in p_probe, "posting state parquet must be scanned"
    assert "cont_df" in p_probe, "df sketch parquet must be scanned"
    assert "cont_sizes" in p_probe, "sizes state parquet must be scanned"
    # exactly ONE shingle builder (the tracked_persist cache collapses
    # reuse), and the only documents scan feeding it carries the delta
    # filter — the archive text is never re-shingled
    assert p_probe.count("concat_ws") == 1
    doc_scans = re.findall(r"Scan parquet[^\n]*\n(?:[^\n]*\n)*?Location:[^\n]*documents", p_probe)
    assert len(doc_scans) == 1, "probe must read documents exactly once (the delta)"
    assert re.search(r"\(doc_id#\d+L % 10\) = 0", p_probe), "delta filter must gate the scan"

    key = lambda r: (r.id_a, r.id_b, r.containment)  # noqa: E731
    want = [
        key(r)
        for r in batch.collect()
        if r.id_a % 10 == 0 or r.id_b % 10 == 0
    ]
    assert sorted(map(key, probe.collect())) == sorted(want)
