"""The driver grades CORRECTNESS over SPECS[:50] only.

Window policy history:
  * r3 froze the first 50 names (VERDICT r3 item 2) — churn just moves the
    blind spot.
  * r4/r5 rotated exactly ONE slot per round (``dedup_incremental`` in at
    r4, ``docs_boilerplate_strip`` in at r5).
  * r5's VERDICT item 2 observed that at one slot per round the 62 specs
    never driver-graded by end of r5 NEVER converge, and prescribed the
    scheme implemented here: the 20 §2-parity specs are PINNED forever; the
    other 30 slots rotate a deterministic FIVE-spec block per round.

Mechanics (all deterministic, no runtime state):
  * ``ROTATION_BLOCKS`` chunks the never-driver-graded tail — in SPECS
    order as of the r5 snapshot — into blocks of 5.  Round N (N >= 6)
    swaps in block ``N - 6``.
  * Evictions come from ``RESIDENCE_QUEUE`` front-first: the non-pinned
    members of the r5 window in window order (longest-resident first),
    followed by previously-rotated-in blocks in rotation order, so a spec
    rotated in at round K leaves 6 rounds later and every spec is driver
    graded at least once.
  * Specs leaving the window stay oracle-gated by
    ``tests/test_oracle_parity.py`` (all 146 specs, both SFs).

``expected_window(round)`` computes the window for any round, so the judge
can verify both the current window and the whole forward schedule.
"""

from __future__ import annotations

from updating_datasets_data_engineering_spark.registry import SPECS

DRIVER_WINDOW = 50
CURRENT_ROUND = 6

# The 20 reference-parity (§2) specs that never leave the window: every
# shot_*/merge_* parity query, the streaming + incremental + salted
# maintenance flagships, and the four analytics anchors graded since r1.
PINNED_FOREVER = [
    "dedup_incremental",
    "docs_boilerplate_strip",
    "shot_parse",
    "shot_ingest_json",
    "shot_time_typed",
    "merge_dedup_reference",
    "merge_upsert_delta_wins",
    "merge_upsert_anti_join",
    "merge_upsert_with_deletes",
    "merge_schema_drift",
    "shot_team_summary",
    "shot_team_summary_bucketed",
    "streaming_dedup_archive",
    "incremental_events_summary",
    "incremental_avg_distinct",
    "events_type_stats_salted",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_regional_revenue",
    "events_hourly",
]

# Non-pinned members of the r5 frozen window, in r5 window order ==
# residence order (all driver-green r1-r5).  Evictions pop from the front.
R5_ROTATING_RESIDENTS = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "docs_deduplicated",
    "knn_bruteforce",
    "knn_ann_ivf",
    "knn_ann_srp",
    "embedding_near_dup",
    "embedding_near_dup_ann",
    "multimodal_features",
    "text_metrics",
    "text_langid",
    "text_sentiment",
    "text_redact",
    "doc_fingerprints",
    "doc_chunks",
    "docs_sample_stratified",
    "docs_quality_filter",
    "docs_pack_sequences",
    "docs_quality_deciles",
    "docs_repetition",
    "docs_contamination",
    "events_asof_join",
    "events_asof_forward",
    "events_range_join",
    "events_time_rollup",
    "events_range_frame",
    "events_gaps",
]

# The 62 specs never driver-graded in rounds 1-5 (union of
# CORRECTNESS_r01..r05 keys vs the 146-spec registry), in SPECS order as of
# the r5 snapshot, chunked into deterministic blocks of 5.  Block k enters
# the window at round 6 + k.
ROTATION_BLOCKS = [
    # block 0 — round 6
    ["embedding_near_dup_t90", "q21_waiting_suppliers", "q20_dominant_suppliers",
     "q2_min_cost_supplier", "q11_important_stock"],
    # block 1 — round 7
    ["dedup_incremental_simhash", "knn_ann_ivf_incremental", "docs_repeated_spans",
     "docs_tfidf_keywords", "dedup_clusters_incremental"],
    # block 2 — round 8
    ["q8_market_share", "q9_product_profit", "q12_priority_counts",
     "q16_supplier_counts", "dedup_minhash_lsh_salted"],
    # block 3 — round 9
    ["dedup_labels_after_delete", "merge_scd2_customers", "snapshot_diff_orders",
     "events_concurrency", "events_funnel"],
    # block 4 — round 10
    ["events_trend", "dedup_fuzzy_titles", "dedup_semantic",
     "events_retention_cohorts", "events_markov_transitions"],
    # block 5 — round 11
    ["events_anomaly_hours", "embedding_norm_outliers", "docs_mixture_rebalance",
     "docs_shuffle_shards", "orders_profile"],
    # block 6 — round 12
    ["window_function_census", "events_value_histogram", "events_user_count_approx",
     "merge_scd2_asof", "embedding_quantize"],
    # block 7 — round 13
    ["docs_split_assign", "docs_source_cap", "docs_cross_doc_dup_rate",
     "docs_epoch_plan", "events_sliding_active_users"],
    # block 8 — round 14
    ["docs_dataset_card", "docs_unigram_logprob", "sources_overlap_matrix",
     "events_rfm_segments", "users_cooccurrence"],
    # block 9 — round 15
    ["docs_boilerplate_incremental", "docs_delta_quality_scored", "users_pagerank",
     "dedup_delta_bloom_probe", "orders_skyline"],
    # block 10 — round 16
    ["users_triangles", "incremental_value_quantiles", "docs_classifier_score",
     "docs_importance_resample", "docs_bigram_logprob"],
    # block 11 — round 17
    ["users_sig_edges_incremental", "sources_jsd_divergence", "users_communities",
     "users_pagerank_personalized", "incremental_type_quantiles"],
    # block 12 — round 18 (tail block, 2 specs: only 2 evictions that round)
    ["docs_weighted_sample", "docs_weighted_sample_per_source"],
]


def expected_window(round_no: int) -> list[str]:
    """Window contents for ``round_no`` >= 6 under the rotation policy.

    Incoming blocks are prepended (newest block leads the window so
    first-time-graded specs are unmistakable in CORRECTNESS_r{N});
    residents follow in residence order; the 20 pinned specs close the
    window in their fixed §2-parity order.
    """
    queue = list(R5_ROTATING_RESIDENTS)
    in_window_blocks: list[list[str]] = []
    for k in range(round_no - 6 + 1):
        if k >= len(ROTATION_BLOCKS):
            break
        block = ROTATION_BLOCKS[k]
        for _ in block:
            queue.pop(0)  # evict longest residents, one per incoming spec
        in_window_blocks.insert(0, block)
        queue.extend(block)  # rotated-in specs join the back of the queue
    # `queue` holds residence order for FUTURE evictions; the window itself
    # is: newest blocks first, then surviving original residents (those
    # still in queue and not part of an in-window block), then pins.
    flat_blocks = [n for b in in_window_blocks for n in b]
    survivors = [n for n in R5_ROTATING_RESIDENTS if n in queue]
    # Once original residents are exhausted, older blocks start being
    # evicted too — drop evicted block members.
    flat_blocks = [n for n in flat_blocks if n in queue]
    return flat_blocks + survivors + PINNED_FOREVER


def test_driver_window_matches_rotation_schedule():
    # Membership is what the driver grades; intra-window order in
    # registry.py keeps its thematic grouping (pins stay where r3 froze
    # them), so compare sets + size + uniqueness, not sequence.
    names = [s.name for s in SPECS[:DRIVER_WINDOW]]
    want = expected_window(CURRENT_ROUND)
    assert len(want) == DRIVER_WINDOW
    assert len(set(names)) == DRIVER_WINDOW, "duplicate spec in window"
    assert set(names) == set(want), (
        "SPECS[:50] does not match the deterministic rotation schedule for "
        f"round {CURRENT_ROUND} (VERDICT r5 item 2).\nDiff: "
        f"{set(names) ^ set(want)}"
    )


def test_pins_never_leave():
    for r in range(6, 6 + len(ROTATION_BLOCKS)):
        w = expected_window(r)
        assert set(PINNED_FOREVER) <= set(w), f"pin evicted at round {r}"
        assert len(w) == DRIVER_WINDOW, f"window size drift at round {r}: {len(w)}"


def test_every_never_graded_spec_eventually_graded():
    scheduled = {n for b in ROTATION_BLOCKS for n in b}
    assert len(scheduled) == 62
    # every scheduled spec is in the window the round its block lands
    for k, block in enumerate(ROTATION_BLOCKS):
        w = expected_window(6 + k)
        for n in block:
            assert n in w, f"{n} scheduled for round {6 + k} but not in window"


def test_registry_has_all_scheduled_specs():
    names = {s.name for s in SPECS}
    for b in ROTATION_BLOCKS:
        for n in b:
            assert n in names, f"scheduled spec {n} missing from registry"
