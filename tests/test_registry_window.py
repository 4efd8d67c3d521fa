"""The driver grades CORRECTNESS over SPECS[:50] only.  Round 3's
window was judged the right one (VERDICT r3 item 2: "freeze the SPECS
ordering — any further churn just moves the blind spot"), so the first
50 names are pinned here verbatim: r4 consumed exactly one slot for
``dedup_incremental`` (VERDICT r4 item 1), rotating ``events_sessionize``
out to the pytest-pinned tail; r5 likewise consumed exactly one slot for
``docs_boilerplate_strip`` (flagship of the cross-document curation
block), rotating ``events_moving_avg`` (driver-green r1-r4) out.
Everything past 50 is graded by ``tests/test_oracle_parity.py``
instead — ordering there is free.
"""

from __future__ import annotations

from updating_datasets_data_engineering_spark.registry import SPECS

DRIVER_WINDOW = 50

FROZEN_WINDOW = [
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "docs_deduplicated",
    "dedup_incremental",
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
    "docs_boilerplate_strip",
    "events_range_frame",
    "events_gaps",
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


def test_driver_window_is_frozen():
    names = [s.name for s in SPECS[:DRIVER_WINDOW]]
    assert names == FROZEN_WINDOW, (
        "SPECS[:50] changed — the driver's grading window is frozen "
        "(VERDICT r3 item 2); add new specs AFTER the window marker "
        f"unless a VERDICT item explicitly consumes a slot.\nDiff: "
        f"{set(names) ^ set(FROZEN_WINDOW)}"
    )


def test_marker_comment_matches_window():
    """The in-file marker must sit exactly at the SPECS[:50] boundary
    (ADVICE r3: the r3 marker was two entries off)."""
    import inspect

    from updating_datasets_data_engineering_spark import registry

    src = inspect.getsource(registry)
    before_marker = src.split("driver grading window ends here")[0]
    # every frozen name must be registered before the marker, and the
    # first post-window name must not be
    tail = src.split("driver grading window ends here")[1]
    assert f'"{FROZEN_WINDOW[-1]}"' in before_marker
    assert '"events_sessionize"' not in before_marker
    assert '"events_sessionize"' in tail
