"""Round-9 query semantics beyond the oracle gate: the incremental
TF-IDF probe must equal the batch recompute's delta restriction, and
the snapshot diff must classify each change kind correctly on a
hand-built corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from updating_datasets_data_engineering_spark.registry import (
    docs_snapshot_diff,
    docs_tfidf_incremental,
    docs_tfidf_keywords,
)


def test_tfidf_incremental_equals_batch_restriction(spark, sf_dir):
    """The probe's contract: batch full recompute restricted to delta
    docs — same df/N (corpus-wide), same tf/doc-length (delta-local)."""
    batch = (
        docs_tfidf_keywords(spark, sf_dir)
        .where(F.col("doc_id") % 10 == 0)
        .orderBy("doc_id", "rank")
        .collect()
    )
    incr = (
        docs_tfidf_incremental(spark, sf_dir)
        .orderBy("doc_id", "rank")
        .collect()
    )
    assert len(batch) > 0
    assert [tuple(r) for r in incr] == [tuple(r) for r in batch]


def test_snapshot_diff_classifies_each_kind(spark, sf_dir):
    df = docs_snapshot_diff(spark, sf_dir)
    by_kind = {
        r["change"]: r["n"]
        for r in df.groupBy("change").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # fixture arithmetic: added = in today (doc_id % 7 != 0) but not in
    # yesterday (doc_id % 10 == 0 and % 7 != 0); removed = the converse;
    # changed = in both with doc_id % 5 == 0 (the revised-text slice)
    from updating_datasets_data_engineering_spark.tables import load_table

    ids = [r["doc_id"] for r in load_table(spark, sf_dir, "documents").select("doc_id").collect()]
    added = sum(1 for i in ids if i % 7 != 0 and i % 10 == 0)
    removed = sum(1 for i in ids if i % 10 != 0 and i % 7 == 0)
    changed = sum(1 for i in ids if i % 10 != 0 and i % 7 != 0 and i % 5 == 0)
    assert by_kind.get("added", 0) == added
    assert by_kind.get("removed", 0) == removed
    assert by_kind.get("changed", 0) == changed
    # unchanged docs are suppressed: total rows = the three classes only
    assert df.count() == added + removed + changed


def test_snapshot_diff_change_is_content_based(spark, sf_dir):
    """Every 'changed' doc is in the revised-text slice — the hash
    compare never flags an identical re-crawl."""
    changed_ids = [
        r["doc_id"]
        for r in docs_snapshot_diff(spark, sf_dir)
        .where(F.col("change") == "changed")
        .collect()
    ]
    assert changed_ids, "fixture must exercise the changed class"
    assert all(i % 5 == 0 for i in changed_ids)
