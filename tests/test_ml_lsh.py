"""MLlib LSH variants must agree with the exact/md5 baselines."""

from __future__ import annotations

from pyspark.sql import functions as F

from updating_datasets_data_engineering_spark.operators import dedup as D
from updating_datasets_data_engineering_spark.operators import ml_lsh as ML
from updating_datasets_data_engineering_spark.tables import load_table


def test_ml_minhash_finds_exact_duplicates(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # ground truth: pairs of byte-identical documents
    dup_groups = D.dedup_exact(docs).where(F.col("n_copies") > 1)
    exact_dup_pair_count = dup_groups.count()
    found = ML.ml_minhash_pairs(docs, jaccard_distance_max=0.01)
    # every exact-dup pair has Jaccard distance 0 -> must all be found
    perfect = found.where(F.col("jaccard") >= 0.999999)
    if exact_dup_pair_count > 0:
        assert perfect.count() > 0
    assert found.count() >= perfect.count()


def test_ml_brp_pairs_consistent_with_l2(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").limit(200)
    pairs = ML.ml_brp_neighbors(emb, distance_max=5.0)
    rows = pairs.limit(20).collect()
    assert all(r["l2_dist"] <= 5.0 for r in rows)
    # spot-check one distance against the engine's own l2 computation
    if rows:
        from updating_datasets_data_engineering_spark.functions import vectors as V

        r = rows[0]
        a = emb.where(F.col("vec_id") == r["id_a"]).select("embedding").alias("a")
        b = emb.where(F.col("vec_id") == r["id_b"]).select(
            F.col("embedding").alias("eb")
        )
        d = (
            a.crossJoin(b)
            .select(V.l2_distance(F.col("embedding"), F.col("eb")).alias("d"))
            .collect()[0]["d"]
        )
        assert abs(d - r["l2_dist"]) < 1e-4
