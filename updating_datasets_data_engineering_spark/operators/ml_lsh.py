"""Spark MLlib LSH variants (built-in counterparts to operators.dedup /
operators.similarity).

The md5-based implementations in this package are the oracle-checkable
primary path (deterministic across engines); these MLlib wrappers
exist because at cluster scale they are the zero-maintenance built-in:
``MinHashLSH`` for Jaccard near-dup joins, ``BucketedRandomProjection``
for Euclidean ANN.  Both run `approxSimilarityJoin` — banded OR-ed
hash buckets under the hood, same asymptotics as the hand-rolled path.

Determinism note: seeds are fixed, but MLlib's hash families differ
from the md5 permutations, so results are *near* (not bit-) identical
to dedup.minhash_lsh_pairs — hence rows-only checks, verified against
the exact baselines in tests.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, HashingTF, MinHashLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TXT


def ml_minhash_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hash_tables: int = 8,
    jaccard_distance_max: float = 0.6,
    num_features: int = 1 << 18,
) -> DataFrame:
    """MinHashLSH near-dup pairs over hashed token-set features.

    HashingTF(binary) -> sparse token-set vector; approxSimilarityJoin
    prunes via OR-ed hash tables and returns exact Jaccard distance for
    survivors.
    """
    toks = docs.select(
        F.col(id_col).alias("id"), TXT.distinct_words(F.col(text_col)).alias("toks")
    ).where(F.size("toks") > 0)
    tf = HashingTF(inputCol="toks", outputCol="features", numFeatures=num_features, binary=True)
    feats = tf.transform(toks)
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42)
    model = mh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, jaccard_distance_max, distCol="jaccard_dist")
    return (
        joined.where(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            F.round(1 - F.col("jaccard_dist"), 6).alias("jaccard"),
        )
    )


def ml_brp_neighbors(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    distance_max: float = 10.0,
) -> DataFrame:
    """Euclidean ANN pairs via BucketedRandomProjectionLSH over the
    ARRAY<FLOAT> embedding column (converted to ML vectors)."""
    vecs = embeddings.select(
        F.col(id_col).alias("id"), array_to_vector(F.col(vec_col)).alias("features")
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features",
        outputCol="hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=42,
    )
    model = brp.fit(vecs)
    joined = model.approxSimilarityJoin(vecs, vecs, distance_max, distCol="l2_dist")
    return (
        joined.where(F.col("datasetA.id") < F.col("datasetB.id"))
        .select(
            F.col("datasetA.id").alias("id_a"),
            F.col("datasetB.id").alias("id_b"),
            F.round("l2_dist", 6).alias("l2_dist"),
        )
    )
