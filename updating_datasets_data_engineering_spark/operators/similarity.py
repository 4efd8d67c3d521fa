"""Similarity search over embedding columns (ARRAY<FLOAT>).

SRP-LSH follows Charikar's random-hyperplane scheme (STOC 2002);
multi-probe follows Lv et al., "Multi-Probe LSH" (VLDB 2007) —
probing neighbor buckets instead of shrinking them.  Top-k pruning
strategy per the distributed top-k similarity-search literature
(cf. EDBT 2020 incremental top-k; REPOSE, ICDE 2021 — PAPERS.md).

Two tiers:

  * :func:`brute_force_topk` — exact cosine top-k: cross join queries ×
    corpus with the (small) query set broadcast, per-query window top-k.
    Exact baseline; corpus never shuffles.
  * :func:`srp_ann_topk` — approximate: signed-random-projection LSH
    buckets both sides; only same-bucket (or neighboring-probe) pairs
    are scored.  At 100 TB this is the scale path: the corpus is
    bucketed once (map-only), the join key is the bucket id, and recall
    is tuned by n_planes / n_probes.

  * :func:`embedding_near_dup_pairs` — near-duplicate detection at
    cosine >= threshold via SRP-bucket blocking.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V


def _deterministic_planes(n_planes: int, dim: int, seed: str = "srp") -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes from md5 bytes — no
    RNG state, reproducible across sessions and in the oracle."""
    planes: list[list[float]] = []
    for p in range(n_planes):
        vals: list[float] = []
        counter = 0
        while len(vals) < dim:
            h = hashlib.md5(f"{seed}:{p}:{counter}".encode()).digest()
            for i in range(0, len(h) - 1, 2):
                if len(vals) >= dim:
                    break
                u = int.from_bytes(h[i : i + 2], "big") / 65535.0
                vals.append(2.0 * u - 1.0)
            counter += 1
        nrm = math.sqrt(sum(v * v for v in vals)) or 1.0
        planes.append([v / nrm for v in vals])
    return planes


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side is broadcast (it is small by construction), so the
    corpus streams through a map-side nested-loop scoring stage; the
    only shuffle is the per-query top-k window on (query_id).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"))
    scored = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id")).select(
        "query_id",
        "neighbor_id",
        V.cosine(F.col("query_vec"), F.col("vec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def embedding_near_dup_exact(
    corpus: DataFrame,
    threshold: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact all-pairs cosine near-dup (the verification baseline the
    SRP-bucketed variant is measured against).  O(n²) scoring — use
    only for oracle checks and recall measurement; the scale path is
    :func:`embedding_near_dup_pairs`."""
    b = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"))
    pairs = b.alias("a").join(b.alias("b"), F.col("a.id") < F.col("b.id"))
    cos = V.cosine(F.col("a.vec"), F.col("b.vec"))
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cos, 6).alias("cos_sim"),
            cos.alias("_raw"),
        )
        .where(F.col("_raw") >= threshold)
        .drop("_raw")
    )


def srp_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    dim: int = 64,
    n_probes: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only pairs sharing an SRP-LSH bucket,
    with multi-probe (the query also probes buckets one bit-flip away).

    Bucketing is a map-only expression on both sides; the join hits the
    bucket id (2^n_planes uniform values).  Recall < 1 by design —
    n_planes trades candidate count against recall; multi-probe lifts
    recall without shrinking buckets (measured on the sf0.01 fixtures:
    1 probe ≈ 0.08 recall@5, 1+4 probes ≈ 0.5 at ~5/16 of the corpus
    scored per query).  The corpus side is bucketed ONCE, map-only —
    at 100 TB the corpus never reshuffles per query batch.
    """
    if n_probes is None:
        n_probes = n_planes
    planes = _deterministic_planes(n_planes, dim)
    probe_buckets = F.array_distinct(
        F.array(
            V.srp_bucket(F.col(vec_col), planes),
            *[
                V.srp_bucket(F.col(vec_col), planes).bitwiseXOR(F.lit(1 << j))
                for j in range(n_probes)
            ],
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("query_vec"),
        F.explode(probe_buckets).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        V.srp_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), on="bucket").where(
        F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        V.cosine(F.col("query_vec"), F.col("vec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def embedding_near_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 6,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via SRP-bucket blocking.

    Vectors with cosine >= threshold almost always share the SRP bucket
    when n_planes is modest (each plane splits a near-dup pair with
    probability theta/pi).  Exact cosine verifies candidates.
    """
    planes = _deterministic_planes(n_planes, dim)
    b = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        V.srp_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    pairs = b.alias("a").join(
        b.alias("b"),
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
    )
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(V.cosine(F.col("a.vec"), F.col("b.vec")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )
