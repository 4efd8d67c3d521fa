"""Cross-document curation operators: fixed-alignment chunk frames,
boilerplate-span detection, and strip application.

The span-granular family (alignment-quantized exact-substring dedup,
Lee et al. 2021, public) shared by the batch queries
(``registry.docs_boilerplate_strip`` / ``docs_cross_doc_dup_rate`` /
``docs_boilerplate_incremental``) and the streaming index maintainer
(``streaming.pipeline.maintain_boilerplate_each_batch``).

Scale notes (100 TB): every frame here keys on the SPAN text — a
uniform high-cardinality hash key — so aggregates and anti joins are
single skew-free shuffles; per-doc reassembly is bounded by document
length, never corpus size.  No UDFs, no driver participation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TXT


def chunk_frame(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 10
) -> DataFrame:
    """(id, i, span): every non-overlapping ``n``-word block with its
    in-document position.  Map-side explode — no shuffle."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(TXT.fixed_chunks(F.col(text_col), n)).alias("i", "span"),
    )


def boilerplate_spans(chunks: DataFrame, min_docs: int = 2) -> DataFrame:
    """Spans occurring in >= ``min_docs`` distinct documents — ONE
    hash-aggregate on the uniform span key."""
    return (
        chunks.groupBy("span")
        .agg(F.countDistinct("doc_id").alias("_nd"))
        .where(F.col("_nd") >= min_docs)
        .select("span")
    )


def strip_against(
    docs: DataFrame,
    boiler: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 10,
) -> DataFrame:
    """Strip every block of ``docs`` whose text is in ``boiler``;
    reassemble survivors in original order plus the sub-block tail.

    The boilerplate set is NOT broadcast: at corpus scale it is
    corpus-sized, so the anti join shuffles on the same uniform span
    key the detection aggregate already used."""
    chunks = chunk_frame(docs, id_col, text_col, n)
    kept = chunks.join(boiler, "span", "left_anti")
    body = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "span"))),
                lambda s: s["span"],
            ),
            " ",
        ).alias("_body"),
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(TXT.fixed_chunks(F.col(text_col), n)).cast("long").alias("n_blocks"),
        TXT.chunk_tail(F.col(text_col), n).alias("_tail"),
    )
    return base.join(body, "doc_id", "left").select(
        "doc_id",
        "n_blocks",
        (F.col("n_blocks") - F.coalesce(F.col("n_kept"), F.lit(0))).alias("n_removed"),
        F.array_join(
            F.filter(
                F.array(F.coalesce(F.col("_body"), F.lit("")), F.col("_tail")),
                lambda s: s != F.lit(""),
            ),
            " ",
        ).alias("clean_text"),
    )
