"""Z-order (Morton-curve) clustering layout.

Partition pruning handles ONE leading dimension; real archives get
filtered on several (``user_id`` AND ``ts``, ``lang`` AND ``quality``).
A linear sort makes the first column's min/max file statistics tight and
leaves every other column's full range in every file — so only one
predicate ever skips data.  Interleaving the bits of the sort keys
(the Morton / Z-value, the technique behind Delta Lake's ``OPTIMIZE
ZORDER BY``) makes every participating column's per-file range narrow,
so min/max pruning works on ANY of them.

Columns are coded by QUANTILE, not min-max: a skewed column (the
events ``value`` is exponential-ish) crams most rows into a sliver of
the min-max scale and the curve degenerates to a linear sort on the
other dimension.  Quantile boundaries come from ``approxQuantile``
(the Greenwald-Khanna sketch — the same sampling pass a range rewrite
of a 100 TB table already runs for its partition bounds); the
code-assignment is a sum of boolean comparisons against the broadcast
boundary literals — monotone, one flat codegen expression, no UDF.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantile_code(col, boundaries: Sequence[float]):
    """Map a numeric column to its quantile-bucket index: the count of
    boundaries at or below the value — Σ (v >= b_i), a flat sum of
    boolean casts (monotone by construction, duplicate boundaries from
    heavy skew merely skip codes)."""
    code = F.lit(0).cast("long")
    for b in boundaries:
        code = code + (col.cast("double") >= F.lit(float(b))).cast("long")
    return code


def zorder_value(codes: Sequence, bits: int):
    """Interleave the bits of non-negative int code columns into one
    Morton value: dimension d contributes bit i at position
    ``i * n_dims + d`` — adjacent z-values differ little in every
    dimension at once."""
    n = len(codes)
    z = F.lit(0).cast("long")
    for d, col in enumerate(codes):
        for i in range(bits):
            bit = F.shiftright(col, i).bitwiseAND(F.lit(1).cast("long"))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + d))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    code_bits: int = 6,
    n_files: int = 16,
    boundaries: dict[str, Sequence[float]] | None = None,
    relative_error: float = 0.01,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files clustered on the
    Z-curve over ``cols``: quantile-code each column to ``code_bits``
    bits, range-partition + sort by the interleaved value, so every
    file covers a small hyper-rectangle in QUANTILE space and min/max
    footer stats prune scans filtered on ANY of the z-ordered columns.

    ``boundaries`` (col -> ascending cut points) skips the sketch pass
    — at production scale the table statistics already know them.
    """
    cols = list(cols)
    n_buckets = 1 << code_bits
    if boundaries is None:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        boundaries = {
            c: df.stat.approxQuantile(c, probs, relative_error) for c in cols
        }
    codes = [quantile_code(F.col(c), boundaries[c]) for c in cols]
    z = zorder_value(codes, code_bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
