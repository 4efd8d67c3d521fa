"""Skew-mitigation patterns: salting for hot aggregation/join keys.

At 100 TB a groupBy on a low-cardinality or zipfian key (event_type
here: 5 values over billions of rows) concentrates whole key-groups on
single reducers.  Two-stage salted aggregation spreads each hot key
over ``n_salts`` partial groups, then combines — the partial stage is
uniform, the final stage sees only ``keys × n_salts`` rows.

(Spark's map-side partial aggregation already does this for algebraic
aggregates; the explicit salt stage is the pattern for the cases
partial agg can't cover — collect-style aggregates, skewed join keys —
and is written here so the equivalence is tested and the plan shape is
auditable.  For joins, AQE's skewJoin handles runtime splitting; salting
remains the static fallback.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation over salted keys.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {count, sum, min, max}: the algebraic aggregates that re-combine
    exactly (count/sum re-sum; min/max re-min/max).
    """
    salted = df.withColumn("_salt", F.pmod(F.hash(F.monotonically_increasing_id()), n_salts))
    partial_exprs = []
    final_exprs = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"_p_{out}"))
            final_exprs.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"_p_{out}"))
            final_exprs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"non-algebraic aggregate {fn!r} cannot be salted this way")
    partial = salted.groupBy(*key, "_salt").agg(*partial_exprs)
    return partial.groupBy(*key).agg(*final_exprs)


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the skewed side's key, replicate the
    small side once per salt value, join on (key, salt).

    The hot key's rows spread over ``n_salts`` reducers instead of one;
    the small side grows n_salts× (fine — it is small by contract).
    This is the static fallback for when AQE's runtime skew-join split
    can't apply (e.g. the skewed side feeds a co-partitioned window).
    """
    keys = list(on)
    left = skewed.withColumn("_salt", F.pmod(F.hash(F.monotonically_increasing_id()), n_salts))
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("_salt")
    right = small.select("*", salts)
    joined = left.join(right, keys + ["_salt"], how)
    return joined.drop("_salt")
