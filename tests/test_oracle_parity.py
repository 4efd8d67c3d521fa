"""Every registered query must match its DuckDB oracle — the local
mirror of the driver's correctness gate."""

from __future__ import annotations

import pytest

from updating_datasets_data_engineering_spark.registry import SPECS

from .oracle_harness import compare_frames, run_oracle

ORACLE_SPECS = [s for s in SPECS if s.oracle is not None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_query_matches_oracle(spark, sf_dir, spec):
    spark_pdf = spec.fn(spark, sf_dir).toPandas()
    oracle_pdf = run_oracle(spec.oracle, sf_dir)
    compare_frames(spark_pdf, oracle_pdf, name=spec.name)


NO_ORACLE_SPECS = [s for s in SPECS if s.oracle is None]


@pytest.mark.parametrize(
    "spec", NO_ORACLE_SPECS, ids=[s.name for s in NO_ORACLE_SPECS] or ["none"]
)
def test_rows_only_queries_run(spark, sf_dir, spec):
    if not NO_ORACLE_SPECS:
        pytest.skip("all queries have oracles")
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
