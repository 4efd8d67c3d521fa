"""Single-pass Observation metrics: the audit numbers must equal
independent aggregates while costing zero extra jobs (they ride the
one materializing action)."""

from __future__ import annotations

from pyspark.sql import functions as F

from updating_datasets_data_engineering_spark.operators import observability as OBS
from updating_datasets_data_engineering_spark.sources import shot_synth as SS
from updating_datasets_data_engineering_spark.tables import load_table


def test_observed_metrics_match_independent_aggregates(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    df, obs = OBS.observed(
        ev,
        "ev_audit",
        n_rows=F.count(F.lit(1)),
        total_value=F.round(F.sum("value"), 6),
    )
    df.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["n_rows"] == ev.count()
    assert got["total_value"] == ev.agg(F.round(F.sum("value"), 6)).first()[0]


def test_ingest_row_accounting_single_pass(spark, sf_dir):
    """The malformed-row guard's drop count comes out of the SAME job
    that parses (1/25 of synthesized records carry broken JSON)."""
    records = SS.synth_kafka_records(load_table(spark, sf_dir, "events"))
    parsed, obs = OBS.ingest_row_accounting(records)
    n_parsed = parsed.count()  # the one action; metrics ride it
    got = obs.get
    assert got["n_records"] == records.count()
    assert got["n_malformed"] == got["n_records"] - n_parsed
    assert got["n_malformed"] > 0  # the guard is actually exercised


def test_observed_stream_compatible_metrics_on_batch_upsert(spark, sf_dir, tmp_path):
    """Observation inside a write action (not collect): metrics are
    available after the write completes."""
    docs = load_table(spark, sf_dir, "documents")
    df, obs = OBS.observed(docs, "w_audit", n=F.count(F.lit(1)))
    df.write.mode("overwrite").parquet(str(tmp_path / "out"))
    assert obs.get["n"] == docs.count()
