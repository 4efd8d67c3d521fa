"""Single-pass pipeline metrics via ``DataFrame.observe``.

A production ingest needs row-accounting (how many records arrived, how
many were dropped by the malformed-row guard, value totals for
reconciliation) — but a second ``count()`` per metric re-scans the
source, which at 100 TB doubles the read.  Spark's Observation API
collects named aggregates DURING the one action that materializes the
frame: the metrics ride the existing scan as accumulator-style
expressions, zero extra jobs, any number of metrics.

The reference has no equivalent (its row counts are ad-hoc driver
prints); this is the engine-native replacement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(df: DataFrame, name: str, **metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named metric aggregates to ``df``'s next action.

    Returns ``(df', obs)``: run any single action on ``df'`` (write,
    collect, foreach), then read ``obs.get`` — a dict of the metric
    values computed in that same pass.  Aggregates must be
    Observation-legal: no distinct, built on the observed rows only.
    """
    obs = Observation(name)
    return df.observe(obs, *[c.alias(n) for n, c in metrics.items()]), obs


def ingest_row_accounting(records: DataFrame, value_col: str = "value"):
    """Shot-ingest with malformed-row accounting in ONE scan.

    The parse guard (ingest.parse_shot_events) silently drops rows whose
    JSON fails — correct, but un-audited.  This variant observes
    (n_records, n_malformed) on the pre-filter frame, so the drop count
    comes out of the same job that parses: no second read of the topic
    / file.

    Returns ``(parsed_df, obs)``; ``obs.get`` after one action yields
    ``{"n_records": ..., "n_malformed": ...}``.
    """
    from .ingest import SHOT_EVENT_SCHEMA

    parsed_all = records.select(
        F.from_json(F.col(value_col).cast("string"), SHOT_EVENT_SCHEMA).alias("r")
    )
    bad = F.col("r").isNull() | F.col("r.play").isNull()
    with_metrics, obs = observed(
        parsed_all,
        "ingest_audit",
        n_records=F.count(F.lit(1)),
        n_malformed=F.sum(bad.cast("long")),
    )
    return with_metrics.where(~bad).select("r.*"), obs
