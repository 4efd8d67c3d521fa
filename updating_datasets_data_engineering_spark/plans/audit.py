"""Physical-plan auditing: the ".explain and iterate" loop as code.

Every scale claim in this engine is checkable on the plan text:
filters reach the Parquet scan (PushedFilters), projections prune the
scan (ReadSchema), small dimensions broadcast (BroadcastHashJoin),
expressions stay inside WholeStageCodegen, and Python appears only in
the sanctioned Arrow paths (MapInPandas / ArrowEvalPython) — never as
BatchEvalPython row-at-a-time UDFs.

``plan_report`` renders the audit for every registered query; the
repo-root PLANS.md artifact is generated from it.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # same text as .explain("formatted")
        df._jdf.queryExecution(), "formatted"
    )


@dataclass
class PlanFacts:
    n_exchanges: int
    n_key_exchanges: int          # hash/range partitioning — a real data shuffle on keys
    n_broadcast_joins: int
    n_sortmerge_joins: int
    n_codegen_stages: int
    pushed_filters: list[str]
    read_schemas: list[str]
    has_python_udf: bool          # BatchEvalPython — the slow path
    has_arrow_python: bool        # ArrowEvalPython / MapInPandas — sanctioned
    aqe: bool


def analyze(df: DataFrame) -> PlanFacts:
    text = formatted_plan(df)
    pushed = [
        m.group(1).strip()
        for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text)
        if m.group(1).strip()
    ]
    schemas = re.findall(r"ReadSchema: (struct<[^\n]*)", text)
    return PlanFacts(
        # "(N) Operator" counts plan NODES (the AQE summary would
        # otherwise double-count operator names)
        n_exchanges=len(re.findall(r"\(\d+\) Exchange", text)),
        # formatted mode prints the Exchange node as "(N) Exchange" with
        # its partitioning on a separate "Arguments:" line — only
        # Exchange nodes carry (hash|range)partitioning arguments, so
        # counting those lines classifies key shuffles vs round-robin
        n_key_exchanges=len(
            re.findall(r"Arguments: (?:hashpartitioning|rangepartitioning)\(", text)
        ),
        n_broadcast_joins=len(re.findall(r"\(\d+\) BroadcastHashJoin", text)),
        n_sortmerge_joins=len(re.findall(r"\(\d+\) SortMergeJoin", text)),
        n_codegen_stages=len(set(re.findall(r"\[codegen id : (\d+)\]", text))),
        pushed_filters=pushed,
        read_schemas=schemas,
        has_python_udf=bool(re.search(r"BatchEvalPython", text)),
        has_arrow_python=bool(re.search(r"ArrowEvalPython|MapInPandas", text)),
        aqe=bool(re.search(r"AdaptiveSparkPlan", text)),
    )


def plan_report(spark, sf_dir: str) -> str:
    """Markdown audit of every registered query's physical plan."""
    from ..registry import SPECS

    lines = [
        "# PLANS — physical-plan audit",
        "",
        f"Generated against `{sf_dir}`.  Facts extracted from",
        '`.explain("formatted")` for every registered query: shuffles,',
        "join strategies, codegen stages, scan pushdown, Python exchange.",
        "",
        "Known blind spots of plan-text extraction (cross-checked by the",
        "`shuffle_mb` executor counters in BENCH_FULL — see COVERAGE.md):",
        "lineage truncated by `localCheckpoint` does not appear in the final",
        "explain, which hides (a) pagerank's per-round shuffles, (b) work",
        "inside `foreachBatch` micro-batches, and (c) since r7 the Arrow",
        "`mapInPandas` SRP-banding stage of `embedding_near_dup_ann` /",
        "`embedding_near_dup_t90` — those two rows read `none` below but DO",
        "run one sanctioned Arrow stage (bit-exactness and plan shape",
        "asserted in tests/test_recall.py).",
        "",
        "| query | exchanges | key shuffles | bcast joins | SMJ | codegen stages | pushed filters | python |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for spec in SPECS:
        f = analyze(spec.fn(spark, sf_dir))
        pf = "; ".join(f.pushed_filters)[:80] or "—"
        py = (
            "row-UDF!" if f.has_python_udf else ("arrow" if f.has_arrow_python else "none")
        )
        lines.append(
            f"| {spec.name} | {f.n_exchanges} | {f.n_key_exchanges} | {f.n_broadcast_joins} | "
            f"{f.n_sortmerge_joins} | {f.n_codegen_stages} | {pf} | {py} |"
        )
    return "\n".join(lines) + "\n"


def main() -> None:
    """Regenerate the repo-root PLANS.md:
    ``python -m updating_datasets_data_engineering_spark.plans.audit [sf_dir] [out]``"""
    import os
    import sys

    from ..session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "PLANS.md"
    )
    spark = get_spark("updating-datasets-plan-audit")
    report = plan_report(spark, sf_dir)
    # Atomic replace: an interrupted regeneration can never leave a
    # truncated artifact (VERDICT r10 item 2 — the r10 snapshot shipped
    # a 0-byte PLANS.md).  tests/test_artifacts.py additionally pins
    # PLANS.md's row count to the registry size.
    tmp = out + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(report)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, out)
    print(out)


if __name__ == "__main__":
    main()
