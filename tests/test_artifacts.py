"""Committed-artifact integrity gates (VERDICT r10 items 2 and 7).

The r10 snapshot shipped a 0-byte PLANS.md because an interrupted
regeneration truncated the artifact in place.  The writer is now
atomic (tmp + os.replace), and this test makes a stale or truncated
artifact a FAILING state: `make verify` (parity → plans → bench)
regenerates PLANS.md before `make test` style runs, and any snapshot
whose PLANS.md row count does not match the registry fails here —
a truncated regeneration can never be committed silently again.
"""

from __future__ import annotations

import os
import re

from updating_datasets_data_engineering_spark.registry import SPECS

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLANS = os.path.join(REPO, "PLANS.md")


def test_plans_md_exists_and_nonempty():
    assert os.path.exists(PLANS), "PLANS.md missing — run `make plans`"
    assert os.path.getsize(PLANS) > 0, (
        "PLANS.md is empty (the r10 truncation class) — run `make plans`"
    )


def test_plans_md_row_count_matches_registry():
    with open(PLANS) as fh:
        text = fh.read()
    # one table row per spec: "| <name> | <n> | ..." — skip the header
    # and separator rows
    rows = [
        m.group(1)
        for m in re.finditer(r"^\| ([a-z0-9_]+) \| ", text, re.MULTILINE)
        if m.group(1) != "query"
    ]
    names = {s.name for s in SPECS}
    assert len(rows) == len(SPECS), (
        f"PLANS.md has {len(rows)} rows but the registry has {len(SPECS)} "
        "specs — regenerate with `make plans`"
    )
    missing = names - set(rows)
    assert not missing, f"PLANS.md missing rows for: {sorted(missing)[:10]}"
