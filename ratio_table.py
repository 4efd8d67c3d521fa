#!/usr/bin/env python
"""Generate the canonical sf0.1 ↔ sf1.0 ratio table FROM the committed
bench artifacts (VERDICT r7 item 7: COVERAGE.md's scale narrative must
trace to committed artifacts, with solo probes clearly separate).

Reads BENCH_FULL.json (sf0.1) and BENCH_SF1.json (sf1.0) at the repo
root and prints a markdown table of every query present in BOTH, sorted
by descending ratio, plus the floor probes and totals.  Any hand edits
to the table in COVERAGE.md are a bug; re-run this script instead.

Usage: python ratio_table.py [--top N] [--min-sf1 SECONDS]
"""

from __future__ import annotations

import argparse
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=0, help="emit only the N worst ratios")
    ap.add_argument(
        "--min-sf1",
        type=float,
        default=0.0,
        help="skip rows faster than this at sf1 (floor-dominated)",
    )
    args = ap.parse_args()

    with open(os.path.join(HERE, "BENCH_FULL.json")) as f:
        base = json.load(f)
    with open(os.path.join(HERE, "BENCH_SF1.json")) as f:
        sf1 = json.load(f)

    common = sorted(set(base["queries"]) & set(sf1["queries"]))
    rows = []
    for q in common:
        t0, t1 = base["queries"][q], sf1["queries"][q]
        rows.append((q, t0, t1, (t1 / t0) if t0 else float("inf")))
    rows.sort(key=lambda r: -r[3])
    if args.min_sf1:
        rows = [r for r in rows if r[2] >= args.min_sf1]
    if args.top:
        rows = rows[: args.top]

    print(
        f"Artifacts: BENCH_FULL.json (sf{base['sf']}, {len(base['queries'])} queries, "
        f"total {base['value']} s, floor_probe {base.get('floor_probe_s')} s, "
        f"state_build {base.get('state_build_s')} s) and BENCH_SF1.json "
        f"(sf{sf1['sf']}, {len(sf1['queries'])} queries, total {sf1['value']} s, "
        f"floor_probe {sf1.get('floor_probe_s')} s, state_build "
        f"{sf1.get('state_build_s')} s).  {len(common)} queries in both."
    )
    print()
    print("| query | sf0.1 s | sf1.0 s | ratio at 10× data | sf1 shuffle MB |")
    print("|---|---|---|---|---|")
    smb = sf1.get("shuffle_mb", {})
    for q, t0, t1, r in rows:
        print(f"| {q} | {t0} | {t1} | {r:.1f}× | {smb.get(q, '—')} |")
    over = [r for r in rows if r[3] > 10.0]
    print()
    if over:
        print(f"**{len(over)} queries above linear (>10×):** " + ", ".join(q for q, *_ in over))
    else:
        print("**No query above linear (>10×) at 10× data.**")


if __name__ == "__main__":
    main()
