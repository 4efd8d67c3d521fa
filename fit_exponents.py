#!/usr/bin/env python
"""Fit growth exponents for the heavy query families from THREE scale
points (VERDICT r7 item 1: one 10× ratio cannot separate n·log n from
n^1.3 — the 29× ANN blow-up was invisible until sf1 first ran; a third
point pins the exponent).

Reads bench detail files produced by bench.py at different scales and
fits, per query present in all files, the least-squares slope a of
log(t) vs log(k) — i.e. t ≈ c·k^a over relative corpus scale k.  Two
fits are reported: raw, and floor-adjusted (each timing divided by its
session's floor_probe_s, removing ambient machine-floor shifts between
the sessions — the r7-measured 2× probe swing would otherwise masquerade
as curvature).

Usage:
  python fit_exponents.py k1:FILE1 k2:FILE2 k3:FILE3
e.g.
  python fit_exponents.py 1:BENCH_EXP_SF01.json 10:BENCH_EXP_SF1.json 30:BENCH_EXP_SF3.json
"""

from __future__ import annotations

import json
import math
import sys


def slope(xs: list[float], ys: list[float]) -> float:
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    den = sum((x - mx) ** 2 for x in xs)
    return num / den


def main() -> None:
    points = []
    for arg in sys.argv[1:]:
        k, path = arg.split(":", 1)
        with open(path) as f:
            points.append((float(k), json.load(f)))
    points.sort(key=lambda p: p[0])
    assert len(points) >= 3, "need three scale points to fit curvature"

    common = set(points[0][1]["queries"])
    for _, d in points[1:]:
        common &= set(d["queries"])

    print(
        "Scale points: "
        + ", ".join(
            f"k={k:g} (floor_probe {d.get('floor_probe_s')} s)" for k, d in points
        )
    )
    print()
    header = "| query | " + " | ".join(f"t(k={k:g}) s" for k, _ in points)
    print(header + " | exponent (raw) | exponent (floor-adj) |")
    print("|---|" + "---|" * (len(points) + 2))
    rows = []
    skipped = []
    for q in sorted(common):
        ts = [d["queries"][q] for _, d in points]
        # ADVICE r8: floor_probe_s can be null in a real artifact, and a
        # zero/negative timing would crash math.log — coalesce the floor
        # to 1.0 and report (not crash on) non-positive timings.
        if any(t is None or t <= 0 for t in ts):
            skipped.append((q, ts))
            continue
        lk = [math.log(k) for k, _ in points]
        raw = slope(lk, [math.log(t) for t in ts])
        adj_ts = [
            t / (d.get("floor_probe_s") or 1.0) for t, (_, d) in zip(ts, points)
        ]
        adj = slope(lk, [math.log(t) for t in adj_ts])
        rows.append((q, ts, raw, adj))
    rows.sort(key=lambda r: -r[3])
    for q, ts, raw, adj in rows:
        tcells = " | ".join(str(t) for t in ts)
        print(f"| {q} | {tcells} | {raw:.2f} | {adj:.2f} |")
    if skipped:
        print()
        for q, ts in skipped:
            print(f"(skipped {q}: non-positive/missing timing in {ts})")
    print()
    print(
        "Exponent 1.0 = linear in corpus scale; < 1 = fixed costs still"
        " amortizing; the slope is fitted over log-log, so a constant"
        " session-floor offset inflates small-t rows — read the"
        " floor-adjusted column for queries under ~2 s."
    )


if __name__ == "__main__":
    main()
