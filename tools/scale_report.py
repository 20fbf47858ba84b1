#!/usr/bin/env python3
"""Scale-probe report: per-query time ratios across bench decades.

Usage: tools/scale_report.py BASE.json SCALED.json [FACTOR]

Both inputs are graft.Bench JSON lines (BENCH_LOCAL/BENCH_SF1/
BENCH_SF10). Prints a markdown table of per-query min seconds and the
SCALED/BASE ratio, sorted by ratio descending, plus totals. FACTOR
(default 10) is the data-volume multiple between the two runs — ratios
at or above it are flagged as super-linear.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    base, scaled = load(sys.argv[1]), load(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    bq, sq = base["queries"], scaled["queries"]
    common = sorted(set(bq) & set(sq))
    rows = []
    for name in common:
        b, s = bq[name], sq[name]
        ratio = s / b if b > 0 else float("inf")
        rows.append((name, b, s, ratio))
    rows.sort(key=lambda r: -r[3])
    print("| query | base | scaled | ratio |")
    print("|---|---|---|---|")
    flagged = []
    for name, b, s, ratio in rows:
        mark = " **⚠ super-linear**" if ratio >= factor else ""
        if ratio >= factor:
            flagged.append(name)
        print(f"| {name} | {b:.2f} | {s:.2f} | {ratio:.1f}×{mark} |")
    tb = sum(r[1] for r in rows)
    ts = sum(r[2] for r in rows)
    print(f"| **total ({len(rows)} common)** | **{tb:.1f}** | **{ts:.1f}** "
          f"| **{ts / tb:.2f}×** |")
    only_b = sorted(set(bq) - set(sq))
    only_s = sorted(set(sq) - set(bq))
    if only_b:
        print(f"\nonly in base: {', '.join(only_b)}")
    if only_s:
        print(f"only in scaled: {', '.join(only_s)}")
    if flagged:
        print(f"\nSUPER-LINEAR (ratio >= {factor:g}x): {', '.join(flagged)}")
        sys.exit(1)
    print(f"\nNo query at or above the {factor:g}x linear bound.")


if __name__ == "__main__":
    main()
