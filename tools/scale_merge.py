#!/usr/bin/env python3
"""Min-merge N bench JSONs per scale and emit the SCALING.md ratio table.

Usage: scale_merge.py --base A.json[,B.json...] --scaled C.json[,D.json...] [FACTOR]

Takes each query's min across all samples of each scale (the standing
SCALING.md estimator: min over independent interleaved sweeps), then
prints the markdown ratio table sorted descending. Exits non-zero if
any ratio >= FACTOR (default 10).
"""
import json
import sys


def minmerge(paths):
    merged = {}
    for p in paths.split(","):
        with open(p) as f:
            q = json.load(f)["queries"]
        for k, v in q.items():
            merged[k] = min(merged.get(k, float("inf")), v)
    return merged


def main():
    args = sys.argv[1:]
    base = minmerge(args[args.index("--base") + 1])
    scaled = minmerge(args[args.index("--scaled") + 1])
    factor = float(args[-1]) if args[-1].replace(".", "").isdigit() else 10.0
    common = sorted(set(base) & set(scaled),
                    key=lambda q: -(scaled[q] / base[q] if base[q] else 1e9))
    print("| query | base | scaled | ratio |")
    print("|---|---|---|---|")
    flagged = []
    for q in common:
        r = scaled[q] / base[q] if base[q] > 0 else float("inf")
        mark = " **⚠ super-linear**" if r >= factor else ""
        if r >= factor:
            flagged.append(q)
        print(f"| {q} | {base[q]:.2f} | {scaled[q]:.2f} | {r:.1f}×{mark} |")
    tb = sum(base[q] for q in common)
    ts = sum(scaled[q] for q in common)
    print(f"| **total ({len(common)} common)** | **{tb:.1f}** | **{ts:.1f}** "
          f"| **{ts / tb:.2f}×** |")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
