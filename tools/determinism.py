#!/usr/bin/env python3
"""Determinism probe: compare two graft.Verify output dirs value-for-value.

Usage: determinism.py <outDirA> <outDirB>

For every q* directory present in A, reads both sides with DuckDB as
`SELECT * FROM '<dir>/*.parquet' ORDER BY ALL` and compares fetchall()
results exactly (floats included — bit-identical plans are the bar;
see NOTES.md round-4 methodology). Exits non-zero on any mismatch.
"""
import os
import sys

import duckdb


def main():
    a, b = sys.argv[1], sys.argv[2]
    qdirs = sorted(d for d in os.listdir(a)
                   if d.startswith("q") and os.path.isdir(os.path.join(a, d)))
    n_pass = n_fail = 0
    for q in qdirs:
        if not os.path.isdir(os.path.join(b, q)):
            print(f"FAIL {q}: missing in {b}")
            n_fail += 1
            continue
        ra = duckdb.sql(f"SELECT * FROM '{a}/{q}/*.parquet' ORDER BY ALL").fetchall()
        rb = duckdb.sql(f"SELECT * FROM '{b}/{q}/*.parquet' ORDER BY ALL").fetchall()
        if ra == rb:
            n_pass += 1
        else:
            print(f"FAIL {q}: {len(ra)} vs {len(rb)} rows, first diff: "
                  f"{next(((x, y) for x, y in zip(ra, rb) if x != y), 'row count')}")
            n_fail += 1
    print(f"== determinism: {n_pass} identical, {n_fail} mismatched")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
