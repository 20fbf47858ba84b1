#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables and compare against the parquet written by
graft.Verify. Columns are sorted by name before compare (the driver's
rule); floats are compared exactly (both engines round, so residual
noise means a real problem).

Usage: validate.py <sfDir> <verifyOutDir> [queryName...]
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        # driver fixtures are single files; ScaleGen (sf1 probe) writes
        # Spark-style directories of part files — accept both
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            spark = duckdb.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: missing spark output: {e}")
            n_fail += 1
            continue

        oracle = oracle.reindex(sorted(oracle.columns), axis=1)
        spark = spark.reindex(sorted(spark.columns), axis=1)
        if list(oracle.columns) != list(spark.columns):
            print(f"FAIL {name}: columns oracle={list(oracle.columns)} "
                  f"spark={list(spark.columns)}")
            n_fail += 1
            continue
        if len(oracle) != len(spark):
            print(f"FAIL {name}: rows oracle={len(oracle)} spark={len(spark)}")
            n_fail += 1
            continue
        mismatch = None
        for c in oracle.columns:
            ov, sv = oracle[c].tolist(), spark[c].tolist()
            for i, (o, s) in enumerate(zip(ov, sv)):
                if o != s and not (o is None and s is None) and str(o) != str(s):
                    import math
                    if isinstance(o, float) and isinstance(s, float):
                        if math.isnan(o) and math.isnan(s):
                            continue
                    mismatch = (c, i, o, s)
                    break
            if mismatch:
                break
        if mismatch:
            c, i, o, s = mismatch
            print(f"FAIL {name}: col={c} row={i} oracle={o!r} spark={s!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(oracle)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
