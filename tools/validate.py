#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf tables and compare against the parquet written by
graft.Verify. Columns are sorted by name before compare (the driver's
rule); floats are compared exactly (both engines round, so residual
noise means a real problem).

Usage: validate.py [--json <path>] <sfDir> <verifyOutDir> [queryName...]

--json writes a self-contained per-query artifact
{name: {"rows": N, "pass": bool, "check": "oracle"|"rows_only", ...}}
— the local mirror of the driver's CORRECTNESS_r{N}.json, so an empty
or missing driver artifact (round 13 shipped a literal {}) can never
go unnoticed. When the Verify dump carries a queries.txt manifest, the
artifact MUST cover every manifest entry (a crashed query is a FAIL
row, not an omission) and the script exits nonzero otherwise.
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Tokens whose results vary across libm builds (the r14 q118/q119 driver
# failure class). sqrt/division are IEEE-exact and NOT flagged.
TRANSCENDENTALS = ("ln(", "exp(", "log(", "log2(", "log10(", "pow(",
                   "sin(", "cos(", "tan(", "asin(", "acos(", "atan(")


def load_hash_audit():
    """The committed hash-fragility allowlist (tools/hash_audit.json):
    hashed DOUBLE columns and transcendental-bearing oracles must be
    consciously listed there or the gate fails — the validator-side
    mirror of the round-15 exact-only rule, so a fragile projection is
    caught BEFORE the driver's DuckDB build gets a vote."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "hash_audit.json")
    with open(path) as f:
        return json.load(f)


def audit_failures(name, sql, out_dir, audit):
    """Returns a list of hash-fragility findings for an oracle-checked
    query (empty = clean)."""
    finds = []
    lowered = sql.lower()
    trans = [t[:-1] for t in TRANSCENDENTALS if t in lowered]
    if trans and name not in audit.get("transcendental_ok", {}):
        finds.append(f"oracle uses transcendental {trans} without a "
                     "transcendental_ok entry (libm-variant across DuckDB "
                     "builds - use a literal-LUT generated oracle instead)")
    # the r14 q120 failure shape: a rounded DOUBLE laundered into an
    # "exact" decimal — round-algorithm variance flips the decimal
    if "cast(round(" in lowered.replace(" ", ""):
        finds.append("oracle casts round(<double>) to another type "
                     "(decimal-of-rounded-double is NOT exact: round() on a "
                     "boundary value differs across engines - hash the exact "
                     "integer/decimal sources instead)")
    try:
        rows = duckdb.sql(
            f"DESCRIBE SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchall()
    except Exception:
        return finds  # missing dump reported by the main compare
    allowed = set(audit.get("double_columns", {}).get(name, []))
    bad = [r[0] for r in rows if r[1] in ("DOUBLE", "FLOAT")
           and r[0] not in allowed]
    if bad:
        finds.append(f"hashed DOUBLE column(s) {bad} not in "
                     "tools/hash_audit.json (exact-only rule: hash integer "
                     "counts / decimal sums of decimal inputs / fixed-order "
                     "float compares, or allowlist with a margin argument)")
    return finds


def main():
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    results = {}
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
    audit = load_hash_audit()

    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        frag = audit_failures(name, sql, out_dir, audit)
        if frag:
            for msg in frag:
                print(f"FAIL {name}: {msg}")
            results[name] = {"rows": None, "pass": False, "check": "oracle",
                             "reason": f"hash-fragility audit: {frag}"}
            n_fail += 1
            continue
        try:
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            results[name] = {"rows": None, "pass": False, "check": "oracle",
                             "reason": f"oracle SQL error: {e}"}
            n_fail += 1
            continue
        try:
            spark = duckdb.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: missing spark output: {e}")
            results[name] = {"rows": None, "pass": False, "check": "oracle",
                             "reason": "missing spark output"}
            n_fail += 1
            continue

        oracle = oracle.reindex(sorted(oracle.columns), axis=1)
        spark = spark.reindex(sorted(spark.columns), axis=1)
        if list(oracle.columns) != list(spark.columns):
            print(f"FAIL {name}: columns oracle={list(oracle.columns)} "
                  f"spark={list(spark.columns)}")
            results[name] = {"rows": len(spark), "pass": False,
                             "check": "oracle", "reason": "column mismatch"}
            n_fail += 1
            continue
        if len(oracle) != len(spark):
            print(f"FAIL {name}: rows oracle={len(oracle)} spark={len(spark)}")
            results[name] = {"rows": len(spark), "pass": False,
                             "check": "oracle", "reason": "row count mismatch"}
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
            results[name] = {"rows": len(spark), "pass": False,
                             "check": "oracle",
                             "reason": f"value mismatch col={c} row={i}"}
            n_fail += 1
        else:
            print(f"PASS {name} ({len(oracle)} rows)")
            results[name] = {"rows": len(oracle), "pass": True,
                             "check": "oracle"}
            n_pass += 1

    # queries WITHOUT an emitted oracle (withheld replays): the driver
    # records a weaker rows-only check — mirror it so the artifact
    # covers the full manifest
    manifest_path = f"{out_dir}/queries.txt"
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = [l.strip() for l in f if l.strip()]
        for name in manifest:
            if name in results or (only and name not in only):
                continue
            if name in oracles:
                continue  # already handled (oracle loop skipped via only)
            try:
                rows = duckdb.sql(
                    f"SELECT count(*) FROM '{out_dir}/{name}/*.parquet'"
                ).fetchone()[0]
                ok = rows > 0
                results[name] = {"rows": rows, "pass": ok,
                                 "check": "rows_only"}
                print(f"{'PASS' if ok else 'FAIL'} {name} "
                      f"({rows} rows, rows-only)")
            except Exception:
                results[name] = {"rows": None, "pass": False,
                                 "check": "rows_only",
                                 "reason": "missing spark output"}
                print(f"FAIL {name}: missing spark output (rows-only)")
            if results[name]["pass"]:
                n_pass += 1
            else:
                n_fail += 1
        expected = [n for n in manifest if not only or n in only]
        missing = [n for n in expected if n not in results]
        if missing:
            print(f"FAIL artifact incomplete: no result for {missing}")
            n_fail += 1

    print(f"== {n_pass} pass, {n_fail} fail")
    if json_out is not None:
        if not results:
            print("FAIL --json artifact would be EMPTY; refusing to write")
            return 1
        # ALSO emit the driver's exact row schema (VERDICT r15 item 2:
        # {rows_match, schema_match, hash_match, spark_rows,
        # oracle_rows, err}) so a judge can diff driver-vs-local
        # artifacts row-for-row the moment a non-empty driver artifact
        # reappears. The local fields (pass/check/rows/reason) stay.
        for name, r in results.items():
            if name.startswith("_"):
                continue
            reason = r.get("reason")
            if r.get("check") == "rows_only":
                r.update({"rows_match": bool(r.get("pass")),
                          "schema_match": None, "hash_match": None,
                          "spark_rows": r.get("rows"), "oracle_rows": None,
                          "err": reason or "rows-only (oracle withheld)"})
            elif r.get("pass"):
                r.update({"rows_match": True, "schema_match": True,
                          "hash_match": True, "spark_rows": r.get("rows"),
                          "oracle_rows": r.get("rows"), "err": None})
            else:
                reason_s = str(reason or "")
                r.update({
                    "rows_match": False if "row count" in reason_s else None,
                    "schema_match": False if "column" in reason_s else None,
                    "hash_match": False,
                    "spark_rows": r.get("rows"), "oracle_rows": None,
                    "err": reason or "failed"})
        # environment pin (VERDICT r14 item 2): the r14 local-vs-driver
        # divergence was a DuckDB-build libm difference — record which
        # build produced THIS artifact so a future gap is attributable.
        # Consumers must skip keys starting with "_".
        results["_meta"] = {"duckdb_version": duckdb.__version__,
                            "hash_audit": "tools/hash_audit.json"}
        with open(json_out, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"== wrote {len(results) - 1} query entries to {json_out} "
              f"(duckdb {duckdb.__version__})")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
