#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_correctness.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` has already produced
per-query parquet dirs + oracle_sql.json in outDir. For each query with an
oracle, runs the SQL in DuckDB (tables = parquet files in sfDir) and
compares against the Spark result: row count, schema (column names), and
exact values (columns sorted by name, rows sorted).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
results = {}
for name in sorted(oracle):
    sql = oracle[name]
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        results[name] = "MISSING_SPARK_RESULT"
        continue
    try:
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
        ddf = con.execute(sql).df()
    except Exception as e:
        results[name] = f"ERROR: {e}"
        continue
    status = []
    if len(sdf) != len(ddf):
        status.append(f"rows {len(sdf)} vs {len(ddf)}")
    scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
    if scols != dcols:
        status.append(f"schema {scols} vs {dcols}")
    else:
        s = sdf[scols].sort_values(scols).reset_index(drop=True)
        d = ddf[dcols].sort_values(dcols).reset_index(drop=True)
        if len(s) == len(d):
            try:
                pd.testing.assert_frame_equal(s, d, check_dtype=False,
                                              check_exact=True)
            except AssertionError as e:
                first = str(e).split("\n")
                status.append("values: " + " | ".join(first[:3]))
    results[name] = "OK" if not status else "; ".join(status)

n_ok = sum(1 for v in results.values() if v == "OK")
for name, v in results.items():
    mark = "✓" if v == "OK" else "✗"
    print(f"{mark} {name}: {v}")
print(f"\n{n_ok}/{len(results)} exact-match")
sys.exit(0 if n_ok == len(results) else 1)
