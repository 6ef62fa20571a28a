#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check_correctness.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` has already produced
per-query parquet dirs + oracle_sql.json in outDir. For each query with an
oracle, runs the SQL in DuckDB (tables = parquet files in sfDir) and
compares against the Spark result: row count, schema (column names), and
exact values (columns sorted by name, rows sorted).

The driver's gate hashes values TYPE-SENSITIVELY. Asymmetry that burned
two rounds: the SPARK side is read from parquet, where a decimal column
comes back as Python Decimal objects; the ORACLE side is a live DuckDB
result, whose decimals coerce to float64 in pandas. So an oracle-side
decimal is benign (hashes as float), but a Spark-side decimal mismatches
even when every value is equal. This replica therefore additionally:
  1. FAILS any query whose SPARK parquet output contains a decimal
     column (emit exact rationals as VARCHAR instead), and
  2. compares the arrow value-kind (int/float/str/bool/...) of every
     column across the two sides — mapping oracle decimals to float,
     exactly as the driver's pandas coercion does — because a kind
     mismatch (e.g. int vs float) hashes differently even when values
     are equal.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads


def arrow_kind(t: "pa.DataType") -> str:
    """Collapse an arrow type to the value-kind the driver's hash sees."""
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bytes"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t) \
            or pa.types.is_fixed_size_list(t):
        return f"list<{arrow_kind(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ",".join(
            f"{t.field(i).name}:{arrow_kind(t.field(i).type)}"
            for i in range(t.num_fields))
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{arrow_kind(t.key_type)},{arrow_kind(t.item_type)}>"
    return str(t)


def schema_issues(name_to_kind_spark, name_to_kind_oracle):
    """Driver-hash hazards: Spark-side decimal, or kind mismatch."""
    issues = []
    for c, k in name_to_kind_spark.items():
        if "decimal" in k:
            issues.append(
                f"spark col '{c}' is {k} — parquet decimal reads back as "
                "Python Decimal and the driver hash mangles it; emit "
                "VARCHAR")
    # the driver reads the oracle via pandas, which coerces DuckDB
    # decimals to float64 — mirror that for the kind comparison
    okinds = {c: k.replace("decimal", "float")
              for c, k in name_to_kind_oracle.items()}
    for c in sorted(set(name_to_kind_spark) & set(okinds)):
        ks, ko = name_to_kind_spark[c], okinds[c]
        if ks != ko:
            issues.append(f"col '{c}' kind {ks} vs {ko} — type-sensitive "
                          "hash will mismatch even on equal values")
    return issues

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
        spark_schema = pads.dataset(spark_dir, format="parquet").schema
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
        res = con.execute(sql)
        oracle_schema = res.arrow().schema
        ddf = con.execute(sql).df()  # .df() = the driver's float coercion
    except Exception as e:
        results[name] = f"ERROR: {e}"
        continue
    status = []
    skinds = {f.name: arrow_kind(f.type) for f in spark_schema}
    okinds = {f.name: arrow_kind(f.type) for f in oracle_schema}
    status.extend(schema_issues(skinds, okinds))
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

# Regenerate COVERAGE.md's gate-count header from the checker's own
# output so it can never drift by hand again (VERDICT r15 §wrong 1).
# Only a FULL clean run rewrites it: a name-filtered Verify produces a
# small oracle_sql.json which must not shrink the advertised count.
cov = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "COVERAGE.md")
if n_ok == len(results) and os.path.exists(cov):
    import re
    text = open(cov).read()
    m = re.search(r"\*\*(\d+)/(\d+) oracle queries\s+exact-match\*\*", text)
    if m and n_ok >= int(m.group(2)):
        new = re.sub(r"\*\*\d+/\d+ oracle queries\s+exact-match\*\*",
                     f"**{n_ok}/{n_ok} oracle queries exact-match**",
                     text, count=1)
        if new != text:
            open(cov, "w").write(new)
            print(f"COVERAGE.md gate count regenerated: {n_ok}/{n_ok}")

sys.exit(0 if n_ok == len(results) else 1)
