#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, read the Spark result parquet, compare
(column-name-sorted, row-sorted, floats rounded)."""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    # round BEFORE sorting: rows that tie after rounding must sort the
    # same way in both frames, or the row-wise compare misaligns
    for c in df.columns:
        if df[c].dtype == np.float64:
            df[c] = df[c].round(6)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fail = 0
names = sorted(d for d in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, d)))

# Completeness gate (round-8 lesson: 34 throwing queries silently vanished
# from the correctness file for two rounds). Verify dumps _queries.json
# (every selected query name) and _failures.json (name -> error); any
# query with neither an output dir nor a failure record — or with a
# failure record — is a hard fail here.
failures = {}
if os.path.exists(f"{outdir}/_failures.json"):
    failures = json.load(open(f"{outdir}/_failures.json"))
for name, msg in sorted(failures.items()):
    print(f"✗ {name}: THREW IN VERIFY: {msg[:200]}"); fail += 1
if os.path.exists(f"{outdir}/_queries.json"):
    expected = set(json.load(open(f"{outdir}/_queries.json")))
    missing = expected - set(names) - set(failures)
    for name in sorted(missing):
        print(f"✗ {name}: NO OUTPUT AND NO FAILURE RECORD"); fail += 1
for name in names:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    spark_df = con.execute(f"SELECT * FROM read_parquet({files})").df()
    if name not in oracle:
        print(f"  {name}: NO-ORACLE rows={len(spark_df)}")
        continue
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"✗ {name}: ORACLE SQL ERROR: {e}"); fail += 1; continue
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        print(f"✗ {name}: COLUMNS spark={list(a.columns)} duck={list(b.columns)}"); fail += 1; continue
    if len(a) != len(b):
        print(f"✗ {name}: ROWS spark={len(a)} duck={len(b)}"); fail += 1; continue
    if not a.equals(b):
        neq = (a != b) & ~(a.isna() & b.isna())
        bad = neq.any(axis=1)
        print(f"✗ {name}: VALUES differ in {bad.sum()}/{len(a)} rows")
        print("  spark:", a[bad].head(3).to_dict('records'))
        print("  duck :", b[bad].head(3).to_dict('records'))
        fail += 1; continue
    print(f"✓ {name}: rows={len(a)}")
print(f"\n{'FAIL' if fail else 'PASS'} ({fail} mismatches, {len(names)} queries)")
sys.exit(1 if fail else 0)
