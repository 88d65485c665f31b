#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Mimics the driver: for each query in oracle_sql.json, run the SQL in
DuckDB over views named after the parquet tables in sfDir, load the
Spark result parquet from verifyOutDir/<name>/, sort columns by name,
and compare row-by-row (exact for ints/strings/dates, tiny epsilon for
floats to sidestep parquet round-trip noise).
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    d = f"{out}/{name}"
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        fails.append((name, "no spark result parquet"))
        continue
    spark_df = pq.read_table(files[0]).to_pandas()
    try:
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f"duckdb error: {e}"))
        continue
    spark_df = spark_df.reindex(sorted(spark_df.columns), axis=1)
    duck_df = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(spark_df.columns) != list(duck_df.columns):
        fails.append((name, f"cols spark={list(spark_df.columns)} duck={list(duck_df.columns)}"))
        continue
    if len(spark_df) != len(duck_df):
        fails.append((name, f"rows spark={len(spark_df)} duck={len(duck_df)}"))
        continue
    bad = None
    for c in spark_df.columns:
        a, b = spark_df[c], duck_df[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            aa, bb = a.astype(float).to_numpy(), b.astype(float).to_numpy()
            ok = (np.isclose(aa, bb, rtol=0, atol=1e-9) | (np.isnan(aa) & np.isnan(bb))
                  | (pd.isna(a).to_numpy() & pd.isna(b).to_numpy()))
            if not ok.all():
                i = int(np.argmin(ok)); bad = (c, i, aa[i], bb[i]); break
        else:
            av, bv = a.astype(str).to_numpy(), b.astype(str).to_numpy()
            ok = (av == bv) | (pd.isna(a).to_numpy() & pd.isna(b).to_numpy())
            if not ok.all():
                i = int(np.argmin(ok)); bad = (c, i, av[i], bv[i]); break
    if bad:
        fails.append((name, f"col {bad[0]} row {bad[1]}: spark={bad[2]!r} duck={bad[3]!r}"))
    else:
        print(f"OK   {name} ({len(spark_df)} rows)")

for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
