#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/selfcheck.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
For each <outDir>/<name> parquet dir with an entry in oracle_sql.json:
run the SQL in DuckDB (tables = views over <sfDir>/*.parquet), then
compare after sorting columns by name and rows by all columns.
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(os.path.join(SF, "*.parquet")):
    name = os.path.basename(p)[: -len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(OUT, "oracle_sql.json")))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails, passes = [], []
for name, sql in sorted(oracle.items()):
    res_dir = os.path.join(OUT, name)
    if not os.path.isdir(res_dir):
        fails.append((name, "no spark output"))
        continue
    try:
        spark_df = canon(
            pd.concat([pd.read_parquet(f) for f in glob.glob(res_dir + "/*.parquet")],
                      ignore_index=True))
        duck_df = canon(con.sql(sql).df())
    except Exception as e:
        fails.append((name, f"read/sql error: {e}"))
        continue
    if list(spark_df.columns) != list(duck_df.columns):
        fails.append((name, f"columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}"))
        continue
    # mirror the driver's schema compare: dtype mismatches fail even when
    # values coincide (ADVICE r1: int64-vs-float64 must not pass locally)
    bad_types = [
        f"{c}: spark={spark_df[c].dtype} duck={duck_df[c].dtype}"
        for c in spark_df.columns
        if spark_df[c].dtype != duck_df[c].dtype
        # timestamps normalize below; object columns carry strings/lists
        and not (spark_df[c].dtype.kind == "M" and duck_df[c].dtype.kind == "M")
    ]
    if bad_types:
        fails.append((name, "dtype mismatch: " + "; ".join(bad_types)))
        continue
    if len(spark_df) != len(duck_df):
        fails.append((name, f"rows spark={len(spark_df)} duck={len(duck_df)}"))
        continue
    # exact value compare (mirror a hash compare)
    try:
        neq_cols = []
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            if a.dtype.kind == "M" or b.dtype.kind == "M":
                a = a.astype("datetime64[us]").dt.tz_localize(None) if a.dtype.kind == "M" else a
                b = b.astype("datetime64[us]").dt.tz_localize(None) if b.dtype.kind == "M" else b
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                neq_cols.append(f"{c} (row {i}: {a[i]!r} vs {b[i]!r}, {int((~eq).sum())} diffs)")
        if neq_cols:
            fails.append((name, "value mismatch: " + "; ".join(neq_cols)))
        else:
            passes.append((name, len(spark_df)))
    except Exception as e:
        fails.append((name, f"compare error: {e}"))

for name, n in passes:
    print(f"PASS {name} ({n} rows)")
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(passes)} pass, {len(fails)} fail")
sys.exit(1 if fails else 0)
