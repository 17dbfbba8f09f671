#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness compare: run each
oracle_sql.json query in DuckDB over the sf parquet tables, load the
matching Spark result parquet, sort columns by name + rows by all
columns, and diff. Usage: compare_oracle.py <sfDir> <verifyOut>"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
# every registered query must have produced a result dir — a failed dump
# otherwise silently vanishes from this compare
try:
    manifest = json.load(open(f"{out_dir}/_manifest.json"))
except FileNotFoundError:
    manifest = []
for name in manifest:
    if not os.path.isdir(os.path.join(out_dir, name)):
        print(f"{name:28s} MISSING RESULT (query failed in Verify)")
        fail += 1
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    spark = pd.read_parquet(d)
    if name not in oracle:
        if len(spark) == 0:
            fail += 1  # rows-only queries must be non-empty (verify SKILL.md)
            print(f"{name:28s} rows-only: 0 rows  !! EMPTY")
        else:
            print(f"{name:28s} rows-only: {len(spark)} rows")
        continue
    try:
        duck = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name:28s} ORACLE SQL ERROR: {e}")
        fail += 1
        continue
    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    s, k = norm(spark), norm(duck)
    if list(s.columns) != list(k.columns):
        print(f"{name:28s} COLUMN MISMATCH spark={list(s.columns)} duck={list(k.columns)}")
        fail += 1
        continue
    if len(s) != len(k):
        print(f"{name:28s} ROWS MISMATCH spark={len(s)} duck={len(k)}")
        fail += 1
        continue
    dtypes_diff = [(c, str(s[c].dtype), str(k[c].dtype)) for c in s.columns
                   if str(s[c].dtype) != str(k[c].dtype)]
    try:
        pd.testing.assert_frame_equal(s, k, check_dtype=False, check_exact=True)
        ok = True
    except AssertionError as e:
        ok = False
        msg = str(e).split("\n")[0:6]
    if ok:
        note = f" dtype-diff={dtypes_diff}" if dtypes_diff else ""
        print(f"{name:28s} OK ({len(s)} rows){note}")
    else:
        fail += 1
        print(f"{name:28s} VALUE MISMATCH: {' | '.join(msg)}")
        # show first differing rows
        neq = (s != k) & ~(s.isna() & k.isna())
        bad = neq.any(axis=1)
        print(s[bad].head(3))
        print(k[bad].head(3))
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
