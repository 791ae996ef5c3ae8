#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: compare_oracle.py <verify_out_dir> <sf_dir> [sf_name_override]

Loads oracle_sql.json, registers the sf parquet tables as DuckDB views,
optionally rewrites hardcoded sf0.01 fixture paths to the given sf name,
runs each oracle SQL, and compares (sorted columns, sorted rows) against the
Spark-written parquet result.
"""
import json, sys, glob
import duckdb
import pandas as pd

out_dir, sf_dir = sys.argv[1], sys.argv[2]
sf_name = sys.argv[3] if len(sys.argv) > 3 else sf_dir.rstrip('/').split('/')[-1]

con = duckdb.connect()
for t in glob.glob(f"{sf_dir}/*.parquet"):
    name = t.split('/')[-1].replace('.parquet', '')
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

sql_map = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for q, sql in sorted(sql_map.items()):
    sql = sql.replace('_sf0.01/', f'_{sf_name}/')
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {q}: oracle SQL error: {e}")
        fail += 1
        continue
    try:
        act = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{out_dir}/{q}/*.parquet")])
    except Exception as e:
        print(f"FAIL {q}: spark result unreadable: {e}")
        fail += 1
        continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    act = act.reindex(sorted(act.columns), axis=1)
    if list(exp.columns) != list(act.columns):
        print(f"FAIL {q}: columns exp={list(exp.columns)} act={list(act.columns)}")
        fail += 1
        continue
    exp = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
    act = act.sort_values(by=list(act.columns)).reset_index(drop=True)
    if len(exp) != len(act):
        print(f"FAIL {q}: rows exp={len(exp)} act={len(act)}")
        fail += 1
        continue
    # normalize dtypes for comparison
    for c in exp.columns:
        if str(exp[c].dtype) != str(act[c].dtype):
            try:
                act[c] = act[c].astype(exp[c].dtype)
            except Exception:
                exp[c] = exp[c].astype(str)
                act[c] = act[c].astype(str)
    eq = exp.equals(act)
    if not eq:
        diff = (exp != act) & ~(exp.isna() & act.isna())
        bad = diff.any(axis=1)
        print(f"FAIL {q}: {bad.sum()} mismatched rows of {len(exp)}")
        print("  exp:", exp[bad].head(3).to_dict('records'))
        print("  act:", act[bad].head(3).to_dict('records'))
        fail += 1
    else:
        print(f"PASS {q}: {len(exp)} rows")
sys.exit(1 if fail else 0)
