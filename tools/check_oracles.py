#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle gate.

Usage: python3 tools/check_oracles.py <verify_out_dir> <sf_dir> [query ...]

Reads each <out>/<name> parquet (written by graft.Verify), runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB over the sf tables, and
compares rows / schema (column names) / a value hash with columns sorted by
name — the same comparison shape the driver uses.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

out, sf = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

with open(os.path.join(out, "oracle_sql.json")) as f:
    oracles = json.load(f)

con = duckdb.connect()
for t in glob.glob(os.path.join(sf, "*.parquet")):
    name = os.path.basename(t)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = 0
for name in sorted(os.listdir(out)):
    path = os.path.join(out, name)
    if not os.path.isdir(path) or (only and name not in only):
        continue
    spark_df = pd.concat([pd.read_parquet(p) for p in glob.glob(path + "/*.parquet")],
                         ignore_index=True)
    if name not in oracles:
        try:
            canon(spark_df)
            print(f"{name}: rows-only ({len(spark_df)} rows, hashable ok)")
        except Exception as e:
            print(f"{name}: rows-only FAILED to canonicalize: {e}")
            fails += 1
        continue
    try:
        oracle_df = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    a, b = canon(spark_df.copy()), canon(oracle_df.copy())
    ok_rows = len(a) == len(b)
    ok_cols = list(a.columns) == list(b.columns)
    ok_vals = False
    if ok_rows and ok_cols:
        try:
            av = a.astype(str).values.tolist()
            bv = b.astype(str).values.tolist()
            ok_vals = av == bv
        except Exception:
            ok_vals = False
    status = "OK" if (ok_rows and ok_cols and ok_vals) else "MISMATCH"
    if status != "OK":
        fails += 1
        print(f"{name}: {status} rows={len(a)}/{len(b)} cols={ok_cols} "
              f"sparkcols={list(a.columns)} oraclecols={list(b.columns)}")
        if ok_rows and ok_cols:
            diff = (a.astype(str) != b.astype(str)).any(axis=1)
            idx = diff[diff].index[:3]
            for i in idx:
                print(f"  row {i}: spark={a.iloc[i].tolist()} oracle={b.iloc[i].tolist()}")
    else:
        print(f"{name}: OK ({len(a)} rows)")
sys.exit(1 if fails else 0)
