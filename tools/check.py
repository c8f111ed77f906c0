#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>

Reads <outDir>/oracle_sql.json (written by graft.Verify), runs each
oracle in DuckDB against views over <sfDir>/*.parquet, and compares
with the parquet results Verify wrote — columns sorted by name, rows
sorted by all columns, exact value equality.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(f).removesuffix(".parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            want = canon(con.execute(sql).df())
            got_files = glob.glob(f"{out_dir}/{name}/*.parquet")
            if not got_files:
                print(f"FAIL {name}: no spark output")
                n_fail += 1
                continue
            got = canon(con.execute(
                f"SELECT * FROM read_parquet({got_files!r})").df())
            if list(want.columns) != list(got.columns):
                print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
                n_fail += 1
            elif list(want.dtypes) != list(got.dtypes):
                diff = [(c, str(want[c].dtype), str(got[c].dtype))
                        for c in want.columns if want[c].dtype != got[c].dtype]
                print(f"FAIL {name}: dtypes differ (col, want, got): {diff}")
                n_fail += 1
            elif len(want) != len(got):
                print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
                n_fail += 1
            elif not want.equals(got):
                neq = (want != got) & ~(want.isna() & got.isna())
                bad = neq.any(axis=1)
                print(f"FAIL {name}: {int(bad.sum())} mismatched rows; first:")
                print(pd.concat([want[bad].head(3).add_suffix("_want"),
                                 got[bad].head(3).add_suffix("_got")], axis=1))
                n_fail += 1
            else:
                print(f"PASS {name} ({len(want)} rows)")
                n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
    # rows-only queries: just check spark produced rows
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracles:
            continue
        files = glob.glob(f"{d}/*.parquet")
        n = con.execute(f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] if files else 0
        status = "PASS" if n > 0 else "FAIL"
        print(f"{status} {name} (rows-only, {n} rows)")
        if n == 0:
            n_fail += 1
        else:
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
