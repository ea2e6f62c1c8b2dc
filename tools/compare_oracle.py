#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

Registers each parquet table in <sfDir> as a DuckDB view, runs every SQL in
<verifyOutDir>/oracle_sql.json, and compares against the Spark result dumped
at <verifyOutDir>/<name>/ — columns sorted by name, rows sorted by all
columns, exact value equality.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISSING  {name}: no spark output")
            failures += 1
            continue
        try:
            got = canon(pd.concat([pd.read_parquet(f) for f in spark_files]))
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"ERROR    {name}: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"SCHEMA   {name}: spark={list(got.columns)} duckdb={list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"ROWS     {name}: spark={len(got)} duckdb={len(want)}")
            failures += 1
            continue
        # normalize dtypes for comparison
        got = got.astype(str).reset_index(drop=True)
        want = want.astype(str).reset_index(drop=True)
        if got.equals(want):
            print(f"OK       {name} ({len(got)} rows)")
        else:
            diff = (got != want).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"VALUES   {name}: first diffs at rows {list(idx)}")
            for i in idx:
                print(f"  spark : {got.iloc[i].to_dict()}")
                print(f"  duckdb: {want.iloc[i].to_dict()}")
            failures += 1
    # rows-only entries (queries without oracle)
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracle:
            files = glob.glob(f"{d}/*.parquet")
            n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
            print(f"ROWSONLY {name}: {n} rows")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return failures

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
