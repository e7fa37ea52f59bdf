#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the oracle SQL in
DuckDB (with each testdata table registered as a view), load the Spark
result parquet, sort columns by name and rows by all columns, and compare
values. Reports per-query row/schema/value match.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify everything for a stable engine-independent compare
    s = df.astype(str)
    s = s.sort_values(by=list(s.columns), kind="mergesort").reset_index(drop=True)
    return s


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
            g, w = normalize(got), normalize(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}")
                n_fail += 1
            elif len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} vs {len(w)}")
                n_fail += 1
            elif not g.equals(w):
                diff = (g != w).any(axis=1)
                idx = diff[diff].index[:3]
                print(f"FAIL {name}: value mismatch at rows {list(idx)}")
                for i in idx:
                    print(f"  spark: {g.loc[i].to_dict()}")
                    print(f"  duck : {w.loc[i].to_dict()}")
                n_fail += 1
            else:
                print(f"PASS {name} ({len(g)} rows)")
                n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
