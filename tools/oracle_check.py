#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

For each <name>.parquet written by graft.Verify, run the matching SQL from
oracle_sql.json in DuckDB over the same parquet tables, then compare
row count, column names, and a hash of the values with columns sorted by
name and rows sorted by all columns. Dev tool only — never shipped.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable sorting/hashing across engines
    def cell(v):
        # normalize date-valued cells: pandas renders duckdb DATE as a
        # midnight Timestamp while spark parquet yields datetime.date
        if isinstance(v, pd.Timestamp) and v.tz is None and v == v.normalize():
            return v.date().isoformat()
        if hasattr(v, "isoformat"):
            return v.isoformat()
        if isinstance(v, float):
            return f"{v:.9g}"
        if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
            try:
                v = list(v.tolist() if hasattr(v, "tolist") else v)
                return "[" + ",".join(cell(x) for x in v) + "]"
            except Exception:
                return str(v)
        return str(v)
    s = df.apply(lambda col: col.map(cell))
    return s.sort_values(by=list(s.columns)).reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            n_fail += 1
        elif len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            n_fail += 1
        elif not a.equals(b):
            diff = (a != b).any(axis=1)
            i = diff[diff].index[0]
            print(f"FAIL {name}: value mismatch at row {i}:\n  spark={a.iloc[i].to_dict()}\n  duck ={b.iloc[i].to_dict()}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
