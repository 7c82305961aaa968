#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run each oracle SQL from
oracle_sql.json in DuckDB against the sf parquet tables, load the Spark
result parquet, sort columns by name + rows by value, and diff.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e)[:300]}")
            failed += 1
            continue
        try:
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark result missing: {str(e)[:200]}")
            failed += 1
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            failed += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            failed += 1
            continue
        mismatch = None
        for c in exp.columns:
            e_, g_ = exp[c], got[c]
            if str(e_.dtype).startswith("float") or str(g_.dtype).startswith("float"):
                eq = (e_.isna() & g_.isna()) | (e_ == g_)
            else:
                eq = (e_.isna() & g_.isna()) | (e_.astype(str) == g_.astype(str))
            if not eq.all():
                i = int((~eq).idxmax())
                mismatch = (c, i, e_.iloc[i], g_.iloc[i])
                break
        if mismatch:
            c, i, ev, gv = mismatch
            print(f"FAIL {name}: col {c} row {i}: oracle={ev!r} spark={gv!r}")
            failed += 1
        else:
            print(f"OK   {name} ({len(exp)} rows)")
    print(f"\n{len(oracle) - failed}/{len(oracle)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
