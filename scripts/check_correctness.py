#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load each query's parquet
dump, run its oracle SQL in DuckDB against the sf parquet tables, compare
rows / schema / values (sorted by all columns). Usage:
  python3 scripts/check_correctness.py <sfDir> <outDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    n_pass = n_fail = n_noor = 0
    import glob, os

    all_queries = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)) and not d.startswith("_")
    )
    for name in all_queries:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            results[name] = f"no_oracle rows={len(spark_df)}"
            n_noor += 1
            continue
        try:
            ora_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(ora_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(a.columns)} oracle={list(b.columns)}"
            n_fail += 1
            continue
        if len(a) != len(b):
            results[name] = f"ROWS_MISMATCH spark={len(a)} oracle={len(b)}"
            n_fail += 1
            continue
        try:
            eq = a.equals(b)
            if not eq:
                # tolerate dtype-only diffs (int32 vs int64) by value compare
                eq = (a.astype(str) == b.astype(str)).all().all()
        except Exception as e:
            results[name] = f"COMPARE_ERROR: {e}"
            n_fail += 1
            continue
        if eq:
            results[name] = f"PASS rows={len(a)}"
            n_pass += 1
        else:
            diff = (a.astype(str) != b.astype(str)).any(axis=1)
            idx = diff[diff].index[:3]
            detail = []
            for i in idx:
                row_diff = {
                    c: (str(a.at[i, c]), str(b.at[i, c]))
                    for c in a.columns
                    if str(a.at[i, c]) != str(b.at[i, c])
                }
                detail.append(f"row{i}: {row_diff}")
            results[name] = "VALUE_MISMATCH " + "; ".join(detail)
            n_fail += 1
    for k in sorted(results):
        print(f"{k:28s} {results[k]}")
    print(f"\npass={n_pass} fail={n_fail} no_oracle={n_noor}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
