#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables = the sfDir parquets),
sorts columns by name and rows by all columns, and compares values.
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def load_oracle(con, sf_dir, sql):
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con.execute(sql).fetchdf()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def compare(name, spark_df, duck_df):
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA col names differ: spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS differ: spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        try:
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                import numpy as np
                ana, bna = av.isna(), bv.isna()
                if not (ana == bna).all():
                    return f"COL {c}: NaN placement differs"
                if not np.allclose(av[~ana], bv[~bna], rtol=0, atol=0):
                    bad = (av[~ana] - bv[~bna]).abs().idxmax()
                    return f"COL {c}: values differ e.g. row {bad}: {av[bad]!r} vs {bv[bad]!r}"
            else:
                eq = (av.astype(str).fillna("<NA>") == bv.astype(str).fillna("<NA>"))
                if not eq.all():
                    i = eq.idxmin()
                    return f"COL {c}: row {i}: spark={av[i]!r} duck={bv[i]!r}"
        except Exception as e:  # noqa: BLE001
            return f"COL {c}: compare error {e}"
    return None


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    n_pass = n_fail = n_rows_only = 0
    names = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(out_dir, "*")) if os.path.isdir(p)
    )
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"[FAIL] {name}: no parquet output")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(p) for p in files], ignore_index=True)
        if name not in oracle:
            ok = len(spark_df) > 0
            print(f"[{'rows' if ok else 'FAIL'}] {name}: rows-only, {len(spark_df)} rows")
            n_rows_only += ok
            n_fail += not ok
            continue
        try:
            duck_df = load_oracle(con, sf_dir, oracle[name])
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: duckdb error: {e}")
            n_fail += 1
            continue
        err = compare(name, spark_df, duck_df)
        if err:
            print(f"[FAIL] {name}: {err}")
            n_fail += 1
        else:
            print(f"[ok]   {name}: {len(spark_df)} rows")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} FAILED")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
