#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run Verify's parquet
dumps against the DuckDB oracle and diff values with columns sorted by name.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    # unify numeric-ish dtypes for the comparison
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64").round(6)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]")
    return df


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    results = sorted(d for d in os.listdir(out_dir)
                     if os.path.isdir(os.path.join(out_dir, d)))
    for name in results:
        got = pd.read_parquet(f"{out_dir}/{name}")
        if name not in oracles:
            ok = len(got) > 0
            print(f"{'PASS' if ok else 'FAIL'} {name} (rows-only: {len(got)})")
            n_pass += ok
            n_fail += not ok
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name} oracle error: {e}")
            n_fail += 1
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name} columns: spark={list(g.columns)} duck={list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name} rows: spark={len(g)} duck={len(e)}")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=False, rtol=0, atol=1e-9)
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError as ex:
            print(f"FAIL {name} values:\n{str(ex)[:500]}")
            n_fail += 1
    missing = sorted(set(oracles) - set(results))
    for name in missing:
        print(f"FAIL {name}: oracle declared but no result parquet")
        n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
