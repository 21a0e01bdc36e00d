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
    # unify numeric-ish dtypes WITHIN a kind for the comparison — never
    # across kinds: an int64 Spark column vs a float64 oracle column (DuckDB
    # HUGEINT -> pandas float64) must stay distinguishable, because the
    # driver's hash is dtype-sensitive and rejects exactly that divergence.
    for c in df.columns:
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].astype("float64").round(6)
        elif "datetime" in str(df[c].dtype):
            df[c] = df[c].astype("datetime64[us]")
    return df


def kind(dtype) -> str:
    """Coarse dtype kind: the driver's hash distinguishes int vs float vs
    everything-else, so the local gate must too (r4 shipped 3 hash-fails the
    value-only compare could not see: DuckDB sum(BIGINT) -> HUGEINT ->
    pandas float64 vs Spark int64)."""
    k = getattr(dtype, "kind", "O")
    if k in "iu":
        return "int"
    if k == "f":
        return "float"
    if k == "M":
        return "datetime"
    if k == "b":
        return "bool"
    return "other"


def dtype_mismatches(g: pd.DataFrame, e: pd.DataFrame):
    return [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns
            if kind(g[c].dtype) != kind(e[c].dtype)]


def selftest() -> int:
    """A deliberately-uncast integer-sum oracle must FAIL the gate: DuckDB
    returns HUGEINT (-> pandas float64) while Spark would dump int64."""
    con = duckdb.connect()
    exp = con.execute(
        "SELECT sum(x) AS s FROM (VALUES (5::BIGINT), (7::BIGINT)) t(x)").df()
    got = pd.DataFrame({"s": pd.Series([12], dtype="int64")})
    g, e = normalize(got), normalize(exp)
    bad = dtype_mismatches(g, e)
    if not bad:
        print("SELFTEST FAIL: uncast HUGEINT oracle not flagged")
        return 1
    exp_cast = con.execute(
        "SELECT CAST(sum(x) AS BIGINT) AS s "
        "FROM (VALUES (5::BIGINT), (7::BIGINT)) t(x)").df()
    if dtype_mismatches(g, normalize(exp_cast)):
        print("SELFTEST FAIL: CAST(... AS BIGINT) oracle wrongly flagged")
        return 1
    print(f"SELFTEST PASS: dtype gate flags {bad} and accepts the cast form")
    return 0


def main() -> int:
    if sys.argv[1:] == ["--selftest"]:
        return selftest()
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
        bad = dtype_mismatches(g, e)
        if bad:
            print(f"FAIL {name} dtype kind (spark vs duck): {bad}")
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
