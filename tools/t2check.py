#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Usage: python3 tools/t2check.py <verify_out_dir> [sf_dir]

Reads each <name>/ parquet result written by graft.Verify, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB against the
testdata parquet tables, and compares: schema (column names), row count,
and exact values (columns sorted by name, rows sorted by all columns).
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main():
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        got = pd.concat([pd.read_parquet(p) for p in sorted(files)], ignore_index=True)
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        try:
            # timestamps: normalize tz-awareness before comparing
            for c in g.columns:
                for df in (g, e):
                    if pd.api.types.is_datetime64_any_dtype(df[c]):
                        df[c] = pd.to_datetime(df[c], utc=True).dt.tz_localize(None)
            # the driver's hash is dtype-sensitive (HUGEINT→float64 vs
            # BIGINT→int64 hash differently) — compare dtypes strictly
            dt_mismatch = [
                c for c in g.columns if str(g[c].dtype) != str(e[c].dtype)
            ]
            if dt_mismatch:
                raise AssertionError(
                    "dtype mismatch: "
                    + ", ".join(
                        f"{c}: spark={g[c].dtype} oracle={e[c].dtype}"
                        for c in dt_mismatch
                    )
                )
            pd.testing.assert_frame_equal(g, e, check_dtype=True, check_exact=True)
            print(f"PASS {name} ({len(g)} rows)")
            n_pass += 1
        except AssertionError as ex:
            msg = str(ex).split("\n")
            print(f"FAIL {name}: values differ: " + " | ".join(msg[:6]))
            # show first differing cell
            for c in g.columns:
                neq = ~(g[c].eq(e[c]) | (g[c].isna() & e[c].isna()))
                if neq.any():
                    i = neq.idxmax()
                    print(f"   first diff col={c} row={i}: spark={g[c][i]!r} oracle={e[c][i]!r}")
                    break
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
