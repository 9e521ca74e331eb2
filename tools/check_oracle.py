#!/usr/bin/env python3
"""Local driver-mimic: compare Verify output parquet against DuckDB oracle.

Usage: check_oracle.py [sfDir] [verifyOutDir]
Not part of the shipped library — developer feedback loop only.
"""
import sys, json, glob
import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name in sorted(oracle):
        try:
            exp = con.sql(oracle[name]).df()
            files = glob.glob(f"{out}/{name}/*.parquet")
            if not files:
                print(f"{name}: FAIL no spark output"); n_fail += 1; continue
            got = duckdb.sql(f"SELECT * FROM read_parquet({files!r})").df()
            exp = exp.reindex(sorted(exp.columns), axis=1)
            got = got.reindex(sorted(got.columns), axis=1)
            if list(exp.columns) != list(got.columns):
                print(f"{name}: FAIL cols exp={list(exp.columns)} got={list(got.columns)}")
                n_fail += 1; continue
            exp = exp.sort_values(by=list(exp.columns), ignore_index=True)
            got = got.sort_values(by=list(got.columns), ignore_index=True)
            if exp.shape != got.shape:
                print(f"{name}: FAIL shape exp={exp.shape} got={got.shape}")
                n_fail += 1; continue
            diffs = []
            for c in exp.columns:
                a, b = exp[c], got[c]
                if str(a.dtype) != str(b.dtype):
                    diffs.append(f"dtype[{c}]: {a.dtype} vs {b.dtype}")
                if a.dtype.kind == "f" and b.dtype.kind == "f" \
                        and a.dtype == b.dtype:
                    # byte-faithful: the driver hashes bytes, for which
                    # -0.0 != +0.0 and NaN payloads matter; pandas ==
                    # says -0.0 == 0.0 (how q150 shipped red in r18).
                    av = a.to_numpy().view(f"int{a.dtype.itemsize * 8}")
                    bv = b.to_numpy().view(f"int{b.dtype.itemsize * 8}")
                    neq = pd.Series(av != bv, index=a.index)
                else:
                    neq = ~((a == b) | (a.isna() & b.isna()))
                if neq.any():
                    i = neq.idxmax()
                    diffs.append(f"val[{c}] row {i}: exp={a[i]!r} got={b[i]!r} ({int(neq.sum())} rows)")
            if diffs:
                print(f"{name}: FAIL " + "; ".join(diffs[:4])); n_fail += 1
            else:
                print(f"{name}: OK rows={len(exp)}"); n_ok += 1
        except Exception as e:
            print(f"{name}: ERROR {str(e)[:300]}"); n_fail += 1
    print(f"== {n_ok} ok, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
