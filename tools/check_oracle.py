#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet dump (written by graft.Verify),
runs the matching SQL from oracle_sql.json in DuckDB against the same
parquet tables, and compares: schema (column names sorted), row count,
and values (exact; floats compared to 9 decimal places after rounding).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

def load_spark(outdir, name):
    files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    dumped = sorted(d for d in os.listdir(outdir)
                    if os.path.isdir(os.path.join(outdir, d)))
    n_pass = n_fail = n_rowsonly = 0
    for name in dumped:
        spark_df = load_spark(outdir, name)
        if spark_df is None:
            print(f"FAIL  {name}: no parquet output"); n_fail += 1; continue
        if name not in oracle:
            ok = len(spark_df) > 0
            print(f"{'ROWS' if ok else 'FAIL'}  {name}: rows-only check, {len(spark_df)} rows")
            n_rowsonly += ok; n_fail += (not ok); continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}"); n_fail += 1; continue
        sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
        if sc != dc:
            print(f"FAIL  {name}: columns differ spark={sc} duck={dc}"); n_fail += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL  {name}: rows spark={len(spark_df)} duck={len(duck_df)}"); n_fail += 1; continue
        s, k = spark_df[sc].reset_index(drop=True), duck_df[sc].reset_index(drop=True)
        for c in sc:
            if s[c].dtype != k[c].dtype:
                print(f"WARN  {name}: dtype mismatch on {c}: spark={s[c].dtype} duck={k[c].dtype}")
        bad = []
        for c in sc:
            a, b = s[c], k[c]
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                av = a.astype(float).round(9); bv = b.astype(float).round(9)
                eq = (av == bv) | (av.isna() & bv.isna())
            else:
                eq = (a.astype(str) == b.astype(str))
            if not eq.all():
                i = int(np.argmin(eq.values))
                bad.append(f"{c}[row {i}]: spark={a.iloc[i]!r} duck={b.iloc[i]!r}")
        if bad:
            print(f"FAIL  {name}: {'; '.join(bad[:3])}"); n_fail += 1
        else:
            print(f"PASS  {name}: {len(s)} rows"); n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
