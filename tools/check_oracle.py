#!/usr/bin/env python3
"""Local approximation of the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each <sfDir>/<table>.parquet as a DuckDB view named <table>,
runs every oracle SQL from <outDir>/oracle_sql.json, loads the Spark dump
<outDir>/<name>/*.parquet, sorts columns by name and rows by all columns,
and compares (exact for non-floats, 1e-9 relative for floats).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def load_spark(outdir, name):
    files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not files:
        return None
    return pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)

def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def compare(name, got, exp):
    if got is None:
        return f"{name}: MISSING spark output"
    if sorted(got.columns) != sorted(exp.columns):
        return f"{name}: SCHEMA mismatch spark={sorted(got.columns)} oracle={sorted(exp.columns)}"
    if len(got) != len(exp):
        return f"{name}: ROWS {len(got)} vs {len(exp)}"
    g, e = canon(got), canon(exp)
    for c in g.columns:
        gv, ev = g[c], e[c]
        if np.issubdtype(gv.dtype, np.floating) or np.issubdtype(ev.dtype, np.floating):
            gv = gv.astype(float); ev = ev.astype(float)
            both_nan = gv.isna() & ev.isna()
            close = np.isclose(gv.fillna(0), ev.fillna(0), rtol=1e-9, atol=1e-12)
            bad = ~(both_nan | (close & (gv.isna() == ev.isna())))
            if bad.any():
                i = bad.idxmax()
                return f"{name}: COL {c} differs at row {i}: {gv[i]!r} vs {ev[i]!r} ({int(bad.sum())} rows)"
        else:
            if not gv.astype(object).where(pd.notna(gv), None).equals(
                   ev.astype(object).where(pd.notna(ev), None)):
                neq = (gv.astype(str) != ev.astype(str))
                i = neq.idxmax()
                return f"{name}: COL {c} differs at row {i}: {gv[i]!r} vs {ev[i]!r} ({int(neq.sum())} rows)"
    return f"{name}: OK ({len(got)} rows)"

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    if only is not None:
        oracle = {k: v for k, v in oracle.items() if k in only}
    fails = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as ex:
            print(f"{name}: ORACLE SQL ERROR {ex}")
            fails += 1
            continue
        msg = compare(name, load_spark(outdir, name), exp)
        print(msg)
        if "OK" not in msg:
            fails += 1
    # queries with no oracle → rows-only check
    for name in sorted(os.listdir(outdir)):
        d = os.path.join(outdir, name)
        if os.path.isdir(d) and name not in oracle:
            df = load_spark(outdir, name)
            n = 0 if df is None else len(df)
            print(f"{name}: rows-only ({n} rows){' — EMPTY!' if n == 0 else ''}")
            if n == 0:
                fails += 1
    print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
    sys.exit(1 if fails else 0)

if __name__ == "__main__":
    main()
