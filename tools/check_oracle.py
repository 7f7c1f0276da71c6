#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare (schema, rows, values)
with the Spark output parquet written by graft.Verify.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir> [names]
  names: optional comma-separated query-name filter (same syntax as
  graft.Verify's 3rd arg), for chunked or per-query runs.
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if len(sys.argv) > 3:
        keep = set(sys.argv[3].split(","))
        oracle = {k: v for k, v in oracle.items() if k in keep}
    n_pass = n_fail = 0
    for name in sorted(oracle):
        try:
            exp = con.execute(oracle[name]).df()
            got = pd.concat([pd.read_parquet(p) for p in
                             sorted(glob.glob(f"{outdir}/{name}/*.parquet"))])
            got = got[sorted(got.columns)].reset_index(drop=True)
            exp = exp[sorted(exp.columns)].reset_index(drop=True)
            if list(got.columns) != list(exp.columns):
                raise AssertionError(f"columns differ: {list(got.columns)} vs {list(exp.columns)}")
            if got.shape != exp.shape:
                raise AssertionError(f"shape differs: {got.shape} vs {exp.shape}")
            for c in got.columns:
                g, e = got[c], exp[c]
                if g.dtype.kind == 'f' or e.dtype.kind == 'f':
                    ok = ((g.isna() & e.isna()) | (g == e)).all()
                else:
                    ok = g.astype(object).where(pd.notna(g), None).equals(
                        e.astype(object).where(pd.notna(e), None))
                if not ok:
                    bad = (g != e) & ~(g.isna() & e.isna())
                    i = bad[bad].index[0]
                    raise AssertionError(
                        f"col {c} (got {g.dtype} vs exp {e.dtype}) differs at row {i}: "
                        f"{g.iloc[i]!r} vs {e.iloc[i]!r}")
            print(f"PASS {name} ({got.shape[0]} rows)")
            n_pass += 1
        except Exception as ex:
            print(f"FAIL {name}: {ex}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
