#!/usr/bin/env python3
"""Local correctness harness mirroring the driver's DuckDB-oracle check.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

Reads <out>/<name>/ parquet (Spark results) + <out>/oracle_sql.json,
runs each oracle in DuckDB with tables registered as views over
<sf_dir>/*.parquet, and compares: schema (column names sorted), row
count, and cell-exact values (after sorting columns by name and rows
by all columns). Reports per-query PASS/FAIL with diffs.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize types for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].apply(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    out, sf = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table dir (e.g. ScaleUp slices)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    names = sorted([os.path.basename(p) for p in glob.glob(f"{out}/*") if os.path.isdir(p)])
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            ok = len(got) > 0
            print(f"{'ROWS' if ok else 'FAIL'} {name}: rows={len(got)} (no oracle)")
            n_rows_only += ok; n_fail += (not ok); continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        g, e = norm(got.copy()), norm(exp.copy())
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns spark={list(g.columns)} oracle={list(e.columns)}")
            n_fail += 1; continue
        # The driver's hash is TYPE-sensitive (r9 lesson: an uncast
        # DuckDB sum() promoted BIGINT->HUGEINT and failed the driver
        # hash on value-identical results). Mirror that: numeric kind
        # AND width must match exactly; HUGEINT surfaces as float64 or
        # object against Spark's int64 and fails here.
        dt_bad = [(c, str(g[c].dtype), str(e[c].dtype)) for c in g.columns
                  if g[c].dtype.kind != e[c].dtype.kind
                  or (g[c].dtype.kind in "iuf" and g[c].dtype != e[c].dtype)]
        if dt_bad:
            print(f"FAIL {name}: dtype mismatch (driver hash is type-sensitive) {dt_bad}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL {name}: rowcount spark={len(g)} oracle={len(e)}")
            n_fail += 1; continue
        bad = []
        for c in g.columns:
            gv, ev = g[c].values, e[c].values
            if pd.api.types.is_float_dtype(g[c]) or pd.api.types.is_float_dtype(e[c]):
                eq = np.array_equal(np.asarray(gv, dtype=float), np.asarray(ev, dtype=float), equal_nan=True)
                if not eq:
                    close = np.allclose(np.asarray(gv, dtype=float), np.asarray(ev, dtype=float), rtol=1e-12, equal_nan=True)
                    bad.append((c, "float-close" if close else "float-diff"))
            else:
                if not (pd.Series(gv).astype(object).equals(pd.Series(ev).astype(object))):
                    bad.append((c, "diff"))
        if bad:
            print(f"FAIL {name}: cell diffs {bad}")
            for c, _ in bad[:2]:
                mask = ~(g[c].astype(object) == e[c].astype(object))
                print(f"  {c}: first diffs spark={g[c][mask].head(3).tolist()} oracle={e[c][mask].head(3).tolist()}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(g)}")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_rows_only} rows-only, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
