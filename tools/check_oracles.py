#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle_sql in
DuckDB over the sfDir tables and compare (column-name-sorted, row-sorted)
against the Spark parquet output."""
import duckdb, json, sys, glob, os
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for f in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        print(f"{name}: MISSING spark output"); fails.append(name); continue
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fails.append(name); continue
    got = pd.concat([pd.read_parquet(f) for f in spark_files])
    def canon(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime"):
                df[c] = df[c].astype("datetime64[us]")
            if df[c].dtype == object:
                # list/array cells are unhashable (numpy.ndarray breaks
                # sort_values' factorize) — canonicalize to a JSON-ish
                # string so the compare still runs, but WARN loudly: the
                # DRIVER's harness has no such guard and would record a
                # harness error for this query (the round-5 failure mode).
                # Queries must project scalars; this guard exists so the
                # divergence is a visible warning, not a silent crash.
                has_list = df[c].map(
                    lambda v: isinstance(v, (list, tuple))
                    or type(v).__name__ == "ndarray").any()
                if has_list:
                    print(f"{name}: WARN array-typed column '{c}' — the "
                          "driver's gate cannot sort this; project a scalar")
                    df[c] = df[c].map(
                        lambda v: str(list(v)) if isinstance(v, (list, tuple))
                        or type(v).__name__ == "ndarray" else v)
                df[c] = df[c].astype(str)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    w, g = canon(want), canon(got)
    if sorted(w.columns) != sorted(g.columns):
        print(f"{name}: COLUMN MISMATCH want={list(w.columns)} got={list(g.columns)}")
        fails.append(name); continue
    if len(w) != len(g):
        print(f"{name}: ROWCOUNT want={len(w)} got={len(g)}"); fails.append(name); continue
    # exact compare (driver hashes values)
    eq = True
    for c in w.columns:
        wc, gc = w[c], g[c].astype(w[c].dtype) if w[c].dtype != g[c].dtype else g[c]
        if str(w[c].dtype) == 'float64':
            import numpy as np
            if not ((wc.values == gc.values) | (np.isnan(wc.values) & np.isnan(gc.values))).all():
                eq = False; bad = c; break
        else:
            if not (wc.values == gc.values).all():
                eq = False; bad = c; break
    if not eq:
        print(f"{name}: VALUE MISMATCH in column {bad}")
        m = (w[bad].values != g[bad].values)
        print("  want:", w[m].head(3).to_dict('records'))
        print("  got :", g[m].head(3).to_dict('records'))
        fails.append(name); continue
    print(f"{name}: OK ({len(w)} rows)")

print()
print(f"{len(oracle)-len(fails)}/{len(oracle)} oracle-checked queries match")
sys.exit(1 if fails else 0)
