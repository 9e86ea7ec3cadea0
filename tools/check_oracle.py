#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables and compare (sorted columns, sorted
rows, hashed values) with the Verify parquet dumps."""
import duckdb, json, sys, glob, os
import pyarrow.parquet as pq
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    pdir = f"{out_dir}/{name}"
    files = glob.glob(f"{pdir}/*.parquet")
    if not files:
        print(f"MISSING-OUTPUT {name}")
        fail += 1
        continue
    try:
        want = con.execute(sql).df()
    except Exception as e:
        print(f"ORACLE-ERROR {name}: {e}")
        fail += 1
        continue
    got = pd.concat([pq.read_table(f).to_pandas() for f in files])
    def canon(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(by=sorted(df.columns)).reset_index(drop=True)
    try:
        w, g = canon(want), canon(got)
        if list(w.columns) != list(g.columns):
            print(f"SCHEMA-MISMATCH {name}: oracle={list(w.columns)} got={list(g.columns)}")
            fail += 1
        elif len(w) != len(g):
            print(f"ROWCOUNT-MISMATCH {name}: oracle={len(w)} got={len(g)}")
            fail += 1
        else:
            import numpy as np
            eq = True
            for c in w.columns:
                a, b = w[c].values, g[c].values
                if np.issubdtype(w[c].dtype, np.floating):
                    if not np.allclose(a.astype(float), b.astype(float), atol=1e-12, equal_nan=True):
                        eq = False; bad = c; break
                else:
                    if not (pd.Series(a).astype(str) == pd.Series(b).astype(str)).all():
                        eq = False; bad = c; break
            if eq:
                print(f"OK {name} ({len(w)} rows)")
                ok += 1
            else:
                print(f"VALUE-MISMATCH {name}: column {bad}")
                m = (pd.Series(w[bad]).astype(str) != pd.Series(g[bad]).astype(str))
                print(w[m].head(3)); print(g[m].head(3))
                fail += 1
    except Exception as e:
        print(f"COMPARE-ERROR {name}: {e}")
        fail += 1
print(f"\n{ok} OK, {fail} FAIL")
sys.exit(1 if fail else 0)
