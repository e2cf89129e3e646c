#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: read Verify output
parquet per query, run the oracle SQL in DuckDB over the sf tables, and
compare (schema-insensitively: columns sorted by name, rows sorted,
values stringified). Driver-side tooling only — not part of the library."""
import sys, os, json, glob
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fails = 0
for name, sql in sorted(oracle.items()):
    qdir = f"{out_dir}/{name}"
    files = glob.glob(f"{qdir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        duck_df = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {str(e)[:200]}"); fails += 1; continue
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}"); fails += 1; continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}"); fails += 1; continue
    # exact compare with small float tolerance fallback
    eq = True
    for c in s.columns:
        a, b = s[c].values, d[c].values
        import numpy as np
        if np.issubdtype(s[c].dtype, np.floating) or np.issubdtype(d[c].dtype, np.floating):
            if not np.allclose(a.astype(float), b.astype(float), rtol=0, atol=1e-9, equal_nan=True):
                bad = np.where(~np.isclose(a.astype(float), b.astype(float), rtol=0, atol=1e-9))[0][:3]
                print(f"FAIL {name}: col {c} differs at rows {bad}: spark={a[bad]} duck={b[bad]}")
                eq = False; break
        else:
            if not (a == b).all():
                import numpy as np
                bad = np.where(a != b)[0][:3]
                print(f"FAIL {name}: col {c} differs at rows {bad}: spark={a[bad]} duck={b[bad]}")
                eq = False; break
    if eq:
        print(f"OK   {name} ({len(s)} rows)")
    else:
        fails += 1
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
