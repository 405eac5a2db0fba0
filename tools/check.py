#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: for each query output
parquet under OUTDIR, run the matching oracle SQL from oracle_sql.json in
DuckDB over the sf parquet tables, and compare (rows, schema, values).
Values are compared after sorting columns by name and rows by all columns.
Usage: python tools/check.py <sfDir> <outDir> [--json <path>]
With --json, also writes a machine-readable summary
{"passed": n, "total": n, "failed": [names]} for the both-SF gate artifact.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
json_out = sys.argv[sys.argv.index("--json") + 1] if "--json" in sys.argv else None
passed_names = []
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    qdir = f"{outdir}/{name}"
    if not os.path.isdir(qdir):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        mine = pd.read_parquet(qdir)
    except Exception as e:
        print(f"FAIL {name}: cannot read spark output: {e}"); fails += 1; continue
    try:
        ref = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}"); fails += 1; continue

    def norm(df):
        df = df[sorted(df.columns)].copy()
        import datetime
        for c in df.columns:
            if df[c].dtype == object:
                nn = df[c].dropna()
                if len(nn) and isinstance(nn.iloc[0], (datetime.date, datetime.datetime)):
                    df[c] = pd.to_datetime(df[c]).dt.strftime("%Y-%m-%d %H:%M:%S")
            elif np.issubdtype(df[c].dtype, np.datetime64):
                df[c] = pd.to_datetime(df[c]).dt.strftime("%Y-%m-%d %H:%M:%S")
            elif np.issubdtype(df[c].dtype, np.floating):
                df[c] = df[c].astype("float64")
            elif np.issubdtype(df[c].dtype, np.integer):
                df[c] = df[c].astype("int64")
            elif df[c].dtype == bool:
                df[c] = df[c].astype("int64")
        return df.sort_values(by=list(df.columns), ignore_index=True)

    if sorted(mine.columns) != sorted(ref.columns):
        print(f"FAIL {name}: columns {sorted(mine.columns)} vs {sorted(ref.columns)}")
        fails += 1; continue
    if len(mine) != len(ref):
        print(f"FAIL {name}: rows {len(mine)} vs {len(ref)}"); fails += 1; continue
    a, b = norm(mine), norm(ref)
    try:
        eq = a.equals(b)
        if not eq:
            # find the first differing cell for diagnosis
            diffcols = [c for c in a.columns if not a[c].equals(b[c])]
            detail = []
            for c in diffcols[:3]:
                mask = ~((a[c] == b[c]) | (a[c].isna() & b[c].isna()))
                i = mask.idxmax()
                detail.append(f"{c}[{i}]: {a[c][i]!r} vs {b[c][i]!r} (n_diff={int(mask.sum())})")
            print(f"FAIL {name}: value mismatch in {diffcols} :: {'; '.join(detail)}")
            fails += 1; continue
    except Exception as e:
        print(f"FAIL {name}: compare error {e}"); fails += 1; continue
    print(f"PASS {name} ({len(mine)} rows)")
    passed_names.append(name)

print(f"\n{len(oracle) - fails}/{len(oracle)} passed")
if json_out:
    failed_names = sorted(set(oracle) - set(passed_names))
    json.dump({"passed": len(oracle) - fails, "total": len(oracle),
               "failed": failed_names}, open(json_out, "w"))
sys.exit(1 if fails else 0)
