#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/verify_local.py [sfDir] [outDir]

Reads outDir/<name>/ parquet (written by graft.Verify) and outDir/
oracle_sql.json, runs each SQL in DuckDB against the same tables, and
compares: column set, dtypes, row count, and exact values (columns sorted
by name, rows in result order; also reports whether a row-sorted compare
would pass, since the driver's exact row-order policy is unknown).
"""
import sys, os, json, glob, math
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df):
    return df[sorted(df.columns)].reset_index(drop=True)

def eq_cell(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        # The driver hashes pandas values bitwise: -0.0 != +0.0 there, so
        # mirror that here (plain == treats them as equal and once hid a
        # real driver failure — the r13 text_dsir signed-zero cell).
        if a == 0.0 and b == 0.0:
            return math.copysign(1.0, a) == math.copysign(1.0, b)
        return a == b
    import numpy as np
    if isinstance(a, (list, tuple, np.ndarray)) or isinstance(b, (list, tuple, np.ndarray)):
        if a is None or b is None:
            return False
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(eq_cell(x, y) for x, y in zip(la, lb))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    return a == b

def cmp(name, sdf, odf):
    problems = []
    if sorted(sdf.columns) != sorted(odf.columns):
        return [f"COLUMNS spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"]
    s, o = canon(sdf), canon(odf)
    for c in s.columns:
        if str(s[c].dtype) != str(o[c].dtype):
            problems.append(f"dtype[{c}] spark={s[c].dtype} oracle={o[c].dtype}")
    if len(s) != len(o):
        problems.append(f"ROWS spark={len(s)} oracle={len(o)}")
        return problems
    bad = 0
    for c in s.columns:
        sv, ov = s[c].tolist(), o[c].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if not eq_cell(a, b):
                if bad < 3:
                    problems.append(f"VAL[{c}][row {i}] spark={a!r} oracle={b!r}")
                bad += 1
    if bad:
        problems.append(f"... {bad} mismatched cells")
    return problems

names = sorted(oracle)
npass = 0
for name in names:
    pdir = f"{out}/{name}"
    if not os.path.isdir(pdir):
        print(f"FAIL {name}: no spark output dir")
        continue
    try:
        sdf = con.execute(f"SELECT * FROM read_parquet('{pdir}/*.parquet')").df()
    except Exception as e:
        print(f"FAIL {name}: read spark output: {e}")
        continue
    try:
        odf = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        continue
    problems = cmp(name, sdf, odf)
    if not problems:
        npass += 1
        print(f"PASS {name} ({len(sdf)} rows)")
    else:
        print(f"FAIL {name}:")
        for p in problems:
            print(f"    {p}")

missing = [q for q in glob.glob(f"{out}/*/") if os.path.basename(q.rstrip('/')) not in oracle]
if missing:
    print("no-oracle outputs (rows-only check):", [os.path.basename(m.rstrip('/')) for m in missing])
print(f"== {npass}/{len(names)} PASS")
