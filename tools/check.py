#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view named after the table,
runs every oracle_sql.json entry, and compares against the Spark result
parquet (columns sorted by name, row order as produced, floats compared
exactly — they are pre-rounded on both sides).
"""
import json, sys, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    res_path = f"{out_dir}/{name}"
    if not glob.glob(f"{res_path}/*.parquet"):
        print(f"FAIL {name}: no spark result parquet"); fail += 1; continue
    try:
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fail += 1; continue
    got = con.execute(f"SELECT * FROM '{res_path}/*.parquet'").fetchdf()
    want = want[sorted(want.columns)]
    got = got[sorted(got.columns)]
    if list(want.columns) != list(got.columns):
        print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}"); fail += 1; continue
    if len(want) != len(got):
        print(f"FAIL {name}: rows {len(got)} != {len(want)}"); fail += 1; continue
    mismatch = None
    for c in want.columns:
        wv, gv = want[c].tolist(), got[c].tolist()
        if wv != gv:
            idx = next(i for i, (a, b) in enumerate(zip(wv, gv)) if a != b)
            mismatch = (c, idx, gv[idx], wv[idx]); break
    if mismatch:
        c, i, g, w = mismatch
        print(f"FAIL {name}: col {c} row {i}: spark={g!r} oracle={w!r}"); fail += 1
    else:
        print(f"OK   {name} ({len(got)} rows)")
print(f"{'ALL OK' if fail == 0 else f'{fail} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fail else 0)
