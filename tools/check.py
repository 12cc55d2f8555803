#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify output
against oracle_sql.json in DuckDB over the same parquet, compare
(columns sorted by name, rows sorted). Floats are compared EXACTLY
(bit-identical, by design — SURVEY §5 requires decimal-before-
arithmetic so both engines produce identical doubles); only the diff
magnitude is reported on mismatch. Usage: check.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import os
import sys

import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = f.split("/")[-1].removesuffix(".parquet")
    # driver testdata tables are single files; Stress-generated corpora
    # are Spark parquet DIRECTORIES of part files
    pat = f"{f}/*.parquet" if os.path.isdir(f) else f
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{pat}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        fail += 1
        continue
    try:
        got = pd.concat(
            [pd.read_parquet(p) for p in sorted(glob.glob(f"{outdir}/{name}/*.parquet"))],
            ignore_index=True)
    except Exception as e:
        print(f"FAIL {name}: spark output missing: {e}")
        fail += 1
        continue
    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
        fail += 1
        continue
    # The driver hash-compares stringified values, so an int column on one
    # side vs float on the other (e.g. DuckDB SUM(BIGINT) -> HUGEINT ->
    # pandas float64) mismatches even when the numbers are equal. Catch it.
    kind_bad = [
        f"{c}: exp={exp[c].dtype} got={got[c].dtype}"
        for c in exp.columns
        if {exp[c].dtype.kind, got[c].dtype.kind} == {"i", "f"}
        or {exp[c].dtype.kind, got[c].dtype.kind} == {"u", "f"}
    ]
    if kind_bad:
        print(f"FAIL {name}: int-vs-float dtype mismatch (driver hash would differ): {kind_bad}")
        fail += 1
        continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
        fail += 1
        continue
    exp = exp.sort_values(list(exp.columns), ignore_index=True)
    got = got.sort_values(list(got.columns), ignore_index=True)
    bad = []
    for c in exp.columns:
        ev, gv = exp[c], got[c]
        for i in range(len(ev)):
            e, g = ev.iloc[i], gv.iloc[i]
            if isinstance(e, float) or isinstance(g, float):
                ef = float(e) if e is not None else math.nan
                gf = float(g) if g is not None else math.nan
                if math.isnan(ef) and math.isnan(gf):
                    continue
                if ef != gf:
                    bad.append(f"{c}[{i}]: exp={e!r} got={g!r} (diff={gf-ef:g})")
            else:
                if str(e) != str(g):
                    bad.append(f"{c}[{i}]: exp={e!r} got={g!r}")
            if len(bad) > 4:
                break
        if len(bad) > 4:
            break
    if bad:
        print(f"FAIL {name}: {len(bad)}+ value mismatches")
        for b in bad:
            print(f"      {b}")
        fail += 1
    else:
        print(f"PASS {name} ({len(exp)} rows)")
print(f"{'ALL PASS' if fail == 0 else f'{fail} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fail else 0)
