#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/oracle_check.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every SQL in
oracle_sql.json, and compares to the Spark result parquet: columns sorted by
name, rows sorted by all columns, values compared exactly (floats by bit
pattern after float64 coercion).
"""
import sys, json, math
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
import os
fails = []
skipped = 0
for name, sql in sorted(oracle.items()):
    # a filtered Verify run (SPARK_GRAFT_ONLY) writes only selected queries;
    # absent outputs are "not run" there — but in a FULL run a missing dir
    # means the query crashed before writing, which must stay a failure
    if not os.path.isdir(f"{outdir}/{name}") and os.environ.get("SPARK_GRAFT_ONLY"):
        skipped += 1
        continue
    try:
        want = con.sql(sql).df()
        got = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        want = want.reindex(sorted(want.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(want.columns) != list(got.columns):
            fails.append((name, f"columns {list(got.columns)} != {list(want.columns)}"))
            continue
        if len(want) != len(got):
            fails.append((name, f"rows {len(got)} != {len(want)}"))
            continue
        ws = want.sort_values(by=list(want.columns)).reset_index(drop=True)
        gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        diff = None
        # The driver hashes TYPED values, so dtype drift (e.g. DuckDB HUGEINT
        # for integer SUM vs Spark int64) is a failure even when str() matches.
        for c in want.columns:
            if str(ws[c].dtype) != str(gs[c].dtype):
                diff = f"{c}: dtype {gs[c].dtype} != {ws[c].dtype}"
                break
        for c in want.columns if not diff else []:
            for i, (a, b) in enumerate(zip(ws[c], gs[c])):
                if a is None and b is None:
                    continue
                try:
                    if isinstance(a, float) or isinstance(b, float):
                        fa, fb = float(a), float(b)
                        if math.isnan(fa) and math.isnan(fb):
                            continue
                        if fa != fb:
                            diff = f"{c}[{i}]: {b!r} != {a!r}"
                            break
                    elif type(a) is not type(b):
                        diff = f"{c}[{i}]: type {type(b).__name__} != {type(a).__name__} ({b!r} vs {a!r})"
                        break
                    elif a != b:
                        diff = f"{c}[{i}]: {b!r} != {a!r}"
                        break
                except Exception as e:
                    diff = f"{c}[{i}]: compare error {e}"
                    break
            if diff:
                break
        if diff:
            fails.append((name, diff))
        else:
            print(f"OK    {name} ({len(got)} rows)")
    except Exception as e:
        fails.append((name, f"error: {e}"))
for name, why in fails:
    print(f"FAIL  {name}: {why}")
ran = len(oracle) - skipped
note = f" ({skipped} not run)" if skipped else ""
print(f"\n{ran - len(fails)}/{ran} queries match{note}")
sys.exit(1 if fails else 0)
