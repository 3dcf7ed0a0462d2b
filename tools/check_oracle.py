#!/usr/bin/env python3
"""Local oracle gate: run graft.Verify first, then compare its parquet dumps
against the DuckDB oracle SQL it emitted, exactly like the driver does
(sort columns by name, rows by value, float tolerance).

Usage: python3 tools/check_oracle.py <sfDir> <voutDir> [query ...]
"""
import json, sys, glob, os
import duckdb
import pandas as pd, numpy as np
import pyarrow.parquet as pq

sf, vout = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(os.path.join(vout, 'oracle_sql.json')))
bad = []
names = sorted(n for n in oracle if not only or n in only)
for name in names:
    sql = oracle[name]
    d = os.path.join(vout, name)
    try:
        files = sorted(glob.glob(d + '/part-*.parquet'))
        s = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
        o = con.sql(sql).df()
        s = s[sorted(s.columns)]; o = o[sorted(o.columns)]
        if list(s.columns) != list(o.columns):
            bad.append((name, 'schema', list(s.columns), list(o.columns))); continue
        if len(s) != len(o):
            bad.append((name, 'rows', len(s), len(o))); continue
        s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
        o = o.sort_values(by=list(o.columns)).reset_index(drop=True)
        for c in s.columns:
            sv, ov = s[c], o[c]
            try:
                svf = sv.astype(float); ovf = ov.astype(float)
                if not np.allclose(svf, ovf, rtol=1e-9, atol=1e-9, equal_nan=True):
                    bad.append((name, 'values', c)); break
            except (ValueError, TypeError):
                if not (sv.astype(str).values == ov.astype(str).values).all():
                    bad.append((name, 'values', c)); break
    except Exception as e:
        bad.append((name, 'err', str(e)[:200]))
print(f'checked {len(names)} queries; mismatches: {len(bad)}')
for b in bad:
    print(b)
sys.exit(1 if bad else 0)
