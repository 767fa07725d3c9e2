#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
outputs against the DuckDB oracle SQL and report per-query match.
Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ['lineitem','orders','customer','nation','region','documents',
          'embeddings','events','part','supplier']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(os.path.join(out, 'oracle_sql.json')))
fail = 0
for name, sql in sorted(oracle.items()):
    pdir = os.path.join(out, name)
    files = glob.glob(pdir + '/*.parquet')
    if not files:
        print(f"{name:34s} NO-SPARK-OUTPUT"); fail += 1; continue
    try:
        got = con.execute(f"SELECT * FROM read_parquet('{pdir}/*.parquet')").fetchdf()
        want = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name:34s} ORACLE-ERROR {str(e).splitlines()[0][:100]}"); fail += 1; continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        print(f"{name:34s} SCHEMA-MISMATCH spark={gc} duck={wc}"); fail += 1; continue
    g = got[gc].astype(str).apply(lambda r: '\x01'.join(r), axis=1).sort_values().tolist()
    w = want[wc].astype(str).apply(lambda r: '\x01'.join(r), axis=1).sort_values().tolist()
    if len(g) != len(w):
        print(f"{name:34s} ROWCOUNT spark={len(g)} duck={len(w)}"); fail += 1; continue
    if g != w:
        diff = [i for i, (a, b) in enumerate(zip(g, w)) if a != b][:3]
        print(f"{name:34s} VALUE-MISMATCH rows={len(g)} firstdiffs=" +
              "; ".join(f"[{i}] spark={g[i][:90]!r} duck={w[i][:90]!r}" for i in diff))
        fail += 1; continue
    print(f"{name:34s} OK rows={len(g)}")
print(f"\n{'ALL OK' if fail == 0 else str(fail) + ' FAILURES'}")
sys.exit(1 if fail else 0)
