#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify's parquet
dumps against DuckDB running the declared oracle SQL on the same tables.

Usage: python3 tools/check.py [sfdir] [outdir]
(run `sbt "runMain graft.Verify <sfdir> <outdir>"` first)
"""
import sys, os, json, glob
import duckdb
from common import register_views

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
register_views(con, sfdir)

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    spark_dir = f"{outdir}/{name}"
    try:
        got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
    except Exception as e:
        fails.append((name, f"spark output unreadable: {e}"))
        continue
    try:
        exp = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"oracle SQL failed: {e}"))
        continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        fails.append((name, f"columns differ: {list(got.columns)} vs {list(exp.columns)}"))
        continue
    if len(got) != len(exp):
        fails.append((name, f"row count: {len(got)} vs {len(exp)}"))
        continue
    if [str(t) for t in got.dtypes] != [str(t) for t in exp.dtypes]:
        fails.append((name, f"dtypes differ: {list(map(str, got.dtypes))} vs {list(map(str, exp.dtypes))}"))
        continue
    # exact value compare, row-order-sensitive (queries carry total ORDER BY)
    diff_cols = []
    for c in got.columns:
        a, b = got[c], exp[c]
        eq = (a == b) | (a.isna() & b.isna())
        if not eq.all():
            i = int((~eq).idxmax())
            diff_cols.append(f"{c} (first diff row {i}: {a[i]!r} vs {b[i]!r})")
    if diff_cols:
        fails.append((name, "values differ: " + "; ".join(diff_cols)))
    else:
        passes.append((name, len(got)))

for name, n in passes:
    print(f"PASS {name} ({n} rows)")
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(passes)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
