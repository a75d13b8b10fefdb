#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: compare Verify's parquet
dumps against DuckDB running the declared oracle SQL on the same tables.

Round-8 hardening (the q194/q208/q212 lesson): the old gate compared pandas
DataFrames, which collapse DECIMAL/HUGEINT/BIGINT to float64 — losing low
digits above 2^53 AND hiding output-type mismatches the driver's hasher
distinguishes (Spark DECIMAL(38,0) vs DuckDB HUGEINT hash differently even
when bit-equal). This gate compares
  (a) column NAMES (sorted, as the driver sorts before hashing),
  (b) column TYPES by exact DuckDB type-name equality — a DECIMAL-vs-HUGEINT
      output now fails locally before the driver ever sees it,
  (c) VALUES through DuckDB's native Python objects (Decimal/int/str/...),
      never pandas — Decimal(x) == int(x) compares exactly at any width.

Usage: python3 tools/check.py [sfdir] [outdir]
(run `sbt "runMain graft.Verify <sfdir> <outdir>"` first)
"""
import sys, math
import json
import duckdb
from common import register_views

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
register_views(con, sfdir)


def cells_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
    return a == b  # Decimal == int compares exactly at any width


oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    spark_dir = f"{outdir}/{name}"
    try:
        got_rel = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
    except Exception as e:
        fails.append((name, f"spark output unreadable: {e}"))
        continue
    try:
        exp_rel = con.sql(sql)
    except Exception as e:
        fails.append((name, f"oracle SQL failed: {e}"))
        continue
    got_schema = sorted(zip(got_rel.columns, [str(t) for t in got_rel.types]))
    exp_schema = sorted(zip(exp_rel.columns, [str(t) for t in exp_rel.types]))
    if [c for c, _ in got_schema] != [c for c, _ in exp_schema]:
        fails.append((name, f"columns differ: {[c for c, _ in got_schema]}"
                            f" vs {[c for c, _ in exp_schema]}"))
        continue
    type_diffs = [f"{gc}: {gt} vs {et}"
                  for (gc, gt), (_, et) in zip(got_schema, exp_schema)
                  if gt != et]
    if type_diffs:
        fails.append((name, "types differ (driver hashes representations, "
                            "not just values): " + "; ".join(type_diffs)))
        continue
    cols = ", ".join(f'"{c}"' for c, _ in got_schema)
    try:
        got = con.sql(f"SELECT {cols} FROM '{spark_dir}/*.parquet'").fetchall()
        exp = con.sql(f"SELECT {cols} FROM ({sql})").fetchall()
    except Exception as e:
        fails.append((name, f"fetch failed: {e}"))
        continue
    if len(got) != len(exp):
        fails.append((name, f"row count: {len(got)} vs {len(exp)}"))
        continue
    # exact value compare, row-order-sensitive (queries carry total ORDER BY)
    diff = None
    for i, (gr, er) in enumerate(zip(got, exp)):
        for (c, _), gv, ev in zip(got_schema, gr, er):
            if not cells_equal(gv, ev):
                diff = f"{c} (first diff row {i}: {gv!r} vs {ev!r})"
                break
        if diff:
            break
    if diff:
        fails.append((name, "values differ: " + diff))
    else:
        passes.append((name, len(got)))

for name, n in passes:
    print(f"PASS {name} ({n} rows)")
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"\n{len(passes)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
