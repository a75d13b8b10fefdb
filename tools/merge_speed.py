#!/usr/bin/env python3
"""Merge a targeted graft.Bench run into SPEED.md (insert-or-update rows
in sorted position, retotal), timing the DuckDB side for the new rows.

The full-table regeneration (tools/compare_bench.py) stays the per-round
artifact; this tool keeps the declared->SPEED DocsSpec ratchet green
between full regens when a new query lands: its row carries honestly
measured numbers from the same actions the full run uses (Spark noop-sink
best-of-3 via graft.Bench, DuckDB fetchall best-of-2 here).

Usage: python3 tools/merge_speed.py /tmp/q172_bench.txt /tmp/v/oracle_sql.json /root/testdata/sf0.1
"""
import sys, json, re, time
import duckdb
from common import register_views

bench_file, oracle_file, sfdir = sys.argv[1], sys.argv[2], sys.argv[3]
raw = open(bench_file).read()
bench = json.loads(raw[raw.index('{"metric"'):])
oracle = json.load(open(oracle_file))

con = duckdb.connect()
register_views(con, sfdir)

lines = open("SPEED.md").read().splitlines(keepends=True)
row_re = re.compile(r"^\| (q\S+) \| ([0-9.]+|FAILED) \| ([0-9.]+|—).*\|")

# existing rows keep their LINE verbatim (ratios there were computed from
# unrounded timings by compare_bench.py — recomputing from the rounded
# table values would perturb every small-denominator row)
row_lines = {}   # name -> (line, spark, duck)
head, tail = [], []
for l in lines:
    m = row_re.match(l)
    if m:
        s = None if m.group(2) == "FAILED" else float(m.group(2))
        d = None if m.group(3) == "—" else float(m.group(3))
        row_lines[m.group(1)] = (l, s, d)
    elif l.startswith("| **total"):
        pass  # recomputed below
    elif not row_lines:
        head.append(l)
    else:
        tail.append(l)

for q, spark_t in bench["queries"].items():
    if spark_t < 0:
        row_lines[q] = (f"| {q} | FAILED | — | — |\n", None, None); continue
    if q not in oracle:
        # "not in this oracle dump" is NOT "no oracle": a targeted
        # Verify dumps only its prefix's SQL, and merging against that
        # once mislabeled two hash-exact queries (q244/q246) as
        # no-oracle in the headline table. Only a query the library
        # itself declares oracle-less gets the rows-only row.
        sys.exit(f"ERROR: {q} missing from {oracle_file} — pass a FULL "
                 "oracle dump (run Verify with no prefix arg) so an "
                 "oracle'd query can't be mislabeled 'no oracle'. If the "
                 "query is genuinely rows-only (SparkEntry.oracleSql has "
                 "no entry), regenerate via tools/compare_bench.py.")
    ts = []
    for _ in range(2):
        t0 = time.time(); con.sql(oracle[q]).fetchall(); ts.append(time.time() - t0)
    d = min(ts)
    row_lines[q] = (f"| {q} | {spark_t:.3f} | {d:.3f} | {spark_t/d:.1f}× |\n", spark_t, d)
    print(f"{q}: spark {spark_t:.3f} s, duckdb {d:.3f} s")

with open("SPEED.md", "w") as f:
    f.writelines(head)
    st = dt = 0.0
    for q in sorted(row_lines):
        l, s, d = row_lines[q]
        f.write(l)
        if s is not None and d is not None:
            st += s; dt += d
    f.write(f"| **total (oracle'd queries)** | **{st:.2f}** | **{dt:.2f}** | **{st/dt:.2f}×** |\n")
    f.writelines(tail)
print(f"SPEED.md merged: {len(row_lines)} rows, totals {st:.2f} vs {dt:.2f}")
