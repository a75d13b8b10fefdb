#!/usr/bin/env python3
"""SPEED-style Spark-vs-DuckDB walls at a generated sf1.0-equivalent
(round-13 verdict task 5: the "within 2x of baseline at the same scale
factor" bar had only ever been measured at sf0.1; the sf1.0 gate runs
both engines but records one combined wall).

Usage:
  python3 tools/speed_sf1.py GENDIR BENCH_RUNS_JSON NAMES_CSV OUT_MD \
      [ORACLE_SQL_JSON]

  GENDIR           generated fixture dir (tools/gen_testdata.py GENDIR 1000)
  BENCH_RUNS_JSON  the bench_runs.json written by running
                   SPARK_GRAFT_SF_DIR=GENDIR sbt "runMain graft.Bench <NAMES_CSV>"
                   (per-query best-of-3; copy it aside -- Bench overwrites
                   the repo-root artifact, `git checkout` it after)
  NAMES_CSV        comma-separated query names to compare
  ORACLE_SQL_JSON  defaults to /tmp/graft_verify/oracle_sql.json

DuckDB side: each oracle SQL fetchall, best of 2 (the SPEED.md
methodology). No timeout -- the heavy oracles ARE the measurement.
"""
import json
import sys
import time

import duckdb
from common import register_views


def main():
    gendir, bench_json, names_csv, out_md = sys.argv[1:5]
    oracle_path = sys.argv[5] if len(sys.argv) > 5 \
        else "/tmp/graft_verify/oracle_sql.json"
    spark_best = json.load(open(bench_json))["best"]
    oracle = json.load(open(oracle_path))
    names = [n for n in names_csv.split(",") if n]
    con = duckdb.connect()
    register_views(con, gendir)
    rows = []
    for n in names:
        s = spark_best.get(n)
        d = None
        err = None
        ts = []
        for _ in range(2):
            t0 = time.time()
            try:
                con.sql(oracle[n]).fetchall()
            except Exception as e:
                err = f"{type(e).__name__}: {e}"[:120]
                break
            ts.append(time.time() - t0)
        if ts:
            d = min(ts)
        rows.append((n, s, d, err))
        print(f"{n}: spark={s} duckdb="
              f"{round(d, 2) if d is not None else err}", flush=True)
    with open(out_md, "w") as f:
        f.write("# SPEED at generated sf1.0-equivalent "
                "(~6M lineitem, 1M events, 15.8k docs)\n\n")
        f.write(f"Fixture: `tools/gen_testdata.py {gendir} 1000` "
                "(TESTDATA-schema-identical, Heaps-law vocab, "
                "sub-linear doc/embedding growth).\n")
        f.write("Spark = `graft.Bench` best-of-3 on the gendir "
                "(local[32], warmup pass first). DuckDB = the same "
                "oracle SQL, fetchall, best-of-2, same parquet.\n\n")
        f.write("| query | spark s | duckdb s | ratio |\n")
        f.write("|---|---|---|---|\n")
        for n, s, d, err in sorted(rows):
            if s is None:
                continue
            if d is None:
                f.write(f"| {n} | {s:.3f} | {err} | - |\n")
            else:
                r = s / d if d > 0 else float("inf")
                f.write(f"| {n} | {s:.3f} | {d:.3f} | {r:.1f}x |\n")
        weak = [(n, s, d) for n, s, d, _ in rows
                if s is not None and d is not None and s > 1.0 and s > 2 * d]
        f.write(f"\nWeak screen at sf1.0 (Spark > 1 s AND > 2x DuckDB): "
                f"{len(weak)} rows"
                + (": " + ", ".join(n for n, _, _ in weak) if weak else "")
                + ".\n")
    print(f"wrote {out_md}")


if __name__ == "__main__":
    main()
