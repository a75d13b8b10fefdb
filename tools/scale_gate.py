#!/usr/bin/env python3
"""Large-scale oracle gate: the same exact cross-engine compare as
tools/check.py, but per-query in a subprocess with a wall-clock budget,
writing a CORRECTNESS-style JSON artifact.

Why it exists (round 12): the per-round gate runs at sf0.01 and the
generated-fixture fuzz gate at sf0.001 — scale is the untested third
axis (overflow in quantizer products, ragged partitions, ANSI-off cast
edges only appear with more rows). At a generated sf1.0 (~6M lineitem,
500k documents) most oracles run fine, but a handful are THEMSELVES
quadratic in the corpus (q127's exact-recall denominator is a full
N-squared shingle-set join: ~1.25e11 list intersections at 500k docs —
years, not minutes, in any engine). Those oracles are a ground-truth
MECHANISM cost, not an engine defect, so the honest scale gate is:

  - every query whose oracle finishes inside the budget must match
    EXACTLY (same compare as check.py: names, types, values, order);
  - a query whose ORACLE exceeds the budget is recorded as
    `oracle_timeout` with its Spark-side row count — its cross-engine
    exactness is covered by the full 301/301 pass at the largest scale
    where its oracle is affordable (the scale=100 run committed beside
    this artifact), and its scale behavior by the Spark-side run + the
    section-6.1 probes.

Usage:
  python3 tools/scale_gate.py SFDIR OUTDIR RESULT_JSON [TIMEOUT_S]
  (run `sbt "runMain graft.Verify SFDIR OUTDIR"` first)
Internal single-query mode (what the parent spawns):
  python3 tools/scale_gate.py SFDIR OUTDIR --one NAME
"""
import json
import math
import subprocess
import sys
import time


def cells_equal(a, b):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
    return a == b


def check_one(sfdir, outdir, name):
    """Exit 0 + 'PASS <rows>' on stdout, exit 1 + 'FAIL <reason>'."""
    import duckdb
    from common import register_views
    con = duckdb.connect()
    register_views(con, sfdir)
    sql = json.load(open(f"{outdir}/oracle_sql.json"))[name]
    spark_dir = f"{outdir}/{name}"
    try:
        got_rel = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
    except Exception as e:
        print(f"FAIL spark output unreadable: {e}")
        return 1
    try:
        exp_rel = con.sql(sql)
    except Exception as e:
        print(f"FAIL oracle SQL failed: {e}")
        return 1
    got_schema = sorted(zip(got_rel.columns, [str(t) for t in got_rel.types]))
    exp_schema = sorted(zip(exp_rel.columns, [str(t) for t in exp_rel.types]))
    if [c for c, _ in got_schema] != [c for c, _ in exp_schema]:
        print(f"FAIL columns differ: {[c for c, _ in got_schema]}"
              f" vs {[c for c, _ in exp_schema]}")
        return 1
    type_diffs = [f"{gc}: {gt} vs {et}"
                  for (gc, gt), (_, et) in zip(got_schema, exp_schema)
                  if gt != et]
    if type_diffs:
        print("FAIL types differ: " + "; ".join(type_diffs))
        return 1
    cols = ", ".join(f'"{c}"' for c, _ in got_schema)
    # phase markers (round-13 ADVICE): duckdb relations are lazy, so the
    # real walls are the two fetchall()s below. The parent exempts a
    # timeout ONLY between spark_read_done and oracle_done — a slow or
    # pathologically large SPARK dump (or a slow compare loop) is an
    # engine-side failure, never billed to the oracle.
    try:
        got = con.sql(f"SELECT {cols} FROM '{spark_dir}/*.parquet'").fetchall()
    except Exception as e:
        print(f"FAIL spark fetch failed: {e}")
        return 1
    print("PHASE spark_read_done", flush=True)
    try:
        exp = con.sql(f"SELECT {cols} FROM ({sql})").fetchall()
    except Exception as e:
        print(f"FAIL oracle fetch failed: {e}")
        return 1
    print("PHASE oracle_done", flush=True)
    if len(got) != len(exp):
        print(f"FAIL row count: {len(got)} vs {len(exp)}")
        return 1
    for i, (gr, er) in enumerate(zip(got, exp)):
        for (c, _), gv, ev in zip(got_schema, gr, er):
            if not cells_equal(gv, ev):
                print(f"FAIL values differ: {c} "
                      f"(first diff row {i}: {gv!r} vs {ev!r})")
                return 1
    print(f"PASS {len(got)}")
    return 0


def spark_rows(outdir, name):
    """Row count of the Spark dump alone (for oracle_timeout records)."""
    import duckdb
    try:
        return duckdb.sql(
            f"SELECT count(*) FROM '{outdir}/{name}/*.parquet'").fetchone()[0]
    except Exception:
        return None


def main():
    if "--one" in sys.argv:
        sfdir, outdir, name = sys.argv[1], sys.argv[2], sys.argv[4]
        sys.exit(check_one(sfdir, outdir, name))
    sfdir, outdir, result_json = sys.argv[1], sys.argv[2], sys.argv[3]
    timeout_s = int(sys.argv[4]) if len(sys.argv) > 4 else 600
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    errors = {}
    try:
        errors = json.load(open(f"{outdir}/_errors.json"))
    except Exception:
        pass
    results = {}
    n_pass = n_fail = n_timeout = 0
    for name in sorted(oracle):
        if name in errors:
            results[name] = {"status": "spark_error",
                             "detail": errors[name], "secs": None}
            n_fail += 1
            print(f"SPARK-ERROR {name}: {errors[name]}", flush=True)
            continue
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, __file__, sfdir, outdir, "--one", name],
                capture_output=True, text=True, timeout=timeout_s,
                cwd=__import__("os").path.dirname(__file__))
            secs = round(time.time() - t0, 1)
            out = (p.stdout or "").strip().splitlines()
            line = out[-1] if out else ""
            if p.returncode == 0 and line.startswith("PASS"):
                results[name] = {"status": "pass",
                                 "rows": int(line.split()[1]), "secs": secs}
                n_pass += 1
                print(f"PASS {name} ({line.split()[1]} rows, {secs}s)",
                      flush=True)
            else:
                detail = line or (p.stderr or "")[-300:]
                results[name] = {"status": "fail", "detail": detail,
                                 "secs": secs}
                n_fail += 1
                print(f"FAIL {name}: {detail}", flush=True)
        except subprocess.TimeoutExpired as e:
            secs = round(time.time() - t0, 1)
            partial = e.stdout or ""
            if not isinstance(partial, str):
                partial = partial.decode(errors="replace")
            in_oracle = ("PHASE spark_read_done" in partial
                         and "PHASE oracle_done" not in partial)
            if in_oracle:
                rows = spark_rows(outdir, name)
                results[name] = {"status": "oracle_timeout", "secs": secs,
                                 "spark_rows": rows}
                n_timeout += 1
                print(f"ORACLE-TIMEOUT {name} (> {timeout_s}s; "
                      f"spark dumped {rows} rows)", flush=True)
            else:
                # timed out reading the Spark dump or in the compare
                # loop — an engine-side cost, counted as a failure
                phase = ("compare" if "PHASE oracle_done" in partial
                         else "spark-read")
                results[name] = {"status": "fail", "secs": secs,
                                 "detail": f"timeout in {phase} phase "
                                           f"(> {timeout_s}s)"}
                n_fail += 1
                print(f"FAIL {name}: timeout in {phase} phase", flush=True)
    summary = {"sfdir": sfdir, "timeout_s": timeout_s,
               "n_pass": n_pass, "n_fail": n_fail,
               "n_oracle_timeout": n_timeout,
               "n_total": len(oracle), "queries": results}
    with open(result_json, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"\n{n_pass} pass / {n_fail} fail / {n_timeout} oracle-timeout "
          f"of {len(oracle)} -> {result_json}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
