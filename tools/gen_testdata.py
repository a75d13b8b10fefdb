#!/usr/bin/env python3
"""Deterministic sf0.001-shaped fixture generator for the CI oracle gate.

The round driver stages its own generated parquet (TESTDATA.md, seed=42)
for local rounds; CI must not SKIP the oracle gate when no fixture URI
is configured (a silently-skipped gate reads as green — the worst kind
of red). This script regenerates schema-identical, deterministic tables
(same column names, arrow types, key ranges, and value domains as the
TESTDATA.md fixtures — verified against them field by field) so the
cross-engine gate ALWAYS runs: tools/check.py compares the Spark dump
and the DuckDB oracle over the SAME parquet, so any valid instance of
the schema exercises every declared query end to end.

Usage: gen_testdata.py OUTDIR [SCALE]
  SCALE defaults to 1 (= the sf0.001 row counts); the driver's own
  fixtures remain the source of truth for local rounds — this exists so
  the CI gate can never silently skip.

Coverage status (round 11, verified by running the full gate on this
generator's output): 301/301 oracle-exact, 295/301 with non-empty
results. Planted structure keeps the gate non-vacuous: ~10% near-dup +
~2% exact-dup documents and embeddings (the LSH/near-dup/cluster
families), grid-quantized embedding components (k/1000 — float32
storage then stays ≥ ~0.4997 from every round(x·1000) boundary, so a
float-vs-double promotion can't flip a cell cross-engine), TPC-H color
words in p_name, and a ~0.5% bulk-order tail (8-12 lines, qty 30-50).
Known-sparse on generated data (0 rows both engines, populated on the
real fixtures): q36/q157/q158/q162/q204/q209 — distribution-sensitive
TPC-H predicates (late-supplier / volume-shipping / interval-overlap).
"""
import json
import os
import random
import sys
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = ("the a data table row column key value query join filter sort "
         "merge agg group window batch stream spark part order line "
         "customer small big fast slow hash scan vector dup").split()
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "de", "fr", "es", "zh"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
# color words included so LIKE '%red%'-style TPC-H predicates (q222)
# select a non-empty part subset, as they do on the real fixtures
P_ADJ = ["red", "green", "blue", "cold", "small", "large", "hot", "plain"]
P_NOUN = ["widget", "bolt", "gear", "cog", "plate", "pin"]
P_TYPES = ["ECONOMY", "PROMO", "STANDARD", "DELUXE"]


def write(outdir, name, cols, schema):
    table = pa.table(cols, schema=schema)
    pq.write_table(table, os.path.join(outdir, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def main(outdir, scale=1):
    rng = random.Random(42)
    os.makedirs(outdir, exist_ok=True)
    n_cust, n_supp, n_part = 150 * scale, 10 * scale, 200 * scale
    n_ord, n_li = 1500 * scale, 6000 * scale
    n_ev = 1000 * scale
    # documents/embeddings follow the REAL fixture family's SUB-linear
    # growth (TESTDATA.md: docs 500 -> 5000 and embeddings 500 -> 2000
    # across sf0.001 -> sf0.1, i.e. ~scale^0.5 and ~scale^0.3): the
    # text/vector corpus is a curated slice beside the warehouse, not a
    # fact table, and scaling it linearly makes every exact-tier
    # pairwise query quadratically heavier than any real instance of
    # the family — the round-12 sf1.0 gate stall. scale=1 unchanged.
    n_doc = int(500 * scale ** 0.5)
    n_emb = int(500 * scale ** 0.3)

    write(outdir, "region",
          {"r_regionkey": list(range(5)), "r_name": REGIONS},
          pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]))

    write(outdir, "nation",
          {"n_nationkey": list(range(25)),
           "n_name": [f"NATION_{i}" for i in range(25)],
           "n_regionkey": [i % 5 for i in range(25)]},
          pa.schema([("n_nationkey", pa.int32()), ("n_name", pa.string()),
                     ("n_regionkey", pa.int32())]))

    write(outdir, "customer",
          {"c_custkey": list(range(n_cust)),
           "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
           "c_nationkey": [rng.randrange(25) for _ in range(n_cust)],
           "c_acctbal": [round(rng.uniform(-999.99, 9999.99), 2)
                         for _ in range(n_cust)],
           "c_mktsegment": [rng.choice(SEGMENTS) for _ in range(n_cust)]},
          pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                     ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                     ("c_mktsegment", pa.string())]))

    write(outdir, "supplier",
          {"s_suppkey": list(range(n_supp)),
           "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
           "s_nationkey": [rng.randrange(25) for _ in range(n_supp)],
           "s_acctbal": [round(rng.uniform(-999.99, 9999.99), 2)
                         for _ in range(n_supp)]},
          pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                     ("s_nationkey", pa.int32()),
                     ("s_acctbal", pa.float64())]))

    write(outdir, "part",
          {"p_partkey": list(range(n_part)),
           "p_name": [f"{rng.choice(P_ADJ)} {rng.choice(P_NOUN)}"
                      for _ in range(n_part)],
           "p_brand": [f"Brand#{rng.randrange(25)}" for _ in range(n_part)],
           "p_type": [rng.choice(P_TYPES) for _ in range(n_part)],
           "p_size": [rng.randrange(1, 51) for _ in range(n_part)],
           "p_retailprice": [round(rng.uniform(100.0, 2000.0), 2)
                             for _ in range(n_part)]},
          pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                     ("p_brand", pa.string()), ("p_type", pa.string()),
                     ("p_size", pa.int32()),
                     ("p_retailprice", pa.float64())]))

    epoch_o = datetime(1995, 1, 1)
    o_dates = [epoch_o + timedelta(days=rng.randrange(0, 2400))
               for _ in range(n_ord)]
    write(outdir, "orders",
          {"o_orderkey": list(range(n_ord)),
           "o_custkey": [rng.randrange(n_cust) for _ in range(n_ord)],
           "o_orderstatus": [rng.choice(["O", "F", "P"]) for _ in range(n_ord)],
           "o_totalprice": [round(rng.uniform(1000.0, 400000.0), 2)
                            for _ in range(n_ord)],
           "o_orderdate": o_dates,
           "o_orderpriority": [rng.choice(PRIORITIES) for _ in range(n_ord)]},
          pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                     ("o_orderstatus", pa.string()),
                     ("o_totalprice", pa.float64()),
                     ("o_orderdate", pa.timestamp("us")),
                     ("o_orderpriority", pa.string())]))

    li = {"l_orderkey": [], "l_partkey": [], "l_suppkey": [],
          "l_linenumber": [], "l_quantity": [], "l_extendedprice": [],
          "l_discount": [], "l_tax": [], "l_returnflag": [],
          "l_linestatus": [], "l_shipdate": []}
    # VARIABLE basket sizes (1..7 lines, mean 4 ≈ n_li/n_ord, plus a
    # ~0.5% 8-12-line tail matching the real fixtures' max-12 baskets):
    # a fixed 4-line basket caps per-order total quantity at 200 and
    # makes "sum(quantity) > 300"-style predicates (q226) structurally
    # unreachable — the real fixtures keep that tail populated
    for ok in range(n_ord):
        bulk = rng.random() < 0.005
        lines = rng.randrange(8, 13) if bulk else rng.randrange(1, 8)
        for ln in range(lines):
            li["l_orderkey"].append(ok)
            li["l_partkey"].append(rng.randrange(n_part))
            li["l_suppkey"].append(rng.randrange(n_supp))
            li["l_linenumber"].append(ln + 1)
            li["l_quantity"].append(
                float(rng.randrange(30, 51) if bulk else rng.randrange(1, 51)))
            li["l_extendedprice"].append(round(rng.uniform(900.0, 100000.0), 2))
            li["l_discount"].append(round(rng.randrange(0, 11) / 100.0, 2))
            li["l_tax"].append(round(rng.randrange(0, 9) / 100.0, 2))
            li["l_returnflag"].append(rng.choice(["R", "A", "N"]))
            li["l_linestatus"].append(rng.choice(["O", "F"]))
            li["l_shipdate"].append(o_dates[ok] +
                                    timedelta(days=rng.randrange(1, 96)))
    write(outdir, "lineitem", li,
          pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                     ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                     ("l_quantity", pa.float64()),
                     ("l_extendedprice", pa.float64()),
                     ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                     ("l_returnflag", pa.string()),
                     ("l_linestatus", pa.string()),
                     ("l_shipdate", pa.timestamp("us"))]))

    epoch_e = datetime(2024, 1, 1)
    write(outdir, "events",
          {"event_id": list(range(n_ev)),
           "ts": [epoch_e + timedelta(seconds=rng.randrange(0, 2592000),
                                      microseconds=rng.randrange(0, 1000000))
                  for _ in range(n_ev)],
           "user_id": [rng.randrange(n_cust) for _ in range(n_ev)],
           "event_type": [rng.choice(EVENT_TYPES) for _ in range(n_ev)],
           "value": [round(rng.expovariate(1 / 60.0) + 0.01, 2)
                     for _ in range(n_ev)],
           "props": [json.dumps({"k": rng.randrange(100)})
                     for _ in range(n_ev)]},
          pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                     ("user_id", pa.int64()), ("event_type", pa.string()),
                     ("value", pa.float64()), ("props", pa.string())]))

    # Heaps' law: real vocabularies grow ~sqrt(corpus size). A FIXED
    # 50-word vocab at scale=1000 (500k docs) makes every 3-shingle one
    # of <=125k values, so hot-shingle inverted-index buckets hold tens
    # of thousands of docs and every exact-tier shingle join (q21/q100/
    # q127 family) degenerates to near-N-squared — a distribution no
    # real corpus has, which stalled the round-12 sf1.0 gate for hours.
    # scale=1 (the CI fuzz gate) is unchanged: extra = 0.
    vocab = list(VOCAB)
    vocab += [f"{VOCAB[i % len(VOCAB)]}{i // len(VOCAB)}"
              for i in range(int(len(VOCAB) * ((n_doc / 500) ** 0.5 - 1)))]
    texts = [" ".join(rng.choice(vocab)
                      for _ in range(rng.randrange(10, 100)))
             for _ in range(n_doc)]
    # PLANT near-duplicates (~10%: copy the previous doc with one word
    # swapped) and exact duplicates (~2%): without them every near-dup /
    # LSH-recall / cluster query (q19/q21/q55/q127/q262/q276 family)
    # returns zero rows and the CI gate covers them only vacuously —
    # the real fixtures carry a duplicate tail
    for i in range(1, n_doc):
        r = rng.random()
        if r < 0.02:
            texts[i] = texts[i - 1]
        elif r < 0.10:
            w = texts[i - 1].split(" ")
            w[rng.randrange(len(w))] = rng.choice(vocab)
            texts[i] = " ".join(w)
    write(outdir, "documents",
          {"doc_id": list(range(n_doc)), "text": texts,
           "lang": [rng.choice(LANGS) for _ in range(n_doc)],
           "source": [f"src{rng.randrange(20)}" for _ in range(n_doc)],
           "n_chars": [len(t) for t in texts]},
          pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                     ("lang", pa.string()), ("source", pa.string()),
                     ("n_chars", pa.int64())]))

    # grid-quantized components (k/1000): the engine-side round(x·1000)
    # quantizers then sit ≥ ~0.4997 from every rounding boundary after
    # float32 storage, so a float-vs-double promotion path can never
    # flip a cell cross-engine; near/exact duplicate vectors planted
    # (~10%) so ANN/near-dup queries have non-vacuous answers
    embs = [[rng.randrange(-900, 901) / 1000.0 for _ in range(64)]
            for _ in range(n_emb)]
    for i in range(1, n_emb):
        r = rng.random()
        if r < 0.02:
            embs[i] = list(embs[i - 1])
        elif r < 0.10:
            embs[i] = list(embs[i - 1])
            for _ in range(3):
                embs[i][rng.randrange(64)] = rng.randrange(-900, 901) / 1000.0
    write(outdir, "embeddings",
          {"vec_id": list(range(n_emb)),
           "embedding": embs,
           "label": [rng.randrange(10) for _ in range(n_emb)]},
          pa.schema([("vec_id", pa.int64()),
                     ("embedding", pa.list_(pa.float32())),
                     ("label", pa.int32())]))


if __name__ == "__main__":
    if len(sys.argv) < 2:
        sys.exit("usage: gen_testdata.py OUTDIR [SCALE]")
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 1)
    print("done:", sys.argv[1])
