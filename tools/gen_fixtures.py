#!/usr/bin/env python3
"""Alternate-seed fixture generator (dev tool only — the shipped Scala
library does not depend on this).

Regenerates the driver's synthetic table family (TESTDATA.md /
FIXTURES.md §A schemas) with a DIFFERENT RNG seed, for the
"seed-shifted oracle sweep": running the full Verify + DuckDB replay on
an alternate-seed fixture proves the 296-green matrix is not tuned to
the seed-42 values (hash families, ordered folds, boundary arithmetic).
Schemas, value domains, and structural invariants (FK ranges, sorted
event timestamps, n_chars == length(text), unit-norm embeddings,
2-decimal money) match the driver tables byte-type-for-byte-type; the
VALUES differ everywhere the driver's generator drew randomness.

Usage: python3 tools/gen_fixtures.py <outDir> [--seed 4242] [--scale 1.0]
  --scale multiplies the sf0.001 row counts (1.0 -> lineitem 6000).
"""
import argparse, json, os
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEGMENTS = ["MACHINERY", "HOUSEHOLD", "BUILDING", "FURNITURE", "AUTOMOBILE"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
PTYPES = ["LARGE", "STANDARD", "MEDIUM", "SMALL", "PROMO", "ECONOMY"]
ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
ETYPES = ["signup", "click", "error", "view", "purchase"]
LANGS = ["fr", "es", "de", "zh", "en"]
VOCAB = ("a agg batch big column customer data dup fast filter group hash join "
         "key line merge order part query row scan slow small sort spark stream "
         "table the value vector window").split()


def money(rng, lo, hi, n):
    return np.round(rng.uniform(lo, hi, n), 2)


def days_ts(rng, lo, hi, n):
    """Random midnight timestamps (us) in [lo, hi] date strings."""
    lo_d = np.datetime64(lo, "D").astype("datetime64[D]").astype(int)
    hi_d = np.datetime64(hi, "D").astype("datetime64[D]").astype(int)
    d = rng.integers(lo_d, hi_d + 1, n)
    return d.astype("datetime64[D]").astype("datetime64[us]")


def write(out_dir, name, table):
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--seed", type=int, default=4242)
    ap.add_argument("--scale", type=float, default=1.0)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    s = args.scale
    n_cust, n_supp, n_part = int(150 * s), max(int(10 * s), 5), int(200 * s)
    n_ord, n_li, n_ev = int(1500 * s), int(6000 * s), int(1000 * s)
    n_doc, n_emb = max(int(500 * s), 100), max(int(500 * s), 100)
    n_users = max(n_cust // 10, 5)

    write(args.out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS}))

    write(args.out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32())}))

    write(args.out_dir, "customer", pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": money(rng, -900, 10000, n_cust),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, 5, n_cust)]}))

    write(args.out_dir, "supplier", pa.table({
        "s_suppkey": pa.array(range(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": money(rng, 500, 9000, n_supp)}))

    write(args.out_dir, "part", pa.table({
        "p_partkey": pa.array(range(n_part), pa.int64()),
        "p_name": [f"{ADJS[a]} {NOUNS[b]}" for a, b in
                   zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": [PTYPES[i] for i in rng.integers(0, 6, n_part)],
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        # structural, not random, in the driver data: 900 + key/10
        "p_retailprice": np.round(900.0 + np.arange(n_part) * 0.1, 2)}))

    write(args.out_dir, "orders", pa.table({
        "o_orderkey": pa.array(range(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": [["F", "O", "P"][i] for i in rng.integers(0, 3, n_ord)],
        "o_totalprice": money(rng, 1000, 500000, n_ord),
        "o_orderdate": pa.array(days_ts(rng, "1995-01-01", "2001-08-01", n_ord)),
        "o_orderpriority": [PRIOS[i] for i in rng.integers(0, 5, n_ord)]}))

    write(args.out_dir, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(float),
        "l_extendedprice": money(rng, 900, 105000, n_li),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": [["N", "A", "R"][i] for i in rng.integers(0, 3, n_li)],
        "l_linestatus": [["O", "F"][i] for i in rng.integers(0, 2, n_li)],
        "l_shipdate": pa.array(days_ts(rng, "1995-01-02", "2001-11-04", n_li))}))

    # events: timestamps sorted by event_id across ~30 days, exp-ish value
    start = np.datetime64("2024-01-01T00:00:00", "us").astype(int)
    gaps = rng.exponential(30 * 86400e6 / n_ev, n_ev).astype(int) + 1
    ts = (start + np.cumsum(gaps)).astype("datetime64[us]")
    write(args.out_dir, "events", pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(ts),
        "user_id": pa.array(rng.integers(0, n_users, n_ev), pa.int64()),
        "event_type": [ETYPES[i] for i in rng.integers(0, 5, n_ev)],
        "value": np.round(np.maximum(rng.exponential(50, n_ev), 0.01), 2),
        "props": [json.dumps({"k": int(k)}, separators=(", ", ": "))
                  for k in rng.integers(0, 100, n_ev)]}))

    texts = [" ".join(VOCAB[i] for i in
                      rng.integers(0, len(VOCAB), rng.integers(10, 100)))
             for _ in range(n_doc)]
    write(args.out_dir, "documents", pa.table({
        "doc_id": pa.array(range(n_doc), pa.int64()),
        "text": texts,
        "lang": [LANGS[i] for i in rng.integers(0, 5, n_doc)],
        "source": [f"src{i}" for i in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64())}))

    v = rng.normal(0, 1, (n_emb, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    write(args.out_dir, "embeddings", pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array([row for row in v.tolist()],
                              pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, n_emb), pa.int32())}))

    print(f"wrote alternate-seed fixtures (seed={args.seed}, scale={args.scale}) "
          f"to {args.out_dir}: lineitem={n_li} rows")


if __name__ == "__main__":
    main()
