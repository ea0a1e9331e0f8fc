#!/usr/bin/env python3
"""Local sf1/sf10 testdata: a key-remapped upsample of the driver's sf0.1.

The driver only ships sf{0.001,0.01,0.1} and gates correctness at
sf0.01; the round-7 sweep showed that exact-sum overflow classes
surface exactly one SF later (2^53 dec2d drift appeared at sf0.1
only), so the local verify loop wants more decades. This script
replicates every sf0.1 table N times with disjoint key ranges:

- all BIGINT entity keys shift by k*10_000_000 per copy k in 0..N-1 —
  one shared offset, so every FK edge (orders->customer,
  lineitem->{orders,part,supplier}, events.user_id->customer) stays
  intact within its copy and the copies never collide. After
  generation every shifted source key column is asserted < OFF so an
  out-of-range key cannot silently collide across copies;
- region/nation are fixed dims and stay as-is;
- document text gets a per-copy ' d<k>' suffix (k>0) so the upsample
  creates NEAR-duplicate families rather than N-way exact-duplicate
  degeneracy (n_chars recomputed to stay == LENGTH(text));
- embeddings/labels/props/timestamps copy verbatim: the time span is
  unchanged (hourly surfaces get Nx the mass — exactly the overflow
  pressure the sweep exists to apply).

Usage: tools/gen_sf1.py [out_dir] [copies] [tables]
  default: target/testdata/sf1, 10 copies (sf1), all tables
  sf10:    tools/gen_sf1.py target/testdata/sf10 100
  sf100 magnitude probe (r9): tools/gen_sf1.py target/testdata/sf100 1000 \
    region,nation,customer,supplier,part,orders,lineitem,events
"""
import os, sys
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "target/testdata/sf1"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 10
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
OFF = 10_000_000

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute(
    f"CREATE VIEW ks AS SELECT unnest(generate_series(0, {COPIES - 1})) AS k")

# Shifted key columns per table; each is asserted < OFF in the SOURCE so
# copy ranges are provably disjoint (ADVICE r8: nothing previously
# checked this — an oversized key would silently corrupt FK edges).
SHIFTED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def src(t):
    return f"'{SRC}/{t}.parquet'"


for t, cols in SHIFTED.items():
    for c in cols:
        mx = con.execute(f"SELECT MAX({c}) FROM {src(t)}").fetchone()[0]
        assert mx is not None and mx < OFF, (
            f"{t}.{c} max={mx} >= OFF={OFF}: copies would collide")


def gen(table, sql):
    if ONLY is not None and table not in ONLY:
        return
    out = f"{OUT}/{table}.parquet"
    con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
    n = con.execute(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
    print(f"{table}: {n} rows", flush=True)


# fixed dims: verbatim
for t in ("region", "nation"):
    gen(t, f"SELECT * FROM {src(t)}")

gen("customer", f"""
  SELECT c_custkey + k*{OFF} AS c_custkey, c_name, c_nationkey, c_acctbal,
         c_mktsegment
  FROM {src('customer')}, ks""")

gen("supplier", f"""
  SELECT s_suppkey + k*{OFF} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM {src('supplier')}, ks""")

gen("part", f"""
  SELECT p_partkey + k*{OFF} AS p_partkey, p_name, p_brand, p_type, p_size,
         p_retailprice
  FROM {src('part')}, ks""")

gen("orders", f"""
  SELECT o_orderkey + k*{OFF} AS o_orderkey, o_custkey + k*{OFF} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM {src('orders')}, ks""")

gen("lineitem", f"""
  SELECT l_orderkey + k*{OFF} AS l_orderkey, l_partkey + k*{OFF} AS l_partkey,
         l_suppkey + k*{OFF} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate
  FROM {src('lineitem')}, ks""")

gen("events", f"""
  SELECT event_id + k*{OFF} AS event_id, ts, user_id + k*{OFF} AS user_id,
         event_type, value, props
  FROM {src('events')}, ks""")

gen("documents", f"""
  SELECT doc_id + k*{OFF} AS doc_id,
         CASE WHEN k = 0 THEN text ELSE text || ' d' || k END AS text,
         lang, source,
         CAST(LENGTH(CASE WHEN k = 0 THEN text ELSE text || ' d' || k END)
           AS BIGINT) AS n_chars
  FROM {src('documents')}, ks""")

gen("embeddings", f"""
  SELECT vec_id + k*{OFF} AS vec_id, embedding, label
  FROM {src('embeddings')}, ks""")

print(f"done -> {OUT}")
