#!/usr/bin/env python3
"""Derive an sf1 decade-scale test set from the driver's sf0.1 tables.

Writes 10x replicas of documents / embeddings / events AND the TPC-H
fact/entity tables to data/sf1/ (deterministic, no RNG); region/nation
keep their fixed 5/25-row cardinality (they are bounded dimensions at
any scale, like a country list) and are symlinked.

Replication preserves the sf0.1 distributions instead of distorting them:

- documents: replica k suffixes every whitespace token with '~k' (k>0;
  replica 0 is byte-identical to sf0.1). Tokens never collide across
  replicas, so shingle/minhash/simhash near-dup structure is 10
  independent copies of the sf0.1 corpus -- candidate-pair and cluster
  counts scale exactly 10x. Naive duplication (identical text) would
  instead create 10x-size clone clusters and quadratic pair blowup that
  says nothing about the operators.
- embeddings: replica k multiplies coordinate i by a deterministic
  +-1 sign s(k, i) (md5 parity). A fixed sign pattern per replica is a
  reflection: within-replica geometry (distances, cells, codes) is
  EXACTLY sf0.1's, while cross-replica vectors decorrelate -- so SRP /
  LSH buckets grow linearly, not by 10x replica-twin pileup. (An earlier
  epsilon-shift variant made every replica a near-dup of the original:
  bucket sizes x10, local pair expansion x100, driver OOM -- the same
  clone-cluster trap the token salting avoids for text.)
- events: replica k offsets user_id/event_id; timestamps unchanged, so
  it models 10x concurrent users with identical per-user timelines
  (per-key state stays constant; only key cardinality grows).
- TPC-H (r11): replica k offsets EVERY entity key by k*10^7
  (c_custkey, s_suppkey, p_partkey, o_orderkey — and the foreign keys
  o_custkey / l_orderkey / l_partkey / l_suppkey move IN LOCKSTEP), so
  the result is 10 disjoint copies with referential integrity intact:
  per-order baskets, per-customer order counts, per-part supplier sets
  and every join fan-out stay EXACTLY sf0.1's, while join/aggregate
  input volume grows 10x -- the scaling a decade point is supposed to
  measure. Non-key attributes (dates, prices, flags) are unchanged, so
  value distributions (and thus selectivities) are identical.

Usage: python3 tools/gen_sf1.py [outdir] [replicas]
       (defaults: /root/repo/data/sf1, 10)

The replica count generalizes to further decades — e.g.
`tools/gen_sf1.py /root/repo/data/sf10 100` builds an sf10 point (100
disjoint sf0.1 copies) with the same distribution-preserving tricks:
the key offsets (10^7 entity / 10^8 event) clear 100 replicas with
room (max key ~10^9, far inside BIGINT), the `~k` token salt never
collides across k, and the md5 sign patterns collide between two
replicas with probability 2^-64.
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/data/sf1"
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 10

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

# Salt on \s+ tokens (the engine's tokenizer), NOT single spaces: a doc
# with tabs/newlines/double spaces would otherwise leave some tokens
# unsalted (colliding with replica 0 — the clone-cluster blowup the salt
# exists to avoid) and manufacture phantom '~k' tokens.
_SALTED = """array_to_string(
           list_transform(
             list_filter(string_split_regex(d.text, '\\s+'), x -> x != ''),
             x -> x || '~' || k.k), ' ')"""

con.execute(f"""
COPY (
  SELECT d.doc_id + k.k * 10000000 AS doc_id,
    CASE WHEN k.k = 0 THEN d.text ELSE {_SALTED} END AS text,
    d.lang, d.source,
    CASE WHEN k.k = 0 THEN d.n_chars
         ELSE length({_SALTED})::BIGINT END AS n_chars
  FROM '{SRC}/documents.parquet' d, range(0, {REPLICAS}) k(k)
  ORDER BY doc_id
) TO '{OUT}/documents.parquet' (FORMAT PARQUET)
""")

con.execute(f"""
COPY (
  SELECT e.vec_id + k.k * 10000000 AS vec_id,
    CASE WHEN k.k = 0 THEN e.embedding
    ELSE list_transform(range(1, len(e.embedding) + 1),
      i -> (e.embedding[i] *
            (CASE WHEN ('0x' || substr(md5(k.k::VARCHAR || ':' || i::VARCHAR),
                        1, 2))::INT % 2 = 0
                  THEN 1 ELSE -1 END))::FLOAT)
    END AS embedding,
    e.label
  FROM '{SRC}/embeddings.parquet' e, range(0, {REPLICAS}) k(k)
  ORDER BY vec_id
) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)
""")

con.execute(f"""
COPY (
  SELECT e.event_id + k.k * 100000000 AS event_id, e.ts,
    e.user_id + k.k * 10000000 AS user_id,
    e.event_type, e."value", e.props
  FROM '{SRC}/events.parquet' e, range(0, {REPLICAS}) k(k)
  ORDER BY event_id
) TO '{OUT}/events.parquet' (FORMAT PARQUET)
""")

# TPC-H 10x: key-offset disjoint replicas (see module docstring). The
# K offset (10^7) clears every sf0.1 key range (max key 6*10^5).
K = 10_000_000
TPCH = {
    "customer": f"""SELECT c_custkey + k.k * {K} AS c_custkey, c_name,
        c_nationkey, c_acctbal, c_mktsegment""",
    "supplier": f"""SELECT s_suppkey + k.k * {K} AS s_suppkey, s_name,
        s_nationkey, s_acctbal""",
    "part": f"""SELECT p_partkey + k.k * {K} AS p_partkey, p_name, p_brand,
        p_type, p_size, p_retailprice""",
    "orders": f"""SELECT o_orderkey + k.k * {K} AS o_orderkey,
        o_custkey + k.k * {K} AS o_custkey, o_orderstatus, o_totalprice,
        o_orderdate, o_orderpriority""",
    "lineitem": f"""SELECT l_orderkey + k.k * {K} AS l_orderkey,
        l_partkey + k.k * {K} AS l_partkey,
        l_suppkey + k.k * {K} AS l_suppkey, l_linenumber, l_quantity,
        l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
        l_shipdate""",
}
for t, sel in TPCH.items():
    dst = f"{OUT}/{t}.parquet"
    if os.path.islink(dst):  # pre-r11 layout symlinked the sf0.1 table
        os.unlink(dst)
    order_col = {"customer": "c_custkey", "supplier": "s_suppkey",
                 "part": "p_partkey", "orders": "o_orderkey",
                 "lineitem": "l_orderkey, l_linenumber"}[t]
    con.execute(f"""
    COPY (
      {sel}
      FROM '{SRC}/{t}.parquet', range(0, {REPLICAS}) k(k)
      ORDER BY {order_col}
    ) TO '{dst}' (FORMAT PARQUET)
    """)

for t in ("region", "nation"):
    dst = f"{OUT}/{t}.parquet"
    if not os.path.exists(dst):
        os.symlink(f"{SRC}/{t}.parquet", dst)

for t in ("documents", "embeddings", "events", "customer", "supplier",
          "part", "orders", "lineitem"):
    n = con.execute(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(t, n)
