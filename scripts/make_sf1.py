#!/usr/bin/env python3
"""Synthesize an sf1-scale fixture (10x sf0.1: 6M lineitem rows) for the
scale-differential oracle sweep, from the driver's read-only sf0.1 tables.

Usage: python3 scripts/make_sf1.py [srcDir] [dstDir] [copies]
       (defaults: /root/testdata/sf0.1 -> /tmp/sf1, 10 copies)
       copies=100 with dst /tmp/sf10 synthesizes the sf10 rung
       (60M lineitem). Max 100 copies: the fresh-embedding hash mixes
       the copy index in a d*100 stride, so i must stay < 100.
Then:  sbt -batch "runMain graft.Verify /tmp/sf1 /tmp/verify_sf1"
       python3 scripts/oracle_check.py /tmp/sf1 /tmp/verify_sf1

Design — REPLICATION, not dbgen: DuckDB's bundled TPC-H generator has
different domains from the driver's synthetic generator (real nation
names vs NATION_i, multi-word p_type), which would break every query
that filters on a fixture literal. Ten shifted copies of the driver's
own tables preserve every domain property while scaling the row counts
to true sf1 cardinalities. Key columns shift by copy*1e8 so each copy
is referentially self-consistent and keys never collide; nation/region
stay fixed (constant-size in TPC-H proper too).

EMBEDDINGS are the one exception to verbatim replication: copies 1..9
get FRESH deterministic unit vectors (hash-uniform components,
L2-normalized). Duplicating vectors verbatim gives every embedding 9
exact cross-copy twins at cosine 1.0, which breaks the semantic-dedup
family's planted closed-form oracles (q55/q117/q122/q137/q198 assume
nothing organic reaches the 0.9/0.95 thresholds). Fresh random unit
vectors keep the max organic cosine ~0.8 over 4e8 pairs (the originals
peak at 0.60), so the planted geometry stays the only signal — the
same property the driver's generator guarantees at every sf.

DOCUMENTS replicate verbatim (text included): the dedup oracles over
text are differential (both engines compute pairs from the same
parquet), so cross-copy duplicate text is measured identically on both
sides — and is itself a useful scale shape (10-deep duplicate groups).
"""
import sys
import duckdb

S = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
D = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
NCOPIES = int(sys.argv[3]) if len(sys.argv) > 3 else 10
assert 1 <= NCOPIES <= 100, "copy-index stride in the embedding hash caps copies at 100"
SHIFT = 100_000_000
copies = f"(SELECT unnest(range({NCOPIES})) AS i)"

con = duckdb.connect()
con.sql("SET threads=16")

def gen(table, sql):
    con.sql(f"COPY ({sql}) TO '{D}/{table}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"select count(*) from '{D}/{table}.parquet'").fetchone()[0]
    print(table, n)

import os
os.makedirs(D, exist_ok=True)

for t in ("nation", "region"):
    gen(t, f"SELECT * FROM '{S}/{t}.parquet'")

gen("customer", f"""
  SELECT c_custkey + i*{SHIFT} AS c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
  FROM '{S}/customer.parquet', {copies}""")
gen("supplier", f"""
  SELECT s_suppkey + i*{SHIFT} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM '{S}/supplier.parquet', {copies}""")
gen("part", f"""
  SELECT p_partkey + i*{SHIFT} AS p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
  FROM '{S}/part.parquet', {copies}""")
gen("orders", f"""
  SELECT o_orderkey + i*{SHIFT} AS o_orderkey, o_custkey + i*{SHIFT} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM '{S}/orders.parquet', {copies}""")
gen("lineitem", f"""
  SELECT l_orderkey + i*{SHIFT} AS l_orderkey, l_partkey + i*{SHIFT} AS l_partkey,
         l_suppkey + i*{SHIFT} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
  FROM '{S}/lineitem.parquet', {copies}""")
gen("events", f"""
  SELECT event_id + i*{SHIFT} AS event_id, ts, user_id + i*{SHIFT} AS user_id,
         event_type, value, props
  FROM '{S}/events.parquet', {copies}""")
gen("documents", f"""
  SELECT doc_id + i*{SHIFT} AS doc_id, text, lang, source, n_chars
  FROM '{S}/documents.parquet', {copies}""")
gen("embeddings", f"""
  WITH src AS (SELECT vec_id, embedding, label FROM '{S}/embeddings.parquet'),
       cp AS (SELECT unnest(range(1, {NCOPIES})) AS i),
       fresh AS (
         SELECT s.vec_id + c.i*{SHIFT} AS vec_id,
                list_transform(range(64), d ->
                  (CAST(hash(s.vec_id * 6400 + d * 100 + c.i) % 2000001 AS DOUBLE)
                   / 1000000.0 - 1.0)) AS raw,
                s.label
         FROM src s, cp c),
       freshn AS (
         SELECT vec_id,
                list_transform(raw, x -> CAST(x / sqrt(list_sum(
                  list_transform(raw, y -> y*y))) AS FLOAT)) AS embedding,
                label
         FROM fresh)
  SELECT vec_id, embedding, label FROM src
  UNION ALL
  SELECT vec_id, embedding, label FROM freshn""")

# schema parity gate: the sweep is only meaningful if the synthesized
# tables are byte-type-identical to the driver's
for t in ["lineitem", "orders", "customer", "part", "supplier", "nation",
          "region", "events", "documents", "embeddings"]:
    a = con.sql(f"describe select * from '{S}/{t}.parquet'").fetchall()
    b = con.sql(f"describe select * from '{D}/{t}.parquet'").fetchall()
    assert [(r[0], r[1]) for r in a] == [(r[0], r[1]) for r in b], \
        f"schema drift in {t}"
print("schema parity OK")
