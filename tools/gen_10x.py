#!/usr/bin/env python3
"""Generate the 10x scale-smoke corpus (driver-side tool, like check.py).

Takes an SF dir and writes a 10x-replicated variant preserving the
statistical shape the scale smoke needs:
  - documents x10: per-replica word salt appended so the duplicate RATE
    stays constant as the corpus grows (a naive copy would make every
    doc a 10-way exact dup and quadratically blow up the dedup ops);
  - embeddings x10: vec_id offset per replica, one embedding component
    perturbed per replica so near-dup structure replicates, not
    degenerates;
  - events x10: disjoint user populations and event_id ranges per
    replica (streaming state stays per-user bounded);
  - orders/lineitem/customer/supplier/part x10: key offsets kept
    consistent across tables so joins still match;
  - region/nation copied as-is (fixed dimensions).

Usage: python3 tools/gen_10x.py [src_sf_dir] [out_dir]
"""
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfsmoke10"
K = 10

con = duckdb.connect()
con.execute(f"CREATE VIEW r AS SELECT range AS i FROM range({K})")


def gen(table, sql):
    con.execute(
        f"COPY ({sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


import os
os.makedirs(OUT, exist_ok=True)

for t in ("region", "nation"):
    gen(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

# key bases: offset every key space by i * base (base > max key)
con.execute(f"CREATE VIEW o0 AS SELECT * FROM '{SRC}/orders.parquet'")
con.execute(f"CREATE VIEW l0 AS SELECT * FROM '{SRC}/lineitem.parquet'")
con.execute(f"CREATE VIEW c0 AS SELECT * FROM '{SRC}/customer.parquet'")
con.execute(f"CREATE VIEW s0 AS SELECT * FROM '{SRC}/supplier.parquet'")
con.execute(f"CREATE VIEW p0 AS SELECT * FROM '{SRC}/part.parquet'")
ob, cb, sb, pb = [
    con.execute(f"SELECT max({k}) + 1 FROM {v}").fetchone()[0]
    for k, v in (("o_orderkey", "o0"), ("c_custkey", "c0"),
                 ("s_suppkey", "s0"), ("p_partkey", "p0"))]

gen("customer", f"""
  SELECT c_custkey + i*{cb} AS c_custkey, c_name, c_nationkey,
         c_acctbal, c_mktsegment
  FROM c0, r""")
gen("supplier", f"""
  SELECT s_suppkey + i*{sb} AS s_suppkey, s_name, s_nationkey, s_acctbal
  FROM s0, r""")
gen("part", f"""
  SELECT p_partkey + i*{pb} AS p_partkey, p_name, p_brand, p_type,
         p_size, p_retailprice
  FROM p0, r""")
gen("orders", f"""
  SELECT o_orderkey + i*{ob} AS o_orderkey, o_custkey + i*{cb} AS o_custkey,
         o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM o0, r""")
gen("lineitem", f"""
  SELECT l_orderkey + i*{ob} AS l_orderkey, l_partkey + i*{pb} AS l_partkey,
         l_suppkey + i*{sb} AS l_suppkey, l_linenumber, l_quantity,
         l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
         l_shipdate
  FROM l0, r""")

# events go through pyarrow: DuckDB downcasts the TIMESTAMP(NANOS)
# column to microseconds on read, but graft.Tables.load expects the
# driver's nanos encoding — replicate without touching ts.
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

e0 = pq.read_table(f"{SRC}/events.parquet")
eb = pc.max(e0.column("event_id")).as_py() + 1
ub = pc.max(e0.column("user_id")).as_py() + 1
reps = []
for i in range(K):
    t = e0
    t = t.set_column(t.schema.get_field_index("event_id"), "event_id",
                     pc.add(t.column("event_id"), i * eb))
    t = t.set_column(t.schema.get_field_index("user_id"), "user_id",
                     pc.add(t.column("user_id"), i * ub))
    reps.append(t)
pq.write_table(pa.concat_tables(reps), f"{OUT}/events.parquet")
print(f"events: {sum(t.num_rows for t in reps)} rows")

con.execute(f"CREATE VIEW d0 AS SELECT * FROM '{SRC}/documents.parquet'")
db = con.execute("SELECT max(doc_id) + 1 FROM d0").fetchone()[0]
# PER-WORD salt: replica i rewrites every token w -> w.si, so replicas
# share zero shingles (the dup RATE stays constant; an end-of-doc salt
# leaves replicas sharing ~all shingles and the exact-Jaccard pair join
# blows up ~100x — measured 124x before this fix). Intra-replica dup
# structure is preserved exactly (same transform on both sides).
gen("documents", f"""
  SELECT doc_id + i*{db} AS doc_id,
         CASE WHEN i = 0 THEN text
              ELSE array_to_string(list_transform(string_split(text, ' '),
                w -> CASE WHEN w = '' THEN w
                          ELSE w || '.s' || CAST(i AS VARCHAR) END), ' ')
         END AS text,
         lang, source, n_chars
  FROM d0, r""")

con.execute(f"CREATE VIEW v0 AS SELECT * FROM '{SRC}/embeddings.parquet'")
vb = con.execute("SELECT max(vec_id) + 1 FROM v0").fetchone()[0]
# CIRCULAR ROTATION by 6*i positions: rotating both vectors of a pair
# preserves their dot product, so intra-replica near-dup structure is
# EXACT; cross-replica cosines decorrelate to noise (a small additive
# perturbation instead leaves cross-replica cosine ~1 and the near-dup
# pair count grows quadratically).
gen("embeddings", f"""
  SELECT vec_id + i*{vb} AS vec_id, label,
         CASE WHEN i = 0 THEN embedding
              ELSE list_concat(embedding[(6*i + 1):64],
                               embedding[1:(6*i)])
         END AS embedding
  FROM v0, r""")
print("done:", OUT)
