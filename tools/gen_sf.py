"""Deterministic scale-up of the driver test data for amortization
benchmarks beyond the provided sf0.1.

Usage: python tools/gen_sf.py [factor] [out_dir]
       (defaults: 10, /root/repo/.data/sf1)

The provided datasets stop at sf0.1 (~600k lineitem). The per-query
bench comparison at sf0.1 shows 48 sub-second queries dominated by
Spark's fixed ~0.3-0.5 s job-scheduling constant; the claim that this
constant AMORTIZES with data volume needs a bigger input to prove. This
script replicates /root/testdata/sf0.1 ``factor``x with deterministic
key shifts (replica 0 is byte-identical to the source, so every literal
id referenced by the contract queries still exists):

- region / nation: fixed dimensions, copied as-is.
- fact/dim keys: replica ``i`` shifts each surrogate key by
  ``i * STRIDE_table`` with consistent foreign-key shifts (orders.
  o_custkey shifts with customer, lineitem's orderkey/partkey/suppkey
  shift with their parents) — referential integrity holds in every
  replica, join fan-outs scale linearly, key cardinality scales with
  data (no artificial skew from colliding keys).
- timestamps / dates / categorical values: unchanged, so range-filter
  selectivity FRACTIONS and group counts per key stay what the sf0.1
  plans were tuned for.
- documents.text: replica suffix token appended (i>0), so replicas are
  near- (not exact-) duplicates — dedup operators see realistic 10x
  cluster growth instead of degenerate identical strings.
- embeddings: per-element deterministic jitter (~1e-3, hash-derived)
  for i>0 — replicas are tight clusters, not coincident points.

Everything is DuckDB SQL → one parquet per table (zstd), deterministic
across runs. NOT graded data — a local perf instrument only.
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# strides: next power-of-10 above the sf0.1 max key, so shifted ids are
# disjoint across replicas and replica membership is readable from the id
STRIDES = {
    "customer": ("c_custkey", 100_000),
    "supplier": ("s_suppkey", 10_000),
    "part": ("p_partkey", 100_000),
    "orders": ("o_orderkey", 1_000_000),
    "events": ("event_id", 1_000_000),
    "documents": ("doc_id", 100_000),
    "embeddings": ("vec_id", 100_000),
}
USER_STRIDE = 10_000  # events.user_id (max 1499 at sf0.1)


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.data/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW reps AS SELECT unnest(range({factor})) AS i")

    def emit(name: str, select: str) -> None:
        path = f"{out}/{name}.parquet"
        con.execute(
            f"COPY ({select}) TO '{path}' (FORMAT PARQUET, COMPRESSION ZSTD)"
        )
        n = con.execute(f"SELECT count(*) FROM '{path}'").fetchone()[0]
        print(f"{name:12s} {n:>10,d} rows -> {path}")

    for t in ("region", "nation"):
        emit(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

    emit("customer", f"""
        SELECT c_custkey + i*{STRIDES['customer'][1]} AS c_custkey,
               CASE WHEN i = 0 THEN c_name ELSE c_name || '-r' || i END AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet' CROSS JOIN reps""")

    emit("supplier", f"""
        SELECT s_suppkey + i*{STRIDES['supplier'][1]} AS s_suppkey,
               CASE WHEN i = 0 THEN s_name ELSE s_name || '-r' || i END AS s_name,
               s_nationkey, s_acctbal
        FROM '{SRC}/supplier.parquet' CROSS JOIN reps""")

    emit("part", f"""
        SELECT p_partkey + i*{STRIDES['part'][1]} AS p_partkey,
               CASE WHEN i = 0 THEN p_name ELSE p_name || '-r' || i END AS p_name,
               p_brand, p_type, p_size, p_retailprice
        FROM '{SRC}/part.parquet' CROSS JOIN reps""")

    emit("orders", f"""
        SELECT o_orderkey + i*{STRIDES['orders'][1]} AS o_orderkey,
               o_custkey + i*{STRIDES['customer'][1]} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet' CROSS JOIN reps""")

    emit("lineitem", f"""
        SELECT l_orderkey + i*{STRIDES['orders'][1]} AS l_orderkey,
               l_partkey + i*{STRIDES['part'][1]} AS l_partkey,
               l_suppkey + i*{STRIDES['supplier'][1]} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet' CROSS JOIN reps""")

    emit("events", f"""
        SELECT event_id + i*{STRIDES['events'][1]} AS event_id, ts,
               user_id + i*{USER_STRIDE} AS user_id,
               event_type, value, props
        FROM '{SRC}/events.parquet' CROSS JOIN reps""")

    emit("documents", f"""
        SELECT doc_id + i*{STRIDES['documents'][1]} AS doc_id,
               CASE WHEN i = 0 THEN text ELSE text || ' rep' || i END AS text,
               lang, source,
               CASE WHEN i = 0 THEN n_chars
                    ELSE n_chars + 5 + CAST(floor(log10(i)) AS BIGINT) END AS n_chars
        FROM '{SRC}/documents.parquet' CROSS JOIN reps""")

    # jitter: per (vec, element, replica) hash folded to [0, 1e-3);
    # i=0 keeps the exact source floats
    emit("embeddings", f"""
        SELECT vec_id + i*{STRIDES['embeddings'][1]} AS vec_id,
               CASE WHEN i = 0 THEN embedding ELSE
                 CAST(list_transform(list_zip(embedding,
                          range(1, 1 + len(embedding))),
                      p -> CAST(p[1] + (hash(vec_id*1000000 + i*10000
                               + CAST(p[2] AS BIGINT)) % 1000) * 1e-6
                           AS FLOAT))
                      AS FLOAT[])
               END AS embedding,
               label
        FROM '{SRC}/embeddings.parquet' CROSS JOIN reps""")


if __name__ == "__main__":
    main()
