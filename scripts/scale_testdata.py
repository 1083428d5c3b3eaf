#!/usr/bin/env python
"""Scale the driver testdata N× for larger-SF benching (ADVICE r2 #7).

Replicates each sf0.1 table with FK-consistent key shifting (replica r
shifts every key space by r×(max_key+1), so customer⋈orders⋈lineitem
etc. stay referentially intact within a replica), perturbs document
text and embedding vectors per replica (so dedup/LSH workloads keep a
realistic duplicate structure instead of gaining N× exact clones), and
preserves the TIMESTAMP(NANOS) parquet physical type the engine's
``load()`` depends on (``nanosAsLong`` — a micros rewrite would change
every query's time math).

Usage:
    python scripts/scale_testdata.py [factor] [src_dir] [out_dir]
Defaults: factor=10, src=/root/testdata/sf0.1, out=/tmp/testdata/sf1.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def scale(factor: int = 10, src: str = "/root/testdata/sf0.1",
          out: str = "/tmp/testdata/sf1") -> str:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS FROM '{src}/{t}.parquet'")

    def k(table: str, col: str) -> int:
        return con.execute(
            f"SELECT max({col}) + 1 FROM {table}").fetchone()[0]

    kc, ks, kp = k("customer", "c_custkey"), k("supplier", "s_suppkey"), \
        k("part", "p_partkey")
    ko, ke, ku = k("orders", "o_orderkey"), k("events", "event_id"), \
        k("events", "user_id")
    kd, kv = k("documents", "doc_id"), k("embeddings", "vec_id")

    rep = f"(SELECT unnest(range({factor})) AS r)"
    sqls = {
        "region": "SELECT * FROM region",
        "nation": "SELECT * FROM nation",
        "customer": f"""
            SELECT c_custkey + r*{kc} AS c_custkey, c_name, c_nationkey,
                   c_acctbal, c_mktsegment
            FROM customer, {rep}""",
        "supplier": f"""
            SELECT s_suppkey + r*{ks} AS s_suppkey, s_name, s_nationkey,
                   s_acctbal
            FROM supplier, {rep}""",
        "part": f"""
            SELECT p_partkey + r*{kp} AS p_partkey, p_name, p_brand,
                   p_type, p_size, p_retailprice
            FROM part, {rep}""",
        "orders": f"""
            SELECT o_orderkey + r*{ko} AS o_orderkey,
                   o_custkey + r*{kc} AS o_custkey, o_orderstatus,
                   o_totalprice, o_orderdate, o_orderpriority
            FROM orders, {rep}""",
        "lineitem": f"""
            SELECT l_orderkey + r*{ko} AS l_orderkey,
                   l_partkey + r*{kp} AS l_partkey,
                   l_suppkey + r*{ks} AS l_suppkey, l_linenumber,
                   l_quantity, l_extendedprice, l_discount, l_tax,
                   l_returnflag, l_linestatus, l_shipdate
            FROM lineitem, {rep}""",
        "events": f"""
            SELECT event_id + r*{ke} AS event_id, ts,
                   user_id + r*{ku} AS user_id, event_type, value, props
            FROM events, {rep}""",
        # Scale-INVARIANT duplicate structure (r6): the old ``text ||
        # ' r'||r`` kept every base doc's shingles intact across ALL
        # replicas, so every doc became a factor-sized near-dup clique
        # and candidate pairs grew QUADRATICALLY with the factor — a
        # generator artifact no real corpus shows (it made dedup
        # benchmarks measure the artifact, not the engine).  Now only
        # 10% of docs are cross-replica duplicate carriers, and only
        # within a replica PAIR (suffix keyed on r//2 → bounded
        # cluster size 2 regardless of factor); every other doc's
        # tokens are rewritten with a per-replica tag, sharing zero
        # shingles across replicas.  Within-replica duplicate
        # structure (the sf0.1 original) replicates untouched, so
        # duplicate MASS stays a constant fraction of the corpus.
        "documents": f"""
            SELECT doc_id + r*{kd} AS doc_id,
                   CASE WHEN r = 0 THEN text
                        ELSE array_to_string(list_transform(
                               regexp_split_to_array(text, '\\s+'),
                               t -> t || CASE WHEN doc_id % 10 = 0
                                    THEN 'p' || CAST(r // 2 AS VARCHAR)
                                    ELSE 'x' || CAST(r AS VARCHAR) END),
                             ' ')
                   END AS text,
                   lang, source,
                   length(CASE WHEN r = 0 THEN text
                               ELSE array_to_string(list_transform(
                                      regexp_split_to_array(text, '\\s+'),
                                      t -> t || CASE WHEN doc_id % 10 = 0
                                           THEN 'p' || CAST(r // 2 AS VARCHAR)
                                           ELSE 'x' || CAST(r AS VARCHAR)
                                           END),
                                    ' ')
                          END) AS n_chars
            FROM documents, {rep}""",
        "embeddings": f"""
            SELECT vec_id + r*{kv} AS vec_id,
                   CAST(list_transform(embedding,
                        x -> CAST(x + r*0.0001 AS FLOAT)) AS FLOAT[])
                     AS embedding,
                   label
            FROM embeddings, {rep}""",
    }

    for t, sql in sqls.items():
        src_schema = pq.read_schema(f"{src}/{t}.parquet")
        tbl = con.execute(sql).fetch_arrow_table()
        # restore the source's physical types (DuckDB fetches
        # TIMESTAMP as us and BIGINT for shifted keys; the engine
        # expects the original ns timestamps / integer widths)
        cols = []
        for f in src_schema:
            col = tbl.column(f.name).cast(f.type)
            cols.append(col)
        out_tbl = pa.table(cols, schema=pa.schema(list(src_schema)))
        # Bounded row groups (any real distributed writer's behavior):
        # pyarrow's default single giant row group makes every byte-
        # range split but one EMPTY — the scan looks parallel while
        # one task reads everything.
        pq.write_table(out_tbl, f"{out}/{t}.parquet",
                       row_group_size=65536)
        print(f"{t}: {out_tbl.num_rows} rows", file=sys.stderr)
    return out


if __name__ == "__main__":
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/testdata/sf1"
    print(scale(factor, src, out))
