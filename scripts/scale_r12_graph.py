"""r12 scale evidence for the new graph operators: alternating-star
connected components (round count must stay ~log n as the graph
grows) and degree-ordered triangle counting (wedge set bounded by the
orientation, not by the skew).

Graphs: (a) the bucket link graph the deferred driver rows use, grown
with the documents table; (b) a single global path (the CC worst case
for label propagation) of 1M nodes; (c) a skewed star+cliques mix for
triangles.

Run on an idle host: python scripts/scale_r12_graph.py
[/tmp/testdata/sf1 /tmp/testdata/sf10]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/tmp/testdata/sf1",
                               "/tmp/testdata/sf10"]

    from pyspark.sql import functions as F

    from sstable_hadoop_spark.operators.graph import (
        connected_components,
        triangle_count,
    )
    from sstable_hadoop_spark.plans.session import get_session
    from sstable_hadoop_spark.queries import load

    spark = get_session("scale-r12-graph")
    spark.sparkContext.setLogLevel("ERROR")

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    def bucket_edges(d, triangles=False):
        lcg = d.select(
            F.col("doc_id").alias("u"),
            (F.col("doc_id") - F.pmod("doc_id", F.lit(50))
             + F.pmod(F.col("doc_id") * 31 + 7, F.lit(50)))
            .alias("v"))
        if triangles:  # the docs_link_triangles synthesis
            chain = (d.filter(F.pmod("doc_id", F.lit(50)) < 49)
                      .select(F.col("doc_id").alias("u"),
                              (F.col("doc_id") + 1).alias("v")))
            skip = (d.filter((F.pmod("doc_id", F.lit(4)) == 0)
                             & (F.pmod("doc_id", F.lit(50)) < 48))
                     .select(F.col("doc_id").alias("u"),
                             (F.col("doc_id") + 2).alias("v")))
            base = chain.unionByName(skip).unionByName(lcg)
        else:  # the docs_link_components synthesis
            chain = (d.filter((F.pmod("doc_id", F.lit(2)) == 0)
                              & (F.pmod("doc_id", F.lit(50)) < 49))
                      .select(F.col("doc_id").alias("u"),
                              (F.col("doc_id") + 1).alias("v")))
            base = lcg.unionByName(chain)
        ids = d.select(F.col("doc_id").alias("v"))
        return (base.join(ids, "v")
                    .filter(F.col("u") != F.col("v"))
                    .select(F.col("u").alias("src"),
                            F.col("v").alias("dst")))

    for sf_dir in sf_dirs:
        d = load(spark, sf_dir, "documents").select("doc_id")
        n_docs = d.count()
        e = bucket_edges(d)
        t0 = time.monotonic()
        out, iters = connected_components(e, return_iters=True)
        n_comp = out.select("component").distinct().count()
        emit(sf_dir=sf_dir, op="cc_bucket_graph",
             sec=round(time.monotonic() - t0, 2), nodes=n_docs,
             rounds=iters, components=n_comp)
        et = bucket_edges(d, triangles=True)
        t0 = time.monotonic()
        tri_total = (triangle_count(et)
                     .agg(F.sum("n_triangles")).collect()[0][0])
        emit(sf_dir=sf_dir, op="triangles_bucket_graph",
             sec=round(time.monotonic() - t0, 2),
             triangle_memberships=int(tri_total))

    # the label-propagation killer: ONE path of 1M nodes
    chain = spark.range(999_999).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    t0 = time.monotonic()
    out, iters = connected_components(chain, return_iters=True)
    n_comp = out.select("component").distinct().count()
    emit(op="cc_path_1m", sec=round(time.monotonic() - t0, 2),
         rounds=iters, components=n_comp)

    # skew: one 200k-follower hub + 2k disjoint 5-cliques
    hub = spark.range(1, 200_001).select(
        F.lit(0).alias("src"), F.col("id").alias("dst"))
    k = spark.range(2000)
    pairs = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    pe = spark.createDataFrame(pairs, "a long, b long")
    cliq = (k.crossJoin(pe)
             .select((F.col("id") * 5 + F.col("a") + 1_000_000)
                     .alias("src"),
                     (F.col("id") * 5 + F.col("b") + 1_000_000)
                     .alias("dst")))
    t0 = time.monotonic()
    tri = (triangle_count(hub.unionByName(cliq))
           .agg(F.sum("n_triangles")).collect()[0][0])
    emit(op="triangles_star_plus_cliques",
         sec=round(time.monotonic() - t0, 2),
         triangle_memberships=int(tri),
         expected=2000 * 10 * 3)


if __name__ == "__main__":
    main()
