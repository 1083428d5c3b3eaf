"""r11 pre-bucketed PageRank evidence (VERDICT r10 #6): the same
3-out-degree doc graph as scale_r10b_ops.py, run (a) through the
in-memory pagerank (per-iteration edge shuffle — r10b measured
sf1 6.5 s -> sf10 ~36 s, a 5.6x curve) and (b) through
stage_pagerank_edges + pagerank_bucketed (edge shuffle paid once at
layout time; iterations shuffle only node-sized ranks).  Also emits
the one-time staging cost and asserts rank equality on a sample."""

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timed(fn, n=2) -> float:
    best = None
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    return best


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/tmp/testdata/sf1", "/tmp/testdata/sf10"]

    from pyspark.sql import functions as F

    from sstable_hadoop_spark.operators.graph import (
        pagerank,
        pagerank_bucketed,
        stage_pagerank_edges,
    )
    from sstable_hadoop_spark.plans.session import get_session
    from sstable_hadoop_spark.queries import load

    spark = get_session("scale-r11-pagerank")
    spark.sparkContext.setLogLevel("ERROR")

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    for sf_dir in sf_dirs:
        docs = load(spark, sf_dir, "documents")
        n_doc = docs.count()
        fanout = spark.createDataFrame([(1,), (2,), (3,)], "j long")
        edges = (docs.select("doc_id").crossJoin(F.broadcast(fanout))
                     .select(F.col("doc_id").alias("src"),
                             ((F.col("doc_id") * 31 + F.col("j")
                               * 7919) % F.lit(n_doc)).alias("dst"))
                     .localCheckpoint())
        emit(sf_dir=sf_dir, op="pagerank_5iter_inmemory",
             sec=round(timed(lambda: noop(pagerank(edges, n_iter=5))),
                       3),
             n_nodes=n_doc, n_edges=3 * n_doc)
        tdir = tempfile.mkdtemp(prefix="scale_pr_")
        tbl = f"pr_fan_{uuid.uuid4().hex[:8]}"
        try:
            t0 = time.monotonic()
            fan = stage_pagerank_edges(
                spark, edges, os.path.join(tdir, "fan"), tbl,
                n_buckets=32)
            emit(sf_dir=sf_dir, op="pagerank_stage_edges",
                 sec=round(time.monotonic() - t0, 3))
            emit(sf_dir=sf_dir, op="pagerank_5iter_bucketed",
                 sec=round(timed(lambda: noop(
                     pagerank_bucketed(fan, n_iter=5))), 3))
            # spot equality (full compare is pytest's job)
            a = dict(pagerank(edges, n_iter=3)
                     .filter(F.col("id") % 997 == 0).collect())
            b = dict(pagerank_bucketed(fan, n_iter=3)
                     .filter(F.col("id") % 997 == 0).collect())
            emit(sf_dir=sf_dir, op="pagerank_rank_equality",
                 sec=0.0, sampled=len(a), equal=(a == b))
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {tbl}")
            shutil.rmtree(tdir, ignore_errors=True)


if __name__ == "__main__":
    main()
