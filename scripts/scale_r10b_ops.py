#!/usr/bin/env python
"""Scale-step evidence for the second wave of r10 operators
(txlog MERGE, SCD2, PageRank, stream-stream interval join's batch
twin).  Same harness shape as scale_r10_ops.py: one JSON line per
(sf, op), min-of-2 timings, noop sink.

Build the inputs first:
    python scripts/scale_testdata.py 10  /root/testdata/sf0.1 /tmp/testdata/sf1
    python scripts/scale_testdata.py 100 /root/testdata/sf0.1 /tmp/testdata/sf10
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timed(fn, n: int = 2) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/tmp/testdata/sf1", "/tmp/testdata/sf10"]

    from pyspark.sql import functions as F

    from sstable_hadoop_spark.operators.graph import pagerank
    from sstable_hadoop_spark.operators.scd import scd2_apply, scd2_init
    from sstable_hadoop_spark.operators.txlog import (
        txlog_create,
        txlog_merge,
    )
    from sstable_hadoop_spark.plans.session import get_session
    from sstable_hadoop_spark.queries import load, ts_us
    from sstable_hadoop_spark.streaming.joins import interval_join

    spark = get_session("scale-r10b")
    spark.sparkContext.setLogLevel("ERROR")

    def emit(sf_dir, op, sec, **kw):
        print(json.dumps({"sf_dir": sf_dir, "op": op,
                          "sec": round(sec, 3), **kw}), flush=True)

    for sf_dir in sf_dirs:
        orders = load(spark, sf_dir, "orders")
        n_ord = orders.count()
        k = F.col("o_orderkey")
        total_c = (F.floor(F.col("o_totalprice") * 100 + 0.5)
                   .cast("long"))

        # --- txlog MERGE: update+insert over a 64-bucket table; the
        # source touches every bucket (worst case — narrow sources
        # scale with their buckets, the txlog_upsert story)
        root = tempfile.mkdtemp(prefix="txmerge_scale_")
        path = os.path.join(root, "t")
        txlog_create(
            spark, path,
            orders.filter(k % 7 < 5).select(
                k.alias("k"), F.col("o_orderstatus").alias("status"),
                total_c.alias("total_c")),
            bucket_by=("k",), n_buckets=64, sort_by=("k",))
        src = orders.filter((k % 7).isin(4, 5)).select(
            k.alias("k"), F.lit("U").alias("status"),
            (total_c + 50000).alias("total_c")).localCheckpoint()
        n_src = src.count()
        sec = timed(lambda: txlog_merge(
            spark, path, src, ["k"], ("k",), 64, sort_by=("k",)))
        emit(sf_dir, "txlog_merge_upsert_allbuckets", sec,
             n_table=n_ord, n_source=n_src)
        shutil.rmtree(root, ignore_errors=True)

        # --- SCD2 apply: full snapshot with ~20% changes/deletes/news
        o = orders.select(k.alias("k"),
                          F.col("o_orderstatus").alias("status"),
                          F.col("o_orderpriority").alias("prio"))
        dim = scd2_init(o.filter(F.col("k") % 7 < 6),
                        as_of_us=1_000_000).localCheckpoint()
        snap = (o.filter(F.col("k") % 11 != 0)
                 .withColumn("status",
                             F.when(F.col("k") % 5 == 0, F.lit("X"))
                              .otherwise(F.col("status")))
                 .localCheckpoint())
        sec = timed(lambda: noop(
            scd2_apply(dim, snap, ["k"], as_of_us=2_000_000)))
        emit(sf_dir, "scd2_apply_full_snapshot", sec, n_dim=n_ord)

        # --- PageRank: 5 iterations over a 3-out-degree doc graph
        docs = load(spark, sf_dir, "documents")
        n_doc = docs.count()
        fanout = spark.createDataFrame([(1,), (2,), (3,)], "j long")
        edges = (docs.select("doc_id").crossJoin(F.broadcast(fanout))
                     .select(F.col("doc_id").alias("src"),
                             ((F.col("doc_id") * 31 + F.col("j")
                               * 7919) % F.lit(n_doc)).alias("dst"))
                     .localCheckpoint())
        sec = timed(lambda: noop(pagerank(edges, n_iter=5)))
        emit(sf_dir, "pagerank_5iter", sec, n_nodes=n_doc,
             n_edges=3 * n_doc)

        # --- interval join (batch twin of the stream-stream join):
        # clicks x prior-24h views per user
        ev = load(spark, sf_dir, "events")
        n_ev = ev.count()
        clicks = (ev.filter(F.col("event_type") == "click")
                    .select("user_id",
                            F.col("event_id").alias("click_id"), "ts"))
        views = (ev.filter(F.col("event_type") == "view")
                   .select("user_id",
                           F.col("event_id").alias("view_id"), "ts"))
        sec = timed(lambda: noop(
            interval_join(clicks, views, ["user_id"],
                          max_delay="24 hours")
            .groupBy("user_id").count()))
        emit(sf_dir, "attribution_interval_join", sec, n_events=n_ev)


if __name__ == "__main__":
    main()
