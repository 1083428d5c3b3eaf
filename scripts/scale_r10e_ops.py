#!/usr/bin/env python
"""Corrected scale evidence for IVM and the hot-key-split join.

The first cut (scale_r10d_ops.py tail) measured unrepresentative
shapes: an IVM delta spread over EVERY bucket (k%50 touches all 32 —
the change feed then reads two versions of the whole table), and a
skew join whose right side was broadcast-small (the plain plan was
already immune to skew).  This script measures the shapes the
operators exist for:

* IVM with a BUCKET-LOCALIZED delta (one customer bucket's facts
  arrive) — the daily-delta case; incremental cost should track the
  delta's buckets while the full recompute tracks the table.
* skew_join with auto-broadcast DISABLED (the big-dim regime where
  Spark would plan a sort-merge join and the hot key lands on one
  task).
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

    from sstable_hadoop_spark.operators.ivm import (
        incremental_join_rollup,
        join_rollup,
    )
    from sstable_hadoop_spark.operators.layout import bucket_id
    from sstable_hadoop_spark.operators.skew import skew_join
    from sstable_hadoop_spark.operators.txlog import (
        txlog_create,
        txlog_upsert,
    )
    from sstable_hadoop_spark.plans.session import get_session
    from sstable_hadoop_spark.queries import load

    spark = get_session("scale-r10e")
    spark.sparkContext.setLogLevel("ERROR")

    def emit(sf_dir, op, sec, **kw):
        print(json.dumps({"sf_dir": sf_dir, "op": op,
                          "sec": round(sec, 3), **kw}), flush=True)

    for sf_dir in sf_dirs:
        orders = load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("cust"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
             .alias("total_c"))
        cdim = load(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("cust"),
            F.col("c_mktsegment").alias("seg"))

        # --- IVM, bucket-localized daily delta: the facts of ONE
        # customer bucket (1/32 of key space) arrive late
        in_b5 = bucket_id(32, "cust") == 5
        tdir = tempfile.mkdtemp(prefix="scale_ivm_")
        try:
            fp, dp = os.path.join(tdir, "fact"), os.path.join(tdir, "dim")
            txlog_create(spark, fp,
                         orders.filter(~in_b5 | (F.col("k") % 4 != 0)),
                         ("cust",), 32)
            txlog_create(spark, dp, cdim, ("cust",), 8)
            stored = join_rollup(spark, fp, dp, "cust", ["seg"],
                                 {"rev": "total_c"},
                                 fact_version=1, dim_version=1)
            stored.cache().count()

            def merge_fact(s, d):
                return s.unionByName(d).groupBy("k").agg(
                    F.max("cust").alias("cust"),
                    F.max("total_c").alias("total_c"))

            txlog_upsert(spark, fp,
                         orders.filter(in_b5 & (F.col("k") % 4 == 0)),
                         merge_fact, ("cust",), 32)
            emit(sf_dir, "ivm_incremental_refresh_narrow",
                 timed(lambda: incremental_join_rollup(
                     spark, fp, dp, stored, "cust", ["seg"],
                     {"rev": "total_c"}, fact_from=1,
                     dim_from=1).collect()),
                 delta="1/32 buckets")
            emit(sf_dir, "ivm_full_recompute",
                 timed(lambda: join_rollup(
                     spark, fp, dp, "cust", ["seg"],
                     {"rev": "total_c"}).collect()))
            stored.unpersist()
        finally:
            shutil.rmtree(tdir, ignore_errors=True)

        # --- hot-key-split join in the non-broadcast regime
        ev = load(spark, sf_dir, "events")
        hot = ev.select(F.lit(1).alias("user_id"), F.col("value"))
        skewed = ev.select("user_id", "value").unionByName(hot)
        dim = ev.select("user_id").distinct().withColumn(
            "tag", (F.col("user_id") % 97).cast("string"))
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            emit(sf_dir, "skew_join_split_smj",
                 timed(lambda: noop(skew_join(skewed, dim, "user_id",
                                              hot_keys=[1]))))
            emit(sf_dir, "skew_join_plain_smj",
                 timed(lambda: noop(skewed.join(dim, "user_id"))))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    spark.stop()


if __name__ == "__main__":
    main()
