"""r11 scale evidence for the newly driver-certified IVM paths:
LEFT-join maintenance (dangling NULL group + dim presence flips) and
incremental HLL register maintenance vs the full rebuild, sf1/sf10.
Same bucket-localized daily-delta shape as scale_r10e_ops.py."""

import json
import os
import shutil
import sys
import tempfile
import time

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


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/tmp/testdata/sf1", "/tmp/testdata/sf10"]

    from pyspark.sql import functions as F

    from sstable_hadoop_spark.operators.ivm import (
        incremental_distinct_registers,
        incremental_join_rollup,
        join_rollup,
    )
    from sstable_hadoop_spark.operators.layout import bucket_id
    from sstable_hadoop_spark.operators.sketch import hll_build_grouped
    from sstable_hadoop_spark.operators.txlog import (
        txlog_append,
        txlog_create,
        txlog_merge,
        txlog_read,
        txlog_upsert,
    )
    from sstable_hadoop_spark.plans.session import get_session
    from sstable_hadoop_spark.queries import load

    spark = get_session("scale-r11-ivm")
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

        # --- LEFT IVM: dim covers cust%3!=0 (dangling facts exist);
        # daily wave = one customer bucket's facts + a small dim
        # enter/delete wave (presence flips both directions)
        in_b5 = bucket_id(32, "cust") == 5
        tdir = tempfile.mkdtemp(prefix="scale_ivml_")
        try:
            fp, dp = os.path.join(tdir, "fact"), os.path.join(tdir, "dim")
            txlog_create(spark, fp,
                         orders.filter(~in_b5 | (F.col("k") % 4 != 0)),
                         ("cust",), 32)
            txlog_create(spark, dp,
                         cdim.filter(F.col("cust") % 3 != 0),
                         ("cust",), 8)
            stored = join_rollup(spark, fp, dp, "cust", ["seg"],
                                 {"rev": "total_c"}, fact_version=1,
                                 dim_version=1, how="left")
            stored.cache().count()

            # the insert wave is a pure APPEND (new orders never
            # collide with stored keys) — the r11 ingest primitive:
            # no bucket rewrite, and the diff feed reads ONLY these
            # files
            txlog_append(spark, fp,
                         orders.filter(in_b5 & (F.col("k") % 4 == 0)))
            # dim churn LOCALIZED to the same fact bucket (the shape
            # term 2's pruning exists for: the changed keys' facts
            # live in one bucket, so the fact scan reads 1/32)
            entering = (cdim.filter((F.col("cust") % 3 == 0) & in_b5)
                            .withColumn("seg", F.lit("NEW")))
            txlog_merge(spark, dp, entering, ["cust"], ("cust",), 8)
            leaving = cdim.filter((F.col("cust") % 3 != 0) & in_b5
                                  & (F.col("cust") % 7 == 0)) \
                          .select("cust")
            txlog_merge(spark, dp, leaving, ["cust"], ("cust",), 8,
                        when_matched="delete",
                        when_not_matched="ignore")
            emit(sf_dir, "ivm_left_incremental_refresh",
                 timed(lambda: incremental_join_rollup(
                     spark, fp, dp, stored, "cust", ["seg"],
                     {"rev": "total_c"}, fact_from=1, dim_from=1,
                     how="left").collect()),
                 delta="1/32 fact buckets + dim enter/delete waves")
            emit(sf_dir, "ivm_left_full_recompute",
                 timed(lambda: join_rollup(
                     spark, fp, dp, "cust", ["seg"],
                     {"rev": "total_c"}, how="left").collect()))
            stored.unpersist()
        finally:
            shutil.rmtree(tdir, ignore_errors=True)

        # --- incremental HLL registers: one day's events append
        ev = load(spark, sf_dir, "events") \
            .filter(F.col("event_id").isNotNull()) \
            .select("event_id", "event_type")
        tdir = tempfile.mkdtemp(prefix="scale_hll_")
        try:
            path = os.path.join(tdir, "t")
            txlog_create(spark, path,
                         ev.filter(F.col("event_id") % 30 != 0),
                         ("event_id",), 32)
            stored = hll_build_grouped(
                txlog_read(spark, path, 1), "event_id",
                ["event_type"], p=8)
            stored.cache().count()

            txlog_append(spark, path,
                         ev.filter(F.col("event_id") % 30 == 0))
            emit(sf_dir, "hll_incremental_registers",
                 timed(lambda: incremental_distinct_registers(
                     spark, path, stored, "event_id",
                     ["event_type"], fact_from=1, p=8).collect()),
                 delta="1/30 of events appended")
            emit(sf_dir, "hll_full_rebuild",
                 timed(lambda: hll_build_grouped(
                     txlog_read(spark, path), "event_id",
                     ["event_type"], p=8).collect()))
            stored.unpersist()
        finally:
            shutil.rmtree(tdir, ignore_errors=True)


if __name__ == "__main__":
    main()
