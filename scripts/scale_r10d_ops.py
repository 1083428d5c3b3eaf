#!/usr/bin/env python
"""Scale-step evidence for the fifth wave of r10 operators
(anti-entropy replica repair, exact EWMA, integer OLS, Bloom point
lookups).  Same harness shape as scale_r10_ops.py.

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

    from sstable_hadoop_spark.operators.repair import (
        merkle_report,
        repair_stream,
    )
    from sstable_hadoop_spark.operators.stats import ols_fit
    from sstable_hadoop_spark.operators.timeseries import ewma_smooth
    from sstable_hadoop_spark.operators.txlog import (
        txlog_create,
        txlog_read,
        txlog_read_point,
    )
    from sstable_hadoop_spark.plans.session import get_session
    from sstable_hadoop_spark.queries import derived_cells, load, ts_us

    spark = get_session("scale-r10d")
    spark.sparkContext.setLogLevel("ERROR")

    def emit(sf_dir, op, sec, **kw):
        print(json.dumps({"sf_dir": sf_dir, "op": op,
                          "sec": round(sec, 3), **kw}), flush=True)

    for sf_dir in sf_dirs:
        cells = derived_cells(spark, sf_dir)

        # --- anti-entropy repair: LOW drift (~0.2%) — the shape the
        # operator exists for (digest tables tiny; stream prunes)
        a = cells.filter(F.col("timestamp") % 499 != 3)
        b = cells.filter(F.col("timestamp") % 503 != 5)
        emit(sf_dir, "merkle_report",
             timed(lambda: merkle_report(a, b, 64).collect()))
        emit(sf_dir, "repair_stream_low_drift",
             timed(lambda: noop(repair_stream(a, b, 64))),
             drift="~0.4%")
        # HIGH drift (~23%) — the worst case: most ranges out of sync,
        # the anti joins touch nearly the whole corpus
        a2 = cells.filter(F.col("timestamp") % 7 != 3)
        b2 = cells.filter(F.col("timestamp") % 11 != 5)
        emit(sf_dir, "repair_stream_high_drift",
             timed(lambda: noop(repair_stream(a2, b2, 64))),
             drift="~23%")
        # LOCALIZED drift — divergence confined to 2/64 token ranges
        # (a recovered replica that missed a key-range's writes): the
        # broadcast range gate should keep 62/64 ranges out of the
        # anti joins entirely
        from sstable_hadoop_spark.operators.repair import key_range

        rng = key_range(F.col("key"), 64)
        b3 = cells.filter(~(rng.isin(3, 17)
                            & (F.col("timestamp") % 3 == 0)))
        emit(sf_dir, "repair_stream_localized_drift",
             timed(lambda: noop(repair_stream(cells, b3, 64))),
             drift="2/64 ranges")

        # --- exact EWMA over events (one key shuffle, linear per key)
        ev = load(spark, sf_dir, "events")
        emit(sf_dir, "ewma_smooth",
             timed(lambda: noop(ewma_smooth(
                 ev, ts_us(ev, "ts"), "user_id", "value",
                 shift=3, tie_cols=("event_id",)))))

        # --- integer OLS over lineitem (one agg pass, 5 sums/group)
        li = load(spark, sf_dir, "lineitem")
        emit(sf_dir, "ols_fit",
             timed(lambda: ols_fit(
                 li, "l_returnflag",
                 F.floor(F.col("l_quantity") + 0.5).cast("long"),
                 F.floor(F.col("l_extendedprice") * 100 + 0.5)
                  .cast("long")).collect()))

        # --- Bloom point lookup vs full-scan filter on a logged table
        orders = load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("cust"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
             .alias("total_c"))
        tdir = tempfile.mkdtemp(prefix="scale_bloom_")
        try:
            path = os.path.join(tdir, "t")
            t0 = time.perf_counter()
            txlog_create(spark, path, orders, ("k",), 32,
                         sort_by=("k",), bloom_cols=("cust",))
            emit(sf_dir, "txlog_create_bloom",
                 time.perf_counter() - t0, n_buckets=32)
            from sstable_hadoop_spark.operators.txlog import (
                txlog_snapshot,
            )

            n_total = len(txlog_snapshot(path)["files"])
            probes = [1, 7, 15, 22, 28]
            pt = txlog_read_point(spark, path, "cust", probes)
            n_files = pt.select(F.input_file_name()).distinct().count()
            emit(sf_dir, "txlog_point_lookup",
                 timed(lambda: txlog_read_point(
                     spark, path, "cust", probes).collect()),
                 files_read=n_files, files_total=n_total)
            emit(sf_dir, "txlog_full_filter",
                 timed(lambda: txlog_read(spark, path)
                       .filter(F.col("cust").isin(probes))
                       .collect()),
                 files_read=n_total, files_total=n_total)
        finally:
            shutil.rmtree(tdir, ignore_errors=True)

        # --- IVM: incremental join-view refresh vs full recompute
        from sstable_hadoop_spark.operators.ivm import (
            incremental_join_rollup,
            join_rollup,
        )
        from sstable_hadoop_spark.operators.txlog import txlog_upsert

        cdim = load(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("cust"),
            F.col("c_mktsegment").alias("seg"))
        tdir = tempfile.mkdtemp(prefix="scale_ivm_")
        try:
            fp = os.path.join(tdir, "fact")
            dp = os.path.join(tdir, "dim")
            txlog_create(spark, fp,
                         orders.filter(F.col("k") % 50 != 0),
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
                         orders.filter(F.col("k") % 50 == 0),
                         merge_fact, ("cust",), 32)
            emit(sf_dir, "ivm_incremental_refresh",
                 timed(lambda: incremental_join_rollup(
                     spark, fp, dp, stored, "cust", ["seg"],
                     {"rev": "total_c"}, fact_from=1,
                     dim_from=1).collect()),
                 delta="2% fact insert")
            emit(sf_dir, "ivm_full_recompute",
                 timed(lambda: join_rollup(
                     spark, fp, dp, "cust", ["seg"],
                     {"rev": "total_c"}).collect()))
            stored.unpersist()
        finally:
            shutil.rmtree(tdir, ignore_errors=True)

        # --- hot-key-split join vs plain join on a synthetic power law
        from sstable_hadoop_spark.operators.skew import skew_join

        ev = load(spark, sf_dir, "events")
        hot = ev.select(F.lit(1).alias("user_id"),
                        F.col("value"))  # every event also hits key 1
        skewed = ev.select("user_id", "value").unionByName(hot)
        dim = ev.select("user_id").distinct().withColumn(
            "tag", (F.col("user_id") % 97).cast("string"))
        emit(sf_dir, "skew_join_split",
             timed(lambda: noop(skew_join(skewed, dim, "user_id",
                                          hot_keys=[1]))))
        emit(sf_dir, "skew_join_plain",
             timed(lambda: noop(skewed.join(dim, "user_id"))))

    spark.stop()


if __name__ == "__main__":
    main()
