"""r11 scale evidence for matview_refresh: after a daily append to
the base, the incremental refresh (change-feed fold + rollup-sized
overwrite) vs the full rebuild, sf1/sf10."""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/tmp/testdata/sf1",
                               "/tmp/testdata/sf10"]
    from pyspark.sql import functions as F

    from sstable_hadoop_spark.operators.matview import (
        matview_refresh,
    )
    from sstable_hadoop_spark.operators.txlog import (
        txlog_append,
        txlog_create,
        txlog_rollup,
    )
    from sstable_hadoop_spark.plans.session import get_session
    from sstable_hadoop_spark.queries import load

    spark = get_session("scale-r11h-matview")
    spark.sparkContext.setLogLevel("ERROR")

    def emit(sf_dir, op, sec, **kw):
        print(json.dumps({"sf_dir": sf_dir, "op": op,
                          "sec": round(sec, 3), **kw}), flush=True)

    for sf_dir in sf_dirs:
        orders = load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"),
            (F.col("o_custkey") % 1000).alias("g"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
             .alias("x"))
        n = orders.count()
        work = tempfile.mkdtemp(prefix="r11h_")
        try:
            bp = os.path.join(work, "base")
            vp = os.path.join(work, "view")
            txlog_create(spark, bp, orders, ("k",), 64)
            t0 = time.monotonic()
            matview_refresh(spark, vp, bp, ["g"], ["x"])
            emit(sf_dir, "matview_full_build",
                 time.monotonic() - t0, base_rows=n)
            # a ~1% daily append
            day = orders.filter(F.col("k") % 97 == 0) \
                        .withColumn("k", F.col("k") + 10_000_000_000)
            txlog_append(spark, bp, day, one_file_per_bucket=True)
            t0 = time.monotonic()
            matview_refresh(spark, vp, bp, ["g"], ["x"])
            emit(sf_dir, "matview_incremental_refresh",
                 time.monotonic() - t0)
            t0 = time.monotonic()
            txlog_rollup(spark, bp, ["g"], ["x"]).collect()
            emit(sf_dir, "rollup_full_recompute",
                 time.monotonic() - t0)
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
