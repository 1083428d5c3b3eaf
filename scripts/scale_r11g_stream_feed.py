"""r11 scale evidence for the txlog streaming SOURCE: drain a logged
table through spark.readStream.format("txlog") into a noop sink and
compare against the JVM batch parquet scan of the same files — the
price of the Python-source arrow path, and the rows/s the feed
sustains."""

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

    from sstable_hadoop_spark.operators.txlog import txlog_create
    from sstable_hadoop_spark.plans.session import get_session
    from sstable_hadoop_spark.queries import load

    spark = get_session("scale-r11g-stream-feed")
    spark.sparkContext.setLogLevel("ERROR")

    def emit(sf_dir, op, sec, **kw):
        print(json.dumps({"sf_dir": sf_dir, "op": op,
                          "sec": round(sec, 3), **kw}), flush=True)

    for sf_dir in sf_dirs:
        orders = load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("cust"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
             .alias("price_c"))
        n = orders.count()
        work = tempfile.mkdtemp(prefix="r11g_")
        try:
            t = os.path.join(work, "t")
            txlog_create(spark, t, orders, ("k",), 32)
            ck = os.path.join(work, "ck")
            t0 = time.monotonic()
            q = (spark.readStream.format("txlog").load(t)
                 .writeStream.format("noop")
                 .option("checkpointLocation", ck)
                 .trigger(availableNow=True).start())
            q.awaitTermination(1200)
            dt = time.monotonic() - t0
            emit(sf_dir, "stream_drain_noop", dt, rows=n,
                 rows_per_sec=int(n / dt))
            t0 = time.monotonic()
            spark.read.parquet(
                *[os.path.join(t, f) for f in os.listdir(t)
                  if f.endswith(".parquet")]) \
                .write.format("noop").mode("overwrite").save()
            dt = time.monotonic() - t0
            emit(sf_dir, "jvm_batch_scan_noop", dt, rows=n,
                 rows_per_sec=int(n / dt))
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
