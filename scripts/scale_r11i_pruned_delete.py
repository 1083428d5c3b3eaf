"""r11 scale evidence for index-pruned DV deletes: a keyed
right-to-be-forgotten delete through a bloom prune hint vs the
unpruned probe scan, sf1/sf10 (64-bucket orders, bloom on o_custkey)."""

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

    from sstable_hadoop_spark.operators.txlog import (
        txlog_create,
        txlog_delete_rows,
        txlog_snapshot,
    )
    from sstable_hadoop_spark.plans.session import get_session
    from sstable_hadoop_spark.queries import load

    spark = get_session("scale-r11i-pruned-delete")
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
        work = tempfile.mkdtemp(prefix="r11i_")
        try:
            t = os.path.join(work, "t")
            txlog_create(spark, t, orders, ("k",), 64,
                         bloom_cols=("cust",))
            custs = [r[0] for r in orders.select("cust").distinct()
                     .limit(40).collect()][:20]
            flt = ("cust in (" + ",".join(str(c) for c in custs)
                   + ")")
            t0 = time.monotonic()
            _, n1 = txlog_delete_rows(spark, t, flt)
            emit(sf_dir, "dv_delete_unpruned",
                 time.monotonic() - t0, n_deleted=n1, rows=n)
            custs2 = [r[0] for r in orders.select("cust").distinct()
                      .limit(80).collect()][40:60]
            flt2 = ("cust in (" + ",".join(str(c) for c in custs2)
                    + ")")
            t0 = time.monotonic()
            _, n2 = txlog_delete_rows(spark, t, flt2,
                                      prune=("point", "cust",
                                             custs2))
            dv_files = len(txlog_snapshot(t).get("dvs") or {})
            emit(sf_dir, "dv_delete_bloom_pruned",
                 time.monotonic() - t0, n_deleted=n2,
                 total_files=64, dv_files=dv_files)
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
