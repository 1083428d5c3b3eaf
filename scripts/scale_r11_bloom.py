"""r11 bloom write-cost evidence: txlog_create with and without
bloom_cols at sf1/sf10 after the vectorized bitset build (VERDICT r10
#4 — target: bloom write overhead <= 3x the no-bloom create; the r10
per-distinct-value Python loop cost ~8x at sf10).  Point-lookup
pruning re-checked so the cheaper build provably changes no bits."""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/tmp/testdata/sf1", "/tmp/testdata/sf10"]

    from pyspark.sql import functions as F

    from sstable_hadoop_spark.operators.txlog import (
        txlog_create,
        txlog_read_point,
        txlog_snapshot,
    )
    from sstable_hadoop_spark.plans.session import get_session
    from sstable_hadoop_spark.queries import load

    spark = get_session("scale-r11-bloom")
    spark.sparkContext.setLogLevel("ERROR")

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    for sf_dir in sf_dirs:
        orders = load(spark, sf_dir, "orders").select(
            F.col("o_orderkey").alias("k"),
            F.col("o_custkey").alias("cust"),
            F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
             .alias("total_c"))
        for tag, blooms in (("none", ()), ("cust", ("cust",))):
            tdir = tempfile.mkdtemp(prefix="scale_bloom11_")
            try:
                path = os.path.join(tdir, "t")
                t0 = time.perf_counter()
                txlog_create(spark, path, orders, ("k",), 32,
                             sort_by=("k",), bloom_cols=blooms)
                emit(sf_dir=sf_dir, op=f"txlog_create_bloom_{tag}",
                     sec=round(time.perf_counter() - t0, 3))
                if blooms:
                    probes = [1, 7, 15, 22, 28]
                    n_total = len(txlog_snapshot(path)["files"])
                    pt = txlog_read_point(spark, path, "cust", probes)
                    n_files = pt.select(F.input_file_name()) \
                                .distinct().count()
                    t0 = time.perf_counter()
                    n = txlog_read_point(spark, path, "cust",
                                         probes).count()
                    emit(sf_dir=sf_dir, op="txlog_point_lookup",
                         sec=round(time.perf_counter() - t0, 3),
                         rows=n, files_read=n_files,
                         files_total=n_total)
            finally:
                shutil.rmtree(tdir, ignore_errors=True)


if __name__ == "__main__":
    main()
