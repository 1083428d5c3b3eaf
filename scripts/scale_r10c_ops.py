#!/usr/bin/env python
"""Scale-step evidence for the fourth wave of r10 operators
(ivfsq8_append incremental ingest, zero-exchange txlog bucketed
reads, SCD2 temporal join).  Same harness shape as scale_r10_ops.py.

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

    from sstable_hadoop_spark.operators.lww import lww_cell
    from sstable_hadoop_spark.operators.scd import (
        scd2_apply,
        scd2_init,
        scd2_temporal_join,
    )
    from sstable_hadoop_spark.operators.similarity import (
        ivfsq8_append,
        train_sq8,
        write_ivfsq8_index,
    )
    from sstable_hadoop_spark.operators.txlog import (
        txlog_create,
        txlog_read,
        txlog_read_bucketed,
    )
    from sstable_hadoop_spark.plans.session import get_session
    from sstable_hadoop_spark.queries import derived_cells, load

    spark = get_session("scale-r10c")
    spark.sparkContext.setLogLevel("ERROR")

    def emit(sf_dir, op, sec, **kw):
        print(json.dumps({"sf_dir": sf_dir, "op": op,
                          "sec": round(sec, 3), **kw}), flush=True)

    for sf_dir in sf_dirs:
        # --- incremental ANN ingest: 10% append vs full rebuild
        emb = load(spark, sf_dir, "embeddings").select(
            "vec_id", F.transform(
                "embedding",
                lambda x: x.cast("double")).alias("embedding"))
        n_vec = emb.count()
        base = emb.filter(F.col("vec_id") % 10 != 0).localCheckpoint()
        batch = emb.filter(F.col("vec_id") % 10 == 0).localCheckpoint()
        root = tempfile.mkdtemp(prefix="ivfsq8_app_scale_")
        path = os.path.join(root, "idx")
        params = train_sq8(base)
        t0 = time.perf_counter()
        write_ivfsq8_index(base, path, params=params)
        emit(sf_dir, "ivfsq8_full_build", time.perf_counter() - t0,
             n_vec=n_vec)
        t0 = time.perf_counter()
        ivfsq8_append(batch, path)
        emit(sf_dir, "ivfsq8_append_10pct", time.perf_counter() - t0,
             n_batch=n_vec // 10)
        shutil.rmtree(root, ignore_errors=True)

        # --- zero-exchange bucketed txlog read vs plain snapshot read
        cells = derived_cells(spark, sf_dir).localCheckpoint()
        root = tempfile.mkdtemp(prefix="txbkt_scale_")
        path = os.path.join(root, "t")
        txlog_create(spark, path, lww_cell(cells), bucket_by=("key",),
                     n_buckets=32, sort_by=("key", "name"))
        sec = timed(lambda: noop(lww_cell(txlog_read(spark, path))))
        emit(sf_dir, "txlog_plain_read_merge", sec)
        table = f"scale_bkt_{abs(hash(sf_dir)) % 10**6}"
        sec = timed(lambda: noop(lww_cell(
            txlog_read_bucketed(spark, path, table))))
        emit(sf_dir, "txlog_bucketed_read_merge", sec)
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(root, ignore_errors=True)

        # --- SCD2 temporal join: facts pick their own-time version
        orders = load(spark, sf_dir, "orders")
        k = F.col("o_orderkey")
        o = orders.select(k.alias("k"),
                          F.col("o_orderstatus").alias("status"),
                          F.col("o_orderpriority").alias("prio"))
        dim = scd2_apply(
            scd2_init(o.filter(F.col("k") % 7 < 6), as_of_us=1_000_000),
            o.filter(F.col("k") % 11 != 0).withColumn(
                "status", F.when(F.col("k") % 5 == 0, F.lit("X"))
                           .otherwise(F.col("status"))),
            ["k"], as_of_us=2_000_000).localCheckpoint()
        facts = orders.select(
            k.alias("k"),
            F.when(k % 2 == 0, F.lit(1_500_000))
             .otherwise(F.lit(2_500_000)).cast("long").alias("ts_us"),
            F.col("o_custkey").alias("cust")).localCheckpoint()
        sec = timed(lambda: noop(
            scd2_temporal_join(facts, dim, ["k"], "ts_us")))
        emit(sf_dir, "scd2_temporal_join", sec, n_facts=facts.count())


if __name__ == "__main__":
    main()
