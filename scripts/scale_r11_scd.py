"""r11 co-located SCD2 apply evidence (VERDICT r10 #8): the r10b
scd2_apply measurement re-run with dim AND snapshot wired through
key-bucketed txlog tables and null_safe_keys=False — the full-outer
join co-locates (zero exchanges, pytest plan-asserted) so the apply's
cost is scan+merge, not two table-sized shuffles."""

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

    from sstable_hadoop_spark.operators.scd import scd2_apply, scd2_init
    from sstable_hadoop_spark.operators.txlog import (
        txlog_create,
        txlog_read_bucketed,
    )
    from sstable_hadoop_spark.plans.session import get_session
    from sstable_hadoop_spark.queries import load

    spark = get_session("scale-r11-scd")
    spark.sparkContext.setLogLevel("ERROR")

    def emit(**kw):
        print(json.dumps(kw), flush=True)

    for sf_dir in sf_dirs:
        orders = load(spark, sf_dir, "orders")
        n_ord = orders.count()
        k = F.col("o_orderkey")
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
        emit(sf_dir=sf_dir, op="scd2_apply_unbucketed",
             sec=round(timed(lambda: noop(
                 scd2_apply(dim, snap, ["k"],
                            as_of_us=2_000_000))), 3),
             n_dim=n_ord)
        tdir = tempfile.mkdtemp(prefix="scale_scd_")
        sfx = uuid.uuid4().hex[:8]
        try:
            dp, sp = os.path.join(tdir, "dim"), os.path.join(tdir, "snap")
            txlog_create(spark, dp, dim, ("k",), 32, sort_by=("k",))
            txlog_create(spark, sp, snap, ("k",), 32, sort_by=("k",))
            dim_b = txlog_read_bucketed(spark, dp, f"scd_dim_{sfx}")
            snap_b = txlog_read_bucketed(spark, sp, f"scd_snap_{sfx}")
            emit(sf_dir=sf_dir, op="scd2_apply_bucketed",
                 sec=round(timed(lambda: noop(
                     scd2_apply(dim_b, snap_b, ["k"],
                                as_of_us=2_000_000,
                                null_safe_keys=False))), 3))
        finally:
            spark.sql(f"DROP TABLE IF EXISTS scd_dim_{sfx}")
            spark.sql(f"DROP TABLE IF EXISTS scd_snap_{sfx}")
            shutil.rmtree(tdir, ignore_errors=True)


if __name__ == "__main__":
    main()
