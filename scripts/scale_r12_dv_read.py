"""r12 scale evidence for the EXECUTOR-SIDE deletion-vector read path
(VERDICT r11 weak #1): the driver no longer materializes pending
positions per read — journal entries ship as a DataFrame and executors
decode them — so (a) the light-DV read tax must stay at parity with
the r11 numbers (scale_r11f: 1.3-1.75x over plain), and (b) the
heavy-stacked-DV regime (multiple delete commits, millions of pending
positions — the case that used to pay O(total positions) in driver
list-build per read) must stay a bounded executor job, switching from
broadcast to shuffled anti-join above _DV_BROADCAST_POS.

Run on an idle host: python scripts/scale_r12_dv_read.py
[/tmp/testdata/sf1 /tmp/testdata/sf10]
"""

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
    sf_dirs = sys.argv[1:] or ["/tmp/testdata/sf1",
                               "/tmp/testdata/sf10"]

    from pyspark.sql import functions as F

    from sstable_hadoop_spark.operators import txlog as tx
    from sstable_hadoop_spark.plans.session import get_session
    from sstable_hadoop_spark.queries import load

    spark = get_session("scale-r12-dv-read")
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
        n_rows = orders.count()
        work = tempfile.mkdtemp(prefix="r12dv_")
        try:
            def agg(p):
                return (tx.txlog_read(spark, p)
                        .groupBy((F.col("k") % 97).alias("g"))
                        .agg(F.sum("price_c").alias("s"))
                        .count())

            plain = os.path.join(work, "plain")
            tx.txlog_create(spark, plain, orders, ("k",), 64)
            emit(sf_dir, "read_agg_plain", timed(lambda: agg(plain)),
                 rows=n_rows)

            # light regime: the r11f apples-to-apples point (~1/15k)
            light = os.path.join(work, "light")
            tx.txlog_create(spark, light, orders, ("k",), 64)
            tx.txlog_delete_rows(spark, light, "pmod(k, 14999) = 7")
            s = tx.txlog_snapshot(light)
            nl = sum(e["count"] for e in s["dvs"].values())
            emit(sf_dir, "read_agg_light_dvs",
                 timed(lambda: agg(light)),
                 dv_positions=nl, dv_files=len(s["dvs"]))

            # heavy regime: THREE stacked scattered deletes, no
            # compaction between — the accumulation case the driver-
            # side build made O(total positions) per read
            heavy = os.path.join(work, "heavy")
            tx.txlog_create(spark, heavy, orders, ("k",), 64)
            t_del = timed(
                lambda: (tx.txlog_delete_rows(spark, heavy,
                                              "pmod(k, 16) = 3"),
                         tx.txlog_delete_rows(spark, heavy,
                                              "pmod(k, 16) = 7"),
                         tx.txlog_delete_rows(spark, heavy,
                                              "pmod(k, 16) = 11")),
                n=1)
            s = tx.txlog_snapshot(heavy)
            nh = sum(e["count"] for e in s["dvs"].values())
            plan = (tx.txlog_read(spark, heavy)._jdf.queryExecution()
                    .executedPlan().toString())
            join = ("broadcast" if "BroadcastHashJoin" in plan
                    else "shuffle")
            emit(sf_dir, "stacked_deletes_3x", t_del,
                 dv_positions=nh, dv_files=len(s["dvs"]))
            emit(sf_dir, "read_agg_heavy_dvs",
                 timed(lambda: agg(heavy)),
                 dv_positions=nh, anti_join=join,
                 threshold=tx._DV_BROADCAST_POS)
            # sanity: content equals the anti-filtered truth
            want = orders.filter(
                "pmod(k, 16) not in (3, 7, 11)").count()
            got = tx.txlog_read(spark, heavy).count()
            assert got == want, (got, want)
            # compaction clears the tax
            t_c = timed(lambda: tx.txlog_compact(spark, heavy,
                                                 min_files=1), n=1)
            emit(sf_dir, "compact_materialize", t_c,
                 dv_left=len(tx.txlog_snapshot(heavy)["dvs"]))
            emit(sf_dir, "read_agg_after_compact",
                 timed(lambda: agg(heavy)))
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
