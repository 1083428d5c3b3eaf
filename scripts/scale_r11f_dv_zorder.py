"""r11 scale evidence for merge-on-READ deletion vectors and
OPTIMIZE ZORDER over logged tables, sf1/sf10.

DV story: deleting ~1/15000 of the table (the right-to-be-forgotten
shape) via `txlog_delete_rows` must cost one predicate-pushdown scan
plus a KB commit, vs `txlog_delete` (merge-on-write) rewriting every
touched bucket; the read tax of carrying the vectors must be small;
`txlog_compact` clears it.

Z-order story: a narrow range probe on the SECOND clustered column
must read a small fraction of files after `txlog_zorder`, where the
same probe on the unclustered layout reads ~all files (zone maps
journaled either way — the layout, not the index, is what changes)."""

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

    from sstable_hadoop_spark.operators.txlog import (
        txlog_compact,
        txlog_create,
        txlog_delete,
        txlog_delete_rows,
        txlog_read,
        txlog_read_range,
        txlog_snapshot,
        txlog_zorder,
    )
    from sstable_hadoop_spark.plans.session import get_session
    from sstable_hadoop_spark.queries import load

    spark = get_session("scale-r11f-dv-zorder")
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
        work = tempfile.mkdtemp(prefix="r11f_")
        try:
            # ---- deletion vectors vs merge-on-write --------------
            dvt = os.path.join(work, "dv")
            mwt = os.path.join(work, "mw")
            t = timed(lambda: shutil.rmtree(dvt, ignore_errors=True)
                      or txlog_create(spark, dvt, orders, ("k",),
                                      64), n=1)
            emit(sf_dir, "create_64buckets", t, rows=n_rows)
            shutil.rmtree(mwt, ignore_errors=True)
            txlog_create(spark, mwt, orders, ("k",), 64)

            pred = "pmod(k, 14999) = 7"  # ~n/15000 scattered rows
            t_dv = timed(lambda: txlog_delete_rows(spark, dvt, pred),
                         n=1)  # replay would be a no-op; time once
            snap = txlog_snapshot(dvt)
            n_del = sum(e["count"] for e in snap["dvs"].values())
            emit(sf_dir, "dv_delete_scattered", t_dv,
                 n_deleted=n_del, dv_files=len(snap["dvs"]))

            keys = (orders.filter(F.expr(pred)).select("k")
                    .distinct())
            t_mw = timed(lambda: txlog_delete(spark, mwt, keys,
                                              ("k",), 64), n=1)
            emit(sf_dir, "mow_delete_scattered", t_mw,
                 n_deleted=n_del)

            agg = lambda p: (txlog_read(spark, p)  # noqa: E731
                             .groupBy((F.col("k") % 97).alias("g"))
                             .agg(F.sum("price_c").alias("s"))
                             .count())
            emit(sf_dir, "read_agg_with_dvs", timed(lambda: agg(dvt)))
            emit(sf_dir, "read_agg_plain", timed(lambda: agg(mwt)))

            t_c = timed(lambda: txlog_compact(spark, dvt,
                                              min_files=1), n=1)
            emit(sf_dir, "compact_materialize_dvs", t_c,
                 dv_left=len(txlog_snapshot(dvt)["dvs"]))

            # ---- z-order multi-column pruning --------------------
            zt = os.path.join(work, "z")
            shutil.rmtree(zt, ignore_errors=True)
            txlog_create(spark, zt, orders, ("k",), 32,
                         stats_cols=("cust", "price_c"))
            lo, hi = 1_000_000, 1_300_000  # ~2% of price_c domain

            def probe(col, lo_, hi_):
                d = txlog_read_range(spark, zt, lo_, hi_, col=col)
                return d.count(), len(d.inputFiles())

            c0, f0 = probe("price_c", lo, hi)
            t0 = timed(lambda: probe("price_c", lo, hi))
            emit(sf_dir, "range_probe_before_zorder", t0,
                 files=f0, total=len(txlog_snapshot(zt)["files"]),
                 rows=c0)
            tz = timed(lambda: txlog_zorder(spark, zt,
                                            ("cust", "price_c"),
                                            files_per_bucket=16,
                                            bits=8), n=1)
            emit(sf_dir, "zorder_rewrite", tz)
            total = len(txlog_snapshot(zt)["files"])
            c1, f1 = probe("price_c", lo, hi)
            t1 = timed(lambda: probe("price_c", lo, hi))
            assert c1 == c0, (c0, c1)
            emit(sf_dir, "range_probe_after_zorder", t1,
                 files=f1, total=total, rows=c1)
            chi = orders.agg(F.max("cust")).collect()[0][0]
            c2, f2 = probe("cust", int(chi * 0.40),
                           int(chi * 0.42))
            t2 = timed(lambda: probe("cust", int(chi * 0.40),
                                     int(chi * 0.42)))
            emit(sf_dir, "range_probe_other_col_after", t2,
                 files=f2, total=total, rows=c2)
        finally:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
