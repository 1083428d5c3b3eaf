#!/usr/bin/env python
"""Scale-step evidence for the r9 analytics/retrieval family at
/tmp/testdata sf1 (10x driver SF) and sf10 (100x).  One JSON line per
(sf, op); min-of-2.

What each number certifies:
  * funnel_report — ONE user-keyed exchange + sort at any depth; wall
    time should track the events scan.
  * cohort_retention — the (user, period) distinct downsamples the
    corpus; everything after is users x periods.
  * rolling_outliers — one user-keyed window pass, all codegen.
  * bloom_filtered_join — the fact side is prefiltered scan-locally;
    compare against the plain join at the same SF (the delta is the
    avoided shuffle volume).
"""

from __future__ import annotations

import json
import os
import sys
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


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/tmp/testdata/sf1", "/tmp/testdata/sf10"]

    import pyspark.sql.functions as F

    from sstable_hadoop_spark.operators.bloomjoin import (
        bloom_filtered_join,
    )
    from sstable_hadoop_spark.operators.cohort import cohort_retention
    from sstable_hadoop_spark.operators.funnel import funnel_report
    from sstable_hadoop_spark.operators.outliers import rolling_outliers
    from sstable_hadoop_spark.plans import get_session
    from sstable_hadoop_spark.queries import ts_us

    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    out = []

    for sf_dir in sf_dirs:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        n_ev = ev.count()

        sec = timed(lambda: funnel_report(
            ev, ts_us(ev, "ts"), "user_id", "event_type",
            ["view", "click", "purchase"],
            within_us=6 * 3600 * 1_000_000,
            tie_cols=["event_id"]).collect())
        out.append({"sf_dir": sf_dir, "op": "funnel_report",
                    "sec": round(sec, 3), "events": n_ev})

        sec = timed(lambda: cohort_retention(
            ev, ts_us(ev, "ts"), "user_id",
            step_us=7 * 86400 * 1_000_000).collect())
        out.append({"sf_dir": sf_dir, "op": "cohort_retention",
                    "sec": round(sec, 3), "events": n_ev})

        sec = timed(lambda: rolling_outliers(
            ev, ts_us(ev, "ts"), "user_id", "value",
            tie_cols=["event_id"])
            .agg(F.sum("is_outlier"), F.count("*")).collect())
        out.append({"sf_dir": sf_dir, "op": "rolling_outliers",
                    "sec": round(sec, 3), "events": n_ev})

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        parts = (spark.read.parquet(f"{sf_dir}/part.parquet")
                 .where(F.col("p_size") == 1)
                 .select(F.col("p_partkey").alias("l_partkey"),
                         "p_brand"))

        def agg(j):
            return (j.groupBy("p_brand")
                     .agg(F.count("*"),
                          F.sum(F.col("l_extendedprice")
                                * (1 - F.col("l_discount"))))
                     .collect())

        sec_plain = timed(lambda: agg(li.join(parts, "l_partkey")))
        sec_bloom = timed(lambda: agg(
            bloom_filtered_join(li, parts, "l_partkey")))
        out.append({"sf_dir": sf_dir, "op": "join_plain",
                    "sec": round(sec_plain, 3)})
        out.append({"sf_dir": sf_dir, "op": "join_bloom_prefiltered",
                    "sec": round(sec_bloom, 3)})

    for row in out:
        print(json.dumps(row))


if __name__ == "__main__":
    main()
