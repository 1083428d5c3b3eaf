#!/usr/bin/env python
"""Scale-step evidence for the HDR quantile sketch at /tmp/testdata
sf1 (10x driver SF) and sf10 (100x).  One JSON line per (sf, op).

What each number certifies:
  * hdr_build — ONE corpus exchange whose map-side partial sums cap
    shuffle volume at the bucket count per task; wall time should
    track the corpus scan while the histogram row count stays fixed
    (printed as n_buckets).
  * hdr_quantiles — the cumulative walk + probe join run over the
    HISTOGRAM only: near-constant in corpus size (the 100 TB story —
    build once per shard, merge cells, answer quantiles from
    metadata).
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

    from sstable_hadoop_spark.operators.sketch import (
        hdr_build,
        hdr_quantiles,
    )
    from sstable_hadoop_spark.plans import get_session

    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")

    for sf_dir in sf_dirs:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        cents = li.select(
            F.floor(F.col("l_extendedprice") * 100).cast("long")
             .alias("cents"))
        n_rows = cents.count()

        sec_build = timed(
            lambda: hdr_build(cents, "cents", sub_bits=7)
            .agg(F.count("*"), F.sum("c")).collect())
        sketch = hdr_build(cents, "cents", sub_bits=7).localCheckpoint()
        n_buckets = sketch.count()
        sec_q = timed(
            lambda: hdr_quantiles(
                sketch, [500, 900, 990, 999], sub_bits=7).collect())

        print(json.dumps({
            "sf_dir": sf_dir, "op": "hdr_build", "sec": round(sec_build, 3),
            "rows": n_rows, "n_buckets": n_buckets}))
        print(json.dumps({
            "sf_dir": sf_dir, "op": "hdr_quantiles",
            "sec": round(sec_q, 3), "n_buckets": n_buckets}))


if __name__ == "__main__":
    main()
