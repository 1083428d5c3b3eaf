#!/usr/bin/env python
"""Scale-curve bench for the scale-flagship queries (VERDICT r5 #4).

Runs the named queries() entries at each given sf dir through the noop
sink (min of 3, same harness as bench.py) and prints one JSON line per
(sf_dir, query).

Usage:
    python scripts/scale_curve.py SFDIR [SFDIR...] -- QUERY [QUERY...]
Defaults: /tmp/testdata/sf1 /tmp/testdata/sf10 -- flagship_lww_merge
          dedup_minhash_lsh dedup_minhash_incremental
          similarity_topk_ivf_stored sstable_lww_merge
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    if "--" in args:
        cut = args.index("--")
        sf_dirs, queries = args[:cut], args[cut + 1:]
    else:
        sf_dirs, queries = args, []
    sf_dirs = sf_dirs or ["/tmp/testdata/sf1", "/tmp/testdata/sf10"]
    queries = queries or ["flagship_lww_merge", "dedup_minhash_lsh",
                          "dedup_minhash_incremental",
                          "similarity_topk_ivf_stored",
                          "sstable_lww_merge"]

    from sstable_hadoop_spark.plans import get_session
    from sstable_hadoop_spark.queries import all_queries

    spark = get_session("scale_curve")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    spark.range(1000).selectExpr("sum(id)").collect()

    for sf_dir in sf_dirs:
        for name in queries:
            fn = registry[name]
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop") \
                    .mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            print(json.dumps({"sf_dir": sf_dir, "query": name,
                              "sec": round(best, 3)}), flush=True)


if __name__ == "__main__":
    main()
