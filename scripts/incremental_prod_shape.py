#!/usr/bin/env python
"""Production-shape incremental dedup timing (the BASELINE.md scale
rows): the corpus profile store is PRE-BUILT to parquet (untimed, the
one-time build a real pipeline amortizes), then the timed path is
store read + incremental dedup of the 10% batch — the daily-ingest
cost that must stay near-constant in corpus size.

Usage: python scripts/incremental_prod_shape.py SFDIR [SFDIR...]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/tmp/testdata/sf1"]

    from pyspark.sql import functions as F

    from sstable_hadoop_spark.operators.dedup import (
        minhash_dedup_incremental,
        minhash_profiles,
    )
    from sstable_hadoop_spark.plans import get_session
    from sstable_hadoop_spark.queries import _SHINGLE_N, load

    spark = get_session("incr_prod")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    for sf_dir in sf_dirs:
        docs = load(spark, sf_dir, "documents")
        store = os.path.join(tempfile.gettempdir(),
                             "incr_store_" + sf_dir.replace("/", "_"))
        if not os.path.exists(store):
            (minhash_profiles(docs.filter(F.col("doc_id") % 10 != 0),
                              n=_SHINGLE_N, num_perm=16,
                              max_doc_freq=None)
             .write.mode("overwrite").parquet(store))
        new = docs.filter(F.col("doc_id") % 10 == 0)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            stored = spark.read.parquet(store)
            (minhash_dedup_incremental(new, stored, n=_SHINGLE_N,
                                       num_perm=16, bands=4,
                                       min_jaccard=0.5, max_doc_freq=None)
             .write.format("noop").mode("overwrite").save())
            best = min(best, time.perf_counter() - t0)
        n_corpus = spark.read.parquet(store).count()
        print(json.dumps({"sf_dir": sf_dir, "stored_profiles": n_corpus,
                          "incremental_sec": round(best, 3)}), flush=True)


if __name__ == "__main__":
    main()
