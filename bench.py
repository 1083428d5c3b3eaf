#!/usr/bin/env python
"""Engine benchmark — headline queries from BASELINE.md at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through the ``noop`` sink (forces
execution of every operator, no driver collect).
"""

from __future__ import annotations

import json
import os
import sys
import time


BENCH_QUERIES = {
    # BASELINE.md bench name → queries.py entry
    "flagship_lww_merge": "flagship_lww_merge",
    "scan_project_filter": "scan_project_filter",
    "join_agg": "join_agg_revenue",
    "window_topk": "window_topk_orders",
    "dedup_minhash": "dedup_minhash_lsh",
    "similarity_topk": "similarity_topk_bruteforce",
    # r2 additions: regression guards for the custom source's Arrow scan
    # path and the join planner (broadcast dims + AQE)
    "sstable_scan": "sstable_scan_roundtrip",
    "five_way_join": "five_way_join_region_revenue",
    # hot-key LWW through the auto skew probe (operators/skew.py)
    "lww_skewed": "lww_skewed_auto",
    # the reference's headline job: file scan (flat cells) → LWW merge
    "sstable_lww": "sstable_lww_merge",
    # key-only projected scan (columns=key,generation) — must bench
    # measurably below sstable_scan (r4: explicit column projection)
    "sstable_keys": "sstable_keys_scan",
    # end-to-end LLM-corpus pass: dedup → quality filter → lang-ID →
    # per-language rollup, join-free (one dedup shuffle + one scan)
    "corpus_curation": "corpus_curation_pipeline",
    # training-data export: stratified sample → hash split → token
    # chunking → rollup in one scan (r4 corpus operators)
    "corpus_export": "corpus_training_export",
}


def _anchor_sec(spark) -> float:
    """Host-calibration anchor (VERDICT r6 #6): a PINNED pure-Spark
    workload — 64M xxhash64 aggregations over range(), zero IO, zero
    engine code — timed in the same process as the suite.  Its
    wall-clock moves only with the host (CPU contention, thermal,
    noisy neighbors), never with this repo's changes, so
    ``queries_normalized`` (query wall / anchor wall) is comparable
    across rounds even when absolute seconds drift: r6's uniform
    1.36× 'regression' was pure host drift (PERF.md A/B)."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        (spark.range(0, 64_000_000, 1, 32)
              .selectExpr("sum(xxhash64(id) % 1000003) AS h")  # ANSI-safe
              .write.format("noop").mode("overwrite").save())
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = sf

    from sstable_hadoop_spark.plans import get_session
    from sstable_hadoop_spark.queries import all_queries

    spark = get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    # warm the session (JVM/codegen/Arrow init) outside the clock
    spark.range(1000).selectExpr("sum(id)").collect()
    anchor = _anchor_sec(spark)

    # three iterations per query, report the min: steady-state throughput
    # (first execution of each plan pays one-time codegen/JIT costs that
    # a long-running cluster job amortizes away)
    timings: dict[str, float] = {}
    for bench_name, query_name in BENCH_QUERIES.items():
        fn = registry[query_name]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[bench_name] = round(best, 3)

    result = {
        "metric": "bench_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_num,
        # host calibration: anchor_sec times a pinned pure-Spark
        # workload (no engine code, no IO); queries_normalized =
        # query wall / anchor wall is host-drift-proof across rounds
        "anchor_sec": round(anchor, 3),
        "queries_normalized": {k: round(v / anchor, 2)
                               for k, v in timings.items()},
        "value_normalized": round(sum(timings.values()) / anchor, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
