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


def _anchor_once(spark) -> float:
    """One run of the host-calibration anchor (VERDICT r6 #6): a PINNED
    pure-Spark workload — 64M xxhash64 aggregations over range(), zero
    IO, zero engine code — timed in the same process as the suite.
    Its wall-clock moves only with the host (CPU contention, thermal,
    noisy neighbors), never with this repo's changes, so
    ``queries_normalized`` (query wall / anchor wall) is comparable
    across rounds even when absolute seconds drift."""
    t0 = time.perf_counter()
    (spark.range(0, 64_000_000, 1, 32)
          .selectExpr("sum(xxhash64(id) % 1000003) AS h")  # ANSI-safe
          .write.format("noop").mode("overwrite").save())
    return time.perf_counter() - t0


def _sink_throughput(spark, sf_dir: str) -> dict:
    """Sink write-path throughput guard (VERDICT r7 #4): rows/s through
    each write path — native SSTable family, Cassandra 1.x family,
    WARC, bucketed parquet — so a regression in the staged-commit
    protocols (hidden temps, driver-side rename pass, marker writes)
    is visible round over round.  The input DataFrame is cached and
    counted BEFORE the clock starts, so the timing covers the sink
    (task writes + staging + commit), not the upstream derivation;
    each write is verified by reading the output back and comparing
    row counts."""
    import shutil
    import tempfile

    from sstable_hadoop_spark.operators.layout import write_bucketed
    from sstable_hadoop_spark.operators.lww import collect_rows
    from sstable_hadoop_spark.queries import derived_cells, load

    from pyspark.sql import functions as F

    out: dict[str, dict] = {}

    def run(name: str, df, write_fn, count_fn) -> None:
        # AQE coalesces these small grouped inputs to 1-2 partitions,
        # which would serialize the task-parallel sinks onto one task
        # and measure codec speed, not the write path a real job runs;
        # spread the cached input across the session's cores first
        df = df.repartition(spark.sparkContext.defaultParallelism).cache()
        n = df.count()  # materialize outside the clock
        best = float("inf")
        try:
            for attempt in range(2):  # min-of-2: first write pays
                d = tempfile.mkdtemp(  # codegen + cold page cache
                    prefix=f"sinkbench_{name}_")
                try:
                    t0 = time.perf_counter()
                    write_fn(df, d)
                    best = min(best, time.perf_counter() - t0)
                    got = count_fn(d)
                    if got != n:
                        raise AssertionError(
                            f"sink {name}: wrote {n} rows, "
                            f"read back {got}")
                finally:
                    shutil.rmtree(d, ignore_errors=True)
            out[name] = {"rows": n, "sec": round(best, 3),
                         "rows_per_sec": int(n / best)}
        finally:
            df.unpersist()

    nested = collect_rows(derived_cells(spark, sf_dir),
                          by_generation=True)
    run("sstable_native", nested,
        lambda df, d: (df.write.format("sstable").option("path", d)
                       .mode("append").save()),
        lambda d: spark.read.format("sstable").load(d).count())
    run("sstable_cassandra", nested,
        lambda df, d: (df.write.format("sstable").option("path", d)
                       .option("format", "cassandra")
                       .option("compressed", "true")
                       .mode("append").save()),
        lambda d: (spark.read.format("sstable")
                   .option("format", "cassandra").load(d).count()))
    docs = load(spark, sf_dir, "documents")
    run("warc", docs.select(
            F.concat(F.lit("http://corpus/"),
                     F.col("doc_id").cast("string")).alias("target_uri"),
            F.encode("text", "UTF-8").alias("payload")),
        lambda df, d: (df.write.format("warc").mode("append").save(d)),
        lambda d: spark.read.format("warc").load(d).count())
    run("bucketed_parquet", docs.selectExpr("doc_id AS k", "n_chars AS v"),
        lambda df, d: write_bucketed(df, d, "sinkbench",
                                     bucket_by=("k",), n_buckets=16),
        lambda d: spark.read.parquet(d).count())

    from sstable_hadoop_spark.operators.txlog import (
        txlog_create,
        txlog_read,
    )

    run("txlog_create", docs.selectExpr("doc_id AS k", "n_chars AS v"),
        lambda df, d: txlog_create(spark, d + "/t", df,
                                   bucket_by=("k",), n_buckets=16),
        lambda d: txlog_read(spark, d + "/t").count())
    return out


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

    # warm the session (JVM/codegen/Arrow init) outside the clock,
    # including one unrecorded anchor run (its own codegen)
    spark.range(1000).selectExpr("sum(id)").collect()
    _anchor_once(spark)

    # three iterations per query, report the min: steady-state throughput
    # (first execution of each plan pays one-time codegen/JIT costs that
    # a long-running cluster job amortizes away).  An anchor slice is
    # timed between EVERY query (r11 protocol, VERDICT r10 #2: the r10
    # start/middle/end slices spread 0.24-0.86 s within one run, so a
    # query's normalization could be paired with a slice taken under a
    # different host load; min-of-all over-corrected).  Each query
    # normalizes by the MIN of its two NEIGHBORING slices — the host
    # speed bracketing that query's own window — so a load spike
    # inflates that query's wall AND its local anchor together instead
    # of poisoning the whole run's denominator.
    names = list(BENCH_QUERIES.items())
    anchor_slices = [round(_anchor_once(spark), 3)]
    timings: dict[str, float] = {}
    local_anchor: dict[str, float] = {}
    for bench_name, query_name in names:
        fn = registry[query_name]
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[bench_name] = round(best, 3)
        anchor_slices.append(round(_anchor_once(spark), 3))
        local_anchor[bench_name] = min(anchor_slices[-2],
                                       anchor_slices[-1])
    anchor = min(anchor_slices)

    sinks = _sink_throughput(spark, sf_dir)

    result = {
        "metric": "bench_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_num,
        # host calibration: anchor_sec times a pinned pure-Spark
        # workload (no engine code, no IO).  r11 protocol: a slice is
        # taken between every query and each query normalizes by the
        # min of its two NEIGHBORING slices (local host speed), so
        # mid-run load shifts can no longer pair a slow query with a
        # fast far-away anchor.  anchor_sec stays the global min for
        # cross-round comparability of value_normalized; the full
        # slice list shows any within-run spread.
        "anchor_sec": round(anchor, 3),
        "anchor_sec_slices": anchor_slices,
        "queries_normalized": {k: round(v / local_anchor[k], 2)
                               for k, v in timings.items()},
        "value_normalized": round(sum(timings.values()) / anchor, 2),
        # sink write-path rows/s (input cached before the clock,
        # read-back verified) — guards the staged-commit protocols
        "sinks": sinks,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
