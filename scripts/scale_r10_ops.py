#!/usr/bin/env python
"""Scale-step evidence for the r10 operator additions (the VERDICT r7
pattern: every headline op carries an sf1→sf10 curve).

Runs each r10 op at /tmp/testdata/sf1 (10× driver SF) and sf10 (100×).
Prints one JSON line per (sf, op): {"sf_dir", "op", "sec": min-of-2,
...params}.

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

    from sstable_hadoop_spark.operators.asof import asof_join
    from sstable_hadoop_spark.operators.checks import check_constraints
    from sstable_hadoop_spark.operators.corpus import (
        canonicalize_url,
        cap_per_domain,
    )
    from sstable_hadoop_spark.operators.intervaljoin import interval_join
    from sstable_hadoop_spark.operators.lww import lww_cell, lww_refresh
    from sstable_hadoop_spark.operators.similarity import (
        cosine_topk_ivfsq8_stored,
        write_ivfsq8_index,
    )
    from sstable_hadoop_spark.operators.timeseries import resample_gapfill
    from sstable_hadoop_spark.operators.tokenizer import train_bpe_local
    from sstable_hadoop_spark.operators.txlog import (
        txlog_create,
        txlog_incremental_rollup,
        txlog_rollup,
        txlog_upsert,
    )
    from sstable_hadoop_spark.plans.session import get_session
    from sstable_hadoop_spark.queries import derived_cells, load, ts_us

    spark = get_session("scale-r10")
    spark.sparkContext.setLogLevel("ERROR")

    def emit(sf_dir, op, sec, **kw):
        print(json.dumps({"sf_dir": sf_dir, "op": op,
                          "sec": round(sec, 3), **kw}), flush=True)

    for sf_dir in sf_dirs:
        ev = load(spark, sf_dir, "events")
        pts = ev.select("event_id", "user_id", "event_type", "value",
                        ts_us(ev, "ts").alias("ts")).localCheckpoint()
        n_ev = pts.count()

        # --- interval join: 50 disjoint windows tiling the time range
        b = pts.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")) \
               .collect()[0]
        lo, span = int(b["lo"]), int(b["hi"]) - int(b["lo"])
        stride, width = span // 50, span // 100
        iv = spark.range(50).select(
            F.col("id").cast("int").alias("wid"),
            (F.lit(lo) + F.col("id") * stride).alias("wlo"),
            (F.lit(lo) + F.col("id") * stride + width).alias("whi"))
        sec = timed(lambda: noop(
            interval_join(pts.select("event_id", "ts"), iv, "ts",
                          "wlo", "whi", bucket_width=max(width, 1))))
        emit(sf_dir, "interval_join_50w", sec, n_events=n_ev)

        # --- as-of join: clicks matched to latest prior view per user
        views = (pts.filter(F.col("event_type") == "view")
                    .groupBy("user_id", "ts")
                    .agg(F.max("value").alias("value")))
        clicks = pts.filter(F.col("event_type") == "click") \
                    .select("user_id", "ts", "event_id")
        sec = timed(lambda: noop(
            asof_join(clicks, views, on="user_id", left_ts="ts")))
        emit(sf_dir, "asof_join_clicks_views", sec, n_events=n_ev)

        # --- data-quality suite over lineitem (the big fact table)
        li = load(spark, sf_dir, "lineitem")
        n_li = li.count()
        rules = [
            {"rule": "not_null", "column": "l_orderkey"},
            {"rule": "unique",
             "columns": ["l_orderkey", "l_linenumber"]},
            {"rule": "range", "column": "l_quantity",
             "min": 0.0, "max": 60.0},
            {"rule": "regex", "column": "l_linestatus",
             "pattern": "^[A-Z]$"},
            {"rule": "accepted_values", "column": "l_returnflag",
             "values": ["A", "N", "R"]},
            {"rule": "row_count", "min": 1},
        ]
        sec = timed(lambda: noop(check_constraints(li, rules)))
        emit(sf_dir, "check_constraints_6rules", sec, n_rows=n_li)

        # --- IVF+SQ8 store: build once, then the plan-pruned probe
        emb = load(spark, sf_dir, "embeddings").select(
            "vec_id", F.transform(
                "embedding",
                lambda x: x.cast("double")).alias("embedding"))
        n_vec = emb.count()
        root = tempfile.mkdtemp(prefix="ivfsq8_scale_")
        path = os.path.join(root, "idx")
        t0 = time.perf_counter()
        write_ivfsq8_index(emb, path)
        emit(sf_dir, "ivfsq8_build", time.perf_counter() - t0,
             n_vec=n_vec)
        q = emb.filter(F.col("vec_id") < 8).withColumnRenamed(
            "vec_id", "query_id").localCheckpoint()
        sec = timed(lambda: noop(
            cosine_topk_ivfsq8_stored(spark, path, q, k=5)))
        emit(sf_dir, "ivfsq8_stored_probe", sec, n_vec=n_vec)
        shutil.rmtree(root, ignore_errors=True)

        # --- incremental rollup vs full recompute on the txlog table
        cells = derived_cells(spark, sf_dir).localCheckpoint()
        root = tempfile.mkdtemp(prefix="txroll_scale_")
        path = os.path.join(root, "t")
        txlog_create(spark, path,
                     lww_cell(cells.filter(F.col("generation") <= 2)),
                     bucket_by=("key",), n_buckets=32,
                     sort_by=("key", "name"))
        stored = txlog_rollup(spark, path, ["state"], ["generation"],
                              version=1).localCheckpoint()
        # the realistic delta shape: a NARROW upsert touching 1 of 32
        # buckets (the daily-delta case the incremental path exists
        # for) — the change feed then reads 2 versions of ONE bucket,
        # not the table
        from sstable_hadoop_spark.operators.layout import bucket_id

        txlog_upsert(spark, path,
                     cells.filter(F.col("generation") == 4)
                          .filter(bucket_id(32, "key") == 7),
                     lww_refresh, bucket_by=("key",), n_buckets=32,
                     sort_by=("key", "name"))
        sec = timed(lambda: noop(txlog_incremental_rollup(
            spark, path, stored, ["state"], ["generation"], v_from=1)))
        emit(sf_dir, "txlog_incremental_rollup_narrow", sec,
             touched_buckets=1)
        # worst case: a delta touching EVERY bucket — here the diff
        # reads two whole versions and the full recompute wins; the
        # crossover is |touched buckets| << table
        txlog_upsert(spark, path,
                     cells.filter(F.col("generation") == 4),
                     lww_refresh, bucket_by=("key",), n_buckets=32,
                     sort_by=("key", "name"))
        sec = timed(lambda: noop(txlog_incremental_rollup(
            spark, path, stored, ["state"], ["generation"], v_from=1)))
        emit(sf_dir, "txlog_incremental_rollup_wide", sec,
             touched_buckets=32)
        sec = timed(lambda: noop(txlog_rollup(
            spark, path, ["state"], ["generation"])))
        emit(sf_dir, "txlog_full_rollup", sec)
        shutil.rmtree(root, ignore_errors=True)

        # --- driver-local BPE trainer (one Spark job + driver fold)
        docs = load(spark, sf_dir, "documents")
        n_doc = docs.count()
        t0 = time.perf_counter()
        n_merges = train_bpe_local(docs, n_merges=1000,
                                   min_freq=2).count()
        emit(sf_dir, "train_bpe_local_1k", time.perf_counter() - t0,
             n_doc=n_doc, merges=n_merges)

        # --- chunked-grid resample (the r9 op after the r10 rewrite)
        sec = timed(lambda: noop(resample_gapfill(
            ev, ts_us(ev, "ts"), "user_id", "value",
            step_us=3_600_000_000)))
        emit(sf_dir, "resample_gapfill_chunked", sec, n_events=n_ev)

        # --- canonicalize with the pct/dot tier + PSL domain caps
        urls = docs.select(
            "doc_id",
            F.concat(F.lit("https://www.site"),
                     F.pmod(F.col("doc_id"), F.lit(37)),
                     F.lit(".co.uk/a/./b/../p/%7Ed"),
                     F.col("doc_id")).alias("url"))
        sec = timed(lambda: noop(
            urls.select("doc_id",
                        canonicalize_url("url").alias("c"))))
        emit(sf_dir, "canonicalize_url_pct_dots", sec, n_doc=n_doc)
        sec = timed(lambda: noop(
            cap_per_domain(urls, "url", cap=5,
                           order_by=F.col("doc_id"), psl=True)))
        emit(sf_dir, "cap_per_domain_psl", sec, n_doc=n_doc)


if __name__ == "__main__":
    main()
