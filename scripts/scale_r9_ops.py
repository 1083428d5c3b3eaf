#!/usr/bin/env python
"""Scale-step evidence for the r9 operator additions (the VERDICT r7
pattern: every headline op carries an sf1→sf10 curve).

Runs each r9 op at /tmp/testdata/sf1 (10× driver SF) and sf10 (100×).
Prints one JSON line per (sf, op): {"sf_dir", "op", "sec": min-of-2,
...params}.  The txlog rows measure the MULTI-WRITER table's three
cost classes separately: the data-plane fold (tracks the delta), the
range probe (tracks matching files, ~constant in corpus), and the
change feed (tracks touched buckets).

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

    from sstable_hadoop_spark.operators.corpus import cap_per_domain
    from sstable_hadoop_spark.operators.html import (
        escape_html_text,
        extract_html_text,
    )
    from sstable_hadoop_spark.operators.lww import lww_cell, lww_refresh
    from sstable_hadoop_spark.operators.similarity import (
        cosine_topk_sq8,
        sq8_encode,
        train_sq8,
    )
    from sstable_hadoop_spark.operators.timeseries import resample_gapfill
    from sstable_hadoop_spark.operators.txlog import (
        txlog_create,
        txlog_diff,
        txlog_read_range,
        txlog_upsert,
    )
    from sstable_hadoop_spark.plans.session import get_session
    from sstable_hadoop_spark.queries import derived_cells, load, ts_us

    spark = get_session("scale-r9")
    spark.sparkContext.setLogLevel("ERROR")

    def emit(sf_dir, op, sec, **kw):
        print(json.dumps({"sf_dir": sf_dir, "op": op,
                          "sec": round(sec, 3), **kw}), flush=True)

    for sf_dir in sf_dirs:
        docs = load(spark, sf_dir, "documents")
        n_doc = docs.count()

        # --- txlog: create from gens 1-2, then per-generation upserts
        cells = derived_cells(spark, sf_dir).localCheckpoint()
        root = tempfile.mkdtemp(prefix="txlog_scale_")
        path = os.path.join(root, "t")
        t0 = time.perf_counter()
        txlog_create(spark, path,
                     lww_cell(cells.filter(F.col("generation") <= 2)),
                     bucket_by=("key",), n_buckets=32,
                     sort_by=("key", "name"))
        emit(sf_dir, "txlog_create", time.perf_counter() - t0,
             n_doc=n_doc)
        sec = timed(lambda: txlog_upsert(
            spark, path, cells.filter(F.col("generation") == 4),
            lww_refresh, bucket_by=("key",), n_buckets=32,
            sort_by=("key", "name")))
        emit(sf_dir, "txlog_upsert_gen", sec)
        # range probe: one key's slice — stats-pruned file list
        probe = cells.select(F.col("key")).limit(1).collect()[0]["key"]
        sec = timed(lambda: txlog_read_range(
            spark, path, bytes(probe), bytes(probe)).count())
        emit(sf_dir, "txlog_read_range_point", sec)
        sec = timed(lambda: txlog_diff(
            spark, path, 1).write.format("noop")
            .mode("overwrite").save())
        emit(sf_dir, "txlog_diff_since_create", sec)
        shutil.rmtree(root, ignore_errors=True)

        # --- html extraction over synthetic boilerplate pages
        page = F.concat(
            F.lit("<html><head><title>Doc "), F.col("doc_id"),
            F.lit("</title><script>if (1<2) alert('x')</script>"
                  "</head><body><nav><a href='/'>h</a></nav><p>"),
            escape_html_text(F.col("text")),
            F.lit("</p><footer>f</footer></body></html>"))
        html = docs.select("doc_id", page.alias("html"))
        sec = timed(lambda: noop(extract_html_text(html, "html")))
        emit(sf_dir, "html_extract_text", sec, n_doc=n_doc)

        # --- per-domain caps
        urls = docs.select(
            "doc_id",
            F.concat(F.lit("https://www.site"),
                     F.pmod(F.col("doc_id"), F.lit(37)),
                     F.lit(".com/p/"), F.col("doc_id")).alias("url"))
        sec = timed(lambda: noop(
            cap_per_domain(urls, "url", cap=5,
                           order_by=F.col("doc_id"))))
        emit(sf_dir, "cap_per_domain", sec, n_doc=n_doc)

        # --- int8 scalar quantization: train+encode once, then search
        emb = load(spark, sf_dir, "embeddings").select(
            "vec_id", F.transform(
                "embedding",
                lambda x: x.cast("double")).alias("embedding"))
        n_vec = emb.count()
        t0 = time.perf_counter()
        params = train_sq8(emb)
        codes = sq8_encode(emb, *params).localCheckpoint()
        emit(sf_dir, "sq8_train_encode", time.perf_counter() - t0,
             n_vec=n_vec)
        q = emb.filter(F.col("vec_id") < 8).withColumnRenamed(
            "vec_id", "query_id")
        sec = timed(lambda: noop(
            cosine_topk_sq8(emb, q, k=5, params=params, codes=codes)))
        emit(sf_dir, "cosine_topk_sq8", sec, n_vec=n_vec)

        # --- time-series resample
        ev = load(spark, sf_dir, "events")
        n_ev = ev.count()
        sec = timed(lambda: noop(resample_gapfill(
            ev, ts_us(ev, "ts"), "user_id", "value",
            6 * 3600 * 1_000_000)))
        emit(sf_dir, "resample_gapfill", sec, n_events=n_ev)


if __name__ == "__main__":
    main()
