#!/usr/bin/env python
"""Scale-step evidence for the r8 operator additions (VERDICT r7
pattern: every headline op carries an sf1→sf10 curve).

Runs each r8 op at /tmp/testdata/sf1 (10× driver SF) and sf10 (100×)
with PRODUCTION-SHAPED parameters — where the op's 100 TB story says a
knob must scale with the corpus (semantic dedup's n_centroids, the
SemDeDup paper's ~constant cluster SIZE), the script scales it, because
that is how a deployment would run it; fixed-knob numbers would measure
the misconfiguration, not the operator.  Prints one JSON line per
(sf, op): {"sf_dir": ..., "op": ..., "sec": min-of-2, ...params}.

Build the inputs first:
    python scripts/scale_testdata.py 10  /root/testdata/sf0.1 /tmp/testdata/sf1
    python scripts/scale_testdata.py 100 /root/testdata/sf0.1 /tmp/testdata/sf10
"""

from __future__ import annotations

import json
import os
import shutil
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


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/tmp/testdata/sf1", "/tmp/testdata/sf10"]

    from pyspark.sql import functions as F

    from sstable_hadoop_spark.operators.corpus import (
        contamination_scores,
        decontaminate_bloom,
    )
    from sstable_hadoop_spark.operators.dedup import semantic_dedup
    from sstable_hadoop_spark.operators.similarity import (
        cosine_topk_ivfpq_stored,
        write_ivfpq_index,
    )
    from sstable_hadoop_spark.operators.text import ngram_lm_scores
    from sstable_hadoop_spark.operators.tokenizer import (
        bpe_tokenize,
        bpe_tokenize_fast,
        train_bpe,
    )
    from sstable_hadoop_spark.plans import get_session
    from sstable_hadoop_spark.queries import load

    spark = get_session("scale_r8_ops")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    def emit(sf_dir: str, op: str, sec: float, **params) -> None:
        print(json.dumps({"sf_dir": sf_dir, "op": op,
                          "sec": round(sec, 3), **params}), flush=True)

    for sf_dir in sf_dirs:
        docs = load(spark, sf_dir, "documents")
        emb = load(spark, sf_dir, "embeddings")
        n_vec = emb.count()
        n_doc = docs.count()
        bench = docs.filter(F.col("doc_id") % 97 == 0)

        # SemDeDup: constant EXPECTED cell size (~1250 vecs — the
        # paper scales cluster count with the corpus)
        n_cent = max(16, n_vec // 1250)
        emit(sf_dir, "semantic_dedup",
             timed(lambda: noop(semantic_dedup(emb, tau=0.9,
                                               n_centroids=n_cent))),
             n_vec=n_vec, n_centroids=n_cent)

        emit(sf_dir, "ngram_lm_scores",
             timed(lambda: noop(ngram_lm_scores(
                 docs, lm_df=docs.filter(F.col("doc_id") % 2 == 0)))),
             n_doc=n_doc)

        emit(sf_dir, "decontaminate_bloom",
             timed(lambda: noop(decontaminate_bloom(docs, bench, n=8))),
             n_doc=n_doc)

        emit(sf_dir, "contamination_scores",
             timed(lambda: noop(contamination_scores(docs, bench, n=8))),
             n_doc=n_doc)

        merges = None

        def train():
            nonlocal merges
            merges = train_bpe(docs, n_merges=16, min_freq=2)
            merges.collect()

        emit(sf_dir, "train_bpe_16", timed(train, n=1), n_doc=n_doc)
        emit(sf_dir, "bpe_tokenize",
             timed(lambda: noop(bpe_tokenize(docs, merges))),
             n_doc=n_doc)
        emit(sf_dir, "bpe_tokenize_fast",
             timed(lambda: noop(bpe_tokenize_fast(docs, merges))),
             n_doc=n_doc)

        # IVF+PQ: fixed 16-cell geometry (cells are partition dirs;
        # probe reads n_probe/n_centroids of the compressed index)
        idx = os.path.join("/tmp", "ivfpq_scale_idx_" +
                           os.path.basename(sf_dir.rstrip("/")))
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.perf_counter()
        write_ivfpq_index(emb, idx)
        emit(sf_dir, "write_ivfpq_index", time.perf_counter() - t0,
             n_vec=n_vec)
        q = emb.filter(F.col("vec_id") < 20).withColumnRenamed(
            "vec_id", "query_id")
        emit(sf_dir, "cosine_topk_ivfpq_stored",
             timed(lambda: noop(cosine_topk_ivfpq_stored(
                 spark, idx, q, k=5))),
             n_vec=n_vec)


if __name__ == "__main__":
    main()
