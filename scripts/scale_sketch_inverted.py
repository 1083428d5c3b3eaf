#!/usr/bin/env python
"""Scale-step evidence for the late-r9 additions (sketches, inverted
index, BM25, phrase search) at /tmp/testdata/sf1 (10x driver SF) and
sf10 (100x).  One JSON line per (sf, op): {"sf_dir", "op", "sec":
min-of-2, ...}.

What each number certifies:
  * cms_build / hll_build — ONE corpus exchange whose shuffle volume
    is capped by the sketch size per task; wall time should track the
    corpus scan, the sketch row count stays fixed (printed).
  * inverted_build — the corpus-sized postings aggregation (the index
    write IS O(corpus), by design; it's the probes that must not be).
  * search/bm25/phrase probes — read only the query terms' buckets;
    cost tracks the query terms' postings (corpus df), NOT the index
    size: sublinear vs build as corpus grows.
"""

from __future__ import annotations

import json
import os
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


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/tmp/testdata/sf1", "/tmp/testdata/sf10"]

    from sstable_hadoop_spark.operators.inverted import (
        bm25_search,
        phrase_search,
        search_terms,
        write_inverted_index,
    )
    from sstable_hadoop_spark.operators.sketch import (
        cms_build,
        hll_build,
        hll_estimate,
        cms_topk_report,
    )
    from sstable_hadoop_spark.plans import get_session
    from sstable_hadoop_spark.queries import load

    spark = get_session()
    for sf_dir in sf_dirs:
        docs = load(spark, sf_dir, "documents")
        events = load(spark, sf_dir, "events")
        n_doc = docs.count()

        sec = timed(lambda: cms_build(docs, depth=4, width=1 << 12)
                    .count())
        print(json.dumps({"sf_dir": sf_dir, "op": "cms_build",
                          "sec": round(sec, 3), "n_doc": n_doc}),
              flush=True)

        sec = timed(lambda: cms_topk_report(docs, k=20, depth=4,
                                            width=16).count())
        print(json.dumps({"sf_dir": sf_dir, "op": "cms_topk_report",
                          "sec": round(sec, 3), "n_doc": n_doc}),
              flush=True)

        n_ev = events.count()
        sec = timed(lambda: hll_estimate(
            hll_build(events, "event_id", p=8), p=8).collect())
        print(json.dumps({"sf_dir": sf_dir, "op": "hll_build_estimate",
                          "sec": round(sec, 3), "n_events": n_ev}),
              flush=True)

        idx = os.path.join(tempfile.gettempdir(),
                           "scale_inv_" + os.path.basename(sf_dir))
        sec = timed(lambda: write_inverted_index(
            docs, idx, n_buckets=64, positions=True), n=1)
        print(json.dumps({"sf_dir": sf_dir, "op": "inverted_build",
                          "sec": round(sec, 3), "n_doc": n_doc}),
              flush=True)

        sec = timed(lambda: search_terms(
            spark, idx, ["dup", "join"], mode="and").count())
        print(json.dumps({"sf_dir": sf_dir, "op": "inverted_search_and",
                          "sec": round(sec, 3)}), flush=True)

        sec = timed(lambda: bm25_search(
            spark, idx, ["dup", "join", "scan"], limit=10).count())
        print(json.dumps({"sf_dir": sf_dir, "op": "bm25_topk",
                          "sec": round(sec, 3)}), flush=True)

        sec = timed(lambda: phrase_search(
            spark, idx, ["data", "row", "column"]).count())
        print(json.dumps({"sf_dir": sf_dir, "op": "phrase_search",
                          "sec": round(sec, 3)}), flush=True)


if __name__ == "__main__":
    main()
