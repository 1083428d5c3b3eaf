"""Inverted-index tests (operators/inverted.py): index round-trip vs
a direct corpus scan, AND/OR semantics, plan-time partition pruning
of unprobed buckets, sidecar-bound layout, and guards."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from sstable_hadoop_spark.operators.inverted import (
    index_bucket,
    search_terms,
    write_inverted_index,
)


def _docs(spark):
    rows = [
        (1, "alpha beta gamma alpha"),
        (2, "beta delta"),
        (3, "alpha delta epsilon delta"),
        (4, ""),
        (5, None),
        (6, "Alpha BETA"),  # case folding: tokens are lowered
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_search_and_or_semantics_match_scan(spark, tmp_path):
    path = str(tmp_path / "inv")
    write_inverted_index(_docs(spark), path, n_buckets=8)

    got_and = {(r["doc_id"], r["n_terms_hit"], r["total_tf"])
               for r in search_terms(spark, path, ["alpha", "beta"],
                                     mode="and").collect()}
    # docs with both: 1 (alpha x2 + beta) and 6 (alpha + beta, lowered)
    assert got_and == {(1, 2, 3), (6, 2, 2)}

    got_or = {(r["doc_id"], r["n_terms_hit"], r["total_tf"])
              for r in search_terms(spark, path, ["alpha", "beta"],
                                    mode="or").collect()}
    assert got_or == {(1, 2, 3), (2, 1, 1), (3, 1, 1), (6, 2, 2)}


def test_probe_prunes_unprobed_buckets_at_plan_time(spark, tmp_path):
    path = str(tmp_path / "inv")
    write_inverted_index(_docs(spark), path, n_buckets=8)
    parts = [d for d in os.listdir(path) if d.startswith("_b=")]
    assert len(parts) > 1  # terms actually spread over buckets

    probe = search_terms(spark, path, ["alpha"])
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_b" in plan
    # the probed term's bucket is pinned in the partition filter
    # (md5("alpha")'s 60-bit half mod 8 == 3) and the term equality
    # is ALSO pushed to the scan
    assert "= 3" in plan.split("PartitionFilters")[1].split("]")[0]
    assert "EqualTo(term,alpha)" in plan


def test_duplicate_terms_in_query_collapse(spark, tmp_path):
    path = str(tmp_path / "inv")
    write_inverted_index(_docs(spark), path, n_buckets=4)
    a = {(r["doc_id"], r["total_tf"])
         for r in search_terms(spark, path, ["delta"]).collect()}
    b = {(r["doc_id"], r["total_tf"])
         for r in search_terms(spark, path,
                               ["delta", "delta"]).collect()}
    assert a == b == {(2, 1), (3, 2)}


def test_bucket_hash_matches_driver_side_probe(spark, tmp_path):
    # the writer's Spark-side md5 bucket must equal the probe's
    # hashlib-derived bucket, or probes would read the wrong dirs
    import hashlib

    words = ["alpha", "beta", "delta", "Zebra", "dup", "join"]
    df = spark.createDataFrame([(w,) for w in words], "w string")
    spark_b = {r["w"]: r["b"] for r in df.select(
        "w", index_bucket(F.col("w"), 16).alias("b")).collect()}
    for w in words:
        py_b = int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % 16
        assert spark_b[w] == py_b, w


def test_missing_term_and_empty_result(spark, tmp_path):
    path = str(tmp_path / "inv")
    write_inverted_index(_docs(spark), path, n_buckets=4)
    assert search_terms(spark, path, ["ghost"]).count() == 0
    # AND with one hit + one miss = empty
    assert search_terms(spark, path, ["alpha", "ghost"],
                        mode="and").count() == 0


def test_guards(spark, tmp_path):
    path = str(tmp_path / "inv")
    write_inverted_index(_docs(spark), path, n_buckets=4)
    with pytest.raises(ValueError, match="mode"):
        search_terms(spark, path, ["alpha"], mode="xor")
    with pytest.raises(ValueError, match="at least one"):
        search_terms(spark, path, [])
    with pytest.raises(ValueError, match="n_buckets"):
        write_inverted_index(_docs(spark), path, n_buckets=0)


def _tdiv(a: int, b: int) -> int:
    # Spark `div` / DuckDB `//` truncate toward zero; Python floors —
    # emulate the engines for the reference implementation
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _bm25_reference(rows, terms, k1=1200, b=750):
    """Independent per-doc BM25 in plain Python, same integer ops."""
    import math
    import re

    toks = {i: [t for t in re.split(r"[ \t\n\x0b\f\r]+",
                                    (x or "").lower()) if t]
            for i, x in rows}
    n = len(toks)
    tt = sum(len(v) for v in toks.values())
    scores = {}
    hit_terms = {}
    for t in set(terms):
        df = sum(1 for v in toks.values() if t in v)
        if df == 0:
            continue
        idf = math.floor(
            math.log((2 * n - 2 * df + 1.0) / (2 * df + 1.0)) * 1e6)
        for i, v in toks.items():
            tf = v.count(t)
            if tf == 0:
                continue
            inner = (1000 - b) + _tdiv(b * len(v) * n, tt)
            denom = tf * 1000 + _tdiv(k1 * inner, 1000)
            contrib = _tdiv(idf * tf * (k1 + 1000), denom)
            scores[i] = scores.get(i, 0) + contrib
            hit_terms[i] = hit_terms.get(i, 0) + 1
    return {i: (hit_terms[i], s) for i, s in scores.items()}


def test_bm25_matches_independent_reference(spark, tmp_path):
    from sstable_hadoop_spark.operators.inverted import bm25_search

    rows = [
        (1, "alpha beta gamma alpha rare"),
        (2, "beta delta beta beta"),
        (3, "alpha delta epsilon delta rare rare"),
        (4, "alpha alpha alpha beta beta gamma gamma delta"),
        (5, None),
        (6, "beta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "inv")
    write_inverted_index(df, path, n_buckets=8)
    terms = ["rare", "beta", "ghost"]  # +idf, -idf, absent
    got = {r["doc_id"]: (r["n_terms_hit"], r["score_micro"])
           for r in bm25_search(spark, path, terms, limit=10).collect()}
    want = _bm25_reference(rows, terms)
    assert got == want
    # the rare term actually scored positive somewhere and the
    # near-universal term negative somewhere (both idf signs live)
    assert any(s > 0 for _, s in want.values())
    assert any(s < 0 for _, s in want.values())


def test_bm25_order_and_limit(spark, tmp_path):
    from sstable_hadoop_spark.operators.inverted import bm25_search

    # needle in 3 of 10 docs -> df < N/2, POSITIVE idf
    rows = [(i, "needle " * i + "hay") for i in range(1, 4)] + \
           [(i, "hay hay hay") for i in range(4, 11)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "inv")
    write_inverted_index(df, path, n_buckets=4)
    out = bm25_search(spark, path, ["needle"], limit=2).collect()
    assert len(out) == 2  # limit < matching docs
    scores = [r["score_micro"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # with positive idf, more needle occurrences never scores lower
    full = {r["doc_id"]: r["score_micro"]
            for r in bm25_search(spark, path, ["needle"],
                                 limit=10).collect()}
    assert full[1] <= full[2] <= full[3]


def test_bm25_guards(spark, tmp_path):
    from sstable_hadoop_spark.operators.inverted import bm25_search

    path = str(tmp_path / "inv")
    write_inverted_index(
        spark.createDataFrame([(1, "x")], "doc_id long, text string"),
        path, n_buckets=2)
    with pytest.raises(ValueError, match="at least one"):
        bm25_search(spark, path, [])
    with pytest.raises(ValueError, match="limit"):
        bm25_search(spark, path, ["x"], limit=0)
    empty = str(tmp_path / "empty")
    write_inverted_index(
        spark.createDataFrame([(1, None)], "doc_id long, text string"),
        empty, n_buckets=2)
    with pytest.raises(ValueError, match="no tokens"):
        bm25_search(spark, empty, ["x"])


def test_phrase_search_adjacency_and_overlaps(spark, tmp_path):
    from sstable_hadoop_spark.operators.inverted import phrase_search

    rows = [
        (1, "a b c a b"),   # "a b" x2, "a b c" x1
        (2, "b a"),          # reversed - no phrase
        (3, "a a a"),        # overlapping "a a" x2
        (4, "c b a b c"),    # "a b" x1, "a b c" x1
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "inv")
    write_inverted_index(df, path, n_buckets=4, positions=True)
    got = lambda ts: sorted(
        (r["doc_id"], r["n_occurrences"])
        for r in phrase_search(spark, path, ts).collect())
    assert got(["a", "b"]) == [(1, 2), (4, 1)]
    assert got(["a", "a"]) == [(3, 2)]          # repeated term + overlap
    assert got(["a", "b", "c"]) == [(1, 1), (4, 1)]
    assert got(["c", "a"]) == [(1, 1)]           # "...c a..." in doc 1
    assert got(["b", "b"]) == []                 # co-occur, not adjacent
    assert got(["ghost", "a"]) == []


def test_phrase_search_single_term_equals_tf(spark, tmp_path):
    from sstable_hadoop_spark.operators.inverted import phrase_search

    df = spark.createDataFrame(
        [(1, "x y x"), (2, "y")], "doc_id long, text string")
    path = str(tmp_path / "inv")
    write_inverted_index(df, path, n_buckets=2, positions=True)
    got = sorted((r["doc_id"], r["n_occurrences"])
                 for r in phrase_search(spark, path, ["x"]).collect())
    assert got == [(1, 2)]


def test_phrase_search_requires_positions(spark, tmp_path):
    from sstable_hadoop_spark.operators.inverted import phrase_search

    path = str(tmp_path / "inv")
    write_inverted_index(
        spark.createDataFrame([(1, "a b")], "doc_id long, text string"),
        path, n_buckets=2)  # positions=False
    with pytest.raises(ValueError, match="positions"):
        phrase_search(spark, path, ["a", "b"])
    with pytest.raises(ValueError, match="at least one"):
        phrase_search(spark, path, [])


def test_positions_dont_change_search_or_bm25(spark, tmp_path):
    from sstable_hadoop_spark.operators.inverted import bm25_search

    df = _docs(spark)
    plain = str(tmp_path / "plain")
    posd = str(tmp_path / "posd")
    write_inverted_index(df, plain, n_buckets=4)
    write_inverted_index(df, posd, n_buckets=4, positions=True)
    a = sorted(tuple(r) for r in
               search_terms(spark, plain, ["alpha", "beta"],
                            mode="or").collect())
    b = sorted(tuple(r) for r in
               search_terms(spark, posd, ["alpha", "beta"],
                            mode="or").collect())
    assert a == b
    sa = [tuple(r) for r in
          bm25_search(spark, plain, ["alpha", "delta"]).collect()]
    sb = [tuple(r) for r in
          bm25_search(spark, posd, ["alpha", "delta"]).collect()]
    assert sa == sb


def test_bm25_inner_term_survives_planet_scale_totals(spark, tmp_path):
    # b*dl*n_docs at the corpus scale the module targets exceeds
    # LONG (e.g. 750 * 5 * 1e16 ≈ 3.8e19 > 2^63): the inner term is
    # widened to DECIMAL, so scores keep their sign.  Forge the
    # sidecar totals to planet scale and require a positive score
    # (a wrap flips denom negative -> negative score).
    import json as _json

    from sstable_hadoop_spark.operators.inverted import (
        _META,
        bm25_search,
    )

    path = str(tmp_path / "inv")
    write_inverted_index(
        spark.createDataFrame([(1, "needle hay hay hay hay")],
                              "doc_id long, text string"),
        path, n_buckets=2)
    meta = _json.loads(open(f"{path}/{_META}").read())
    meta["n_docs"] = 10 ** 16
    meta["total_tokens"] = 5 * 10 ** 16
    open(f"{path}/{_META}", "w").write(_json.dumps(meta))
    out = bm25_search(spark, path, ["needle"], limit=1).collect()
    assert len(out) == 1 and out[0]["score_micro"] > 0, out
