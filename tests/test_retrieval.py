"""Rank-fusion tests (operators/retrieval.py): hand-computed RRF
scores, single-system documents, deterministic tie-breaks, bounded
inputs, guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sstable_hadoop_spark.operators.retrieval import (
    rank_from_scores,
    rrf_fuse,
)


def _ranking(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rank int")


def test_rrf_hand_computed(spark):
    # doc 1: rank 1 + rank 2 -> 1e6//61 + 1e6//62 = 16393 + 16129
    # doc 2: rank 2 + rank 1 -> same sum (tie, id asc breaks)
    # doc 3: rank 3 in A only -> 1e6//63 = 15873
    a = _ranking(spark, [(1, 1), (2, 2), (3, 3)])
    b = _ranking(spark, [(2, 1), (1, 2)])
    rows = {r["doc_id"]: (r["rrf_micro"], r["fused_rank"])
            for r in rrf_fuse([a, b], k=60).collect()}
    assert rows[1] == (16393 + 16129, 1)
    assert rows[2] == (16393 + 16129, 2)  # same score, higher id
    assert rows[3] == (15873, 3)


def test_rrf_limit_and_single_system(spark):
    a = _ranking(spark, [(i, i) for i in range(1, 8)])
    out = rrf_fuse([a], k=60, limit=3).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["fused_rank"])] \
        == [1, 2, 3]


def test_rank_from_scores_tiebreak_and_limit(spark):
    scored = spark.createDataFrame(
        [(10, 5), (11, 9), (12, 9), (13, 1)], "doc_id long, s long")
    got = {r["doc_id"]: r["rank"]
           for r in rank_from_scores(scored, score_col="s",
                                     limit=3).collect()}
    # 9 ties: lower id first; 13 cut by the limit
    assert got == {11: 1, 12: 2, 10: 3}


def test_rrf_guards(spark):
    a = _ranking(spark, [(1, 1)])
    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="k must"):
        rrf_fuse([a], k=0)
    with pytest.raises(ValueError, match="limit"):
        rank_from_scores(a.select("doc_id", F.lit(1).alias("s")),
                         score_col="s", limit=0)


def test_rrf_ignores_nonpositive_ranks(spark):
    # rank 0 / negative rows (a caller bug) contribute nothing rather
    # than inflating the score
    a = _ranking(spark, [(1, 1), (2, 0), (3, -4)])
    rows = {r["doc_id"]: r["rrf_micro"]
            for r in rrf_fuse([a], k=60).collect()}
    assert rows == {1: 1000000 // 61}
