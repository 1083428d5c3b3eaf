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
