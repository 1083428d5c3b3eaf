"""Bloom-prefiltered join tests (operators/bloomjoin.py): result ==
plain join, the prefilter actually prunes, no exchange in the
prefilter plan, FP-survivor behavior at tiny m, guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sstable_hadoop_spark.operators.bloomjoin import (
    bloom_filtered_join,
    bloom_prefilter,
    build_key_bloom,
)


def _sides(spark):
    big = spark.range(5000).select(
        (F.col("id") % 997).alias("fk"), F.col("id").alias("rowid"))
    small = spark.createDataFrame(
        [(i * 13,) for i in range(20)], "fk long")  # keys 0..247
    return big, small


def test_join_equals_plain_join(spark):
    big, small = _sides(spark)
    got = sorted(r["rowid"] for r in
                 bloom_filtered_join(big, small, "fk").collect())
    want = sorted(r["rowid"] for r in big.join(small, "fk").collect())
    assert got == want and len(got) > 0


def test_prefilter_prunes_but_never_drops_matches(spark):
    big, small = _sides(spark)
    words = build_key_bloom(small, "fk")
    pre = bloom_prefilter(big, "fk", words)
    n_pre, n_big = pre.count(), big.count()
    n_match = big.join(small, "fk", "semi").count()
    assert n_match <= n_pre < n_big  # prunes, no false negatives
    # every true match survives
    assert pre.join(small, "fk", "semi").count() == n_match


def test_prefilter_is_scan_local(spark):
    big, small = _sides(spark)
    words = build_key_bloom(small, "fk")
    plan = (bloom_prefilter(big, "fk", words)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_tiny_bitmap_has_fps_but_exact_join_kills_them(spark):
    big, small = _sides(spark)
    got = sorted(r["rowid"] for r in
                 bloom_filtered_join(big, small, "fk",
                                     m_bits=64, k=2).collect())
    want = sorted(r["rowid"] for r in big.join(small, "fk").collect())
    assert got == want


def test_semi_and_right_shapes(spark):
    big, small = _sides(spark)
    semi = bloom_filtered_join(big, small, "fk", how="semi")
    assert semi.count() == big.join(small, "fk", "semi").count()
    right = sorted(map(tuple, bloom_filtered_join(
        big, small, "fk", how="right").collect()))
    want = sorted(map(tuple, big.join(small, "fk", "right").collect()))
    assert right == want


def test_guards(spark):
    big, small = _sides(spark)
    with pytest.raises(ValueError, match="semantics|results"):
        bloom_filtered_join(big, small, "fk", how="left")
    with pytest.raises(ValueError, match="multiple of 64"):
        build_key_bloom(small, "fk", m_bits=100)
    with pytest.raises(ValueError, match="literal-bitmap"):
        build_key_bloom(small, "fk", m_bits=1 << 21)
    with pytest.raises(ValueError, match="k must"):
        build_key_bloom(small, "fk", k=0)
    with pytest.raises(ValueError, match="words"):
        bloom_prefilter(big, "fk", [0] * 3, m_bits=256)
