"""Focused pins for the r13 optimization round's operator internals."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _mk_parquet(spark, tmp_path, n=1000, name="t"):
    p = str(tmp_path / name)
    (spark.range(n).select(F.col("id"), (F.col("id") % 7).alias("k"))
     .coalesce(1).write.mode("overwrite").parquet(p))
    return spark.read.parquet(p)


def test_rows_per_slot_caps_tiny_fanout(spark, tmp_path):
    """A light-per-row call site caps the repartition width at
    ceil(rows / rows_per_slot): tiny inputs stop fanning to every
    core, while large inputs (rows >> slot * target) keep the full
    target width — the cap is scale-adaptive, not local-tuned."""
    from sstable_hadoop_spark.operators._util import ensure_parallelism

    df = _mk_parquet(spark, tmp_path, n=1000)
    assert df.rdd.getNumPartitions() == 1

    # 1000 rows / 100 rows-per-slot = 10 < target 16
    out = ensure_parallelism(df, min_partitions=16, rows_per_slot=100)
    assert out.rdd.getNumPartitions() == 10

    # heavy rows (slot=1): the cap is far above the target — full width
    out = ensure_parallelism(df, min_partitions=16, rows_per_slot=1)
    assert out.rdd.getNumPartitions() == 16

    # no hint: unchanged r12 behavior (full target width)
    out = ensure_parallelism(df, min_partitions=16)
    assert out.rdd.getNumPartitions() == 16

    # never below 2, even for a handful of rows
    tiny = _mk_parquet(spark, tmp_path, n=3, name="tiny")
    out = ensure_parallelism(tiny, min_partitions=16, rows_per_slot=100)
    assert out.rdd.getNumPartitions() == 2


def test_rows_per_slot_post_shuffle_branch(spark, tmp_path):
    """The post-shuffle tiny-input repartition honors the cap too (the
    corpus chains run per-row work after a dedup exchange)."""
    from sstable_hadoop_spark.operators._util import ensure_parallelism

    df = _mk_parquet(spark, tmp_path, n=1000, name="ps")
    agg = df.groupBy("k").agg(F.count("*").alias("n"))
    out = ensure_parallelism(agg, min_partitions=16, rows_per_slot=100)
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "Repartition" in plan
    assert out.rdd.getNumPartitions() == 10


def test_shuffle_node_matching_is_line_anchored(spark):
    """ADVICE r12: node names match at plan-line starts only — a
    CamelCase COLUMN name like SortKey/WindowStart must not route a
    leaf scan into the post-shuffle branch, and SQL DISTINCT (analyzed
    plan node ``Distinct``) must be seen as a shuffle."""
    from sstable_hadoop_spark.operators._util import _has_shuffle_below

    leaf = spark.range(10).select(
        F.col("id").alias("SortKey"),
        F.col("id").alias("WindowStart"),
        F.col("id").alias("JoinDate"),
        F.col("id").alias("AggregateRoot"))
    assert _has_shuffle_below(leaf) is False

    leaf.createOrReplaceTempView("r13_leaf_v")
    distinct_sql = spark.sql("SELECT DISTINCT SortKey FROM r13_leaf_v")
    assert _has_shuffle_below(distinct_sql) is True

    assert _has_shuffle_below(spark.range(10).groupBy("id").count()) is True


def test_minhash_checkpoint_is_fixed_width_only(spark):
    """The r13 dedup restructure: what gets materialized at build time
    is the signature table only — sh_set (corpus-scale) must never be
    a column of any checkpointed RDD in the returned plan."""
    from sstable_hadoop_spark.operators.dedup import minhash_dedup_pairs
    from sstable_hadoop_spark.queries import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    out = minhash_dedup_pairs(docs, n=4, num_perm=16, bands=4,
                              min_jaccard=0.5, max_doc_freq=None)
    plan = out._jdf.queryExecution().analyzed().toString()
    import re
    for rdd_scan in re.finditer(r"LogicalRDD \[([^\]]*)\]", plan):
        assert "sh_set" not in rdd_scan.group(1)


def test_head_sample_jvm_path_requires_scan_shape(spark, tmp_path):
    """ADVICE r12: the JVM head-sample's size bound is on leaf FILE
    bytes, so a row-expanding plan below (explode) must fall back to
    the early-stopping mapInPandas path; a plain scan keeps the
    codegen path (no Python nodes in the plan)."""
    from sstable_hadoop_spark.operators.skew import _head_sample

    df = _mk_parquet(spark, tmp_path, n=200, name="hs")
    plain = _head_sample(df, ["k"], 5)
    plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "MapInPandas" not in plan

    exploded = df.select(F.explode(F.array_repeat(F.col("k"), 3))
                         .alias("k"))
    ex = _head_sample(exploded, ["k"], 5)
    plan_ex = ex._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan_ex or "EvalPython" in plan_ex
