"""Focused tests for the r12 optimization-round internals:

- ensure_parallelism must never EXECUTE upstream stages at
  DataFrame-build time (the df.rdd-under-AQE hidden-job bug), must
  spread tiny post-shuffle intermediates, and must not stack a second
  exchange on an already-repartitioned plan;
- the skew head-sample probe's JVM and Python paths must sample the
  same rows (same decision either way);
- minhash_dedup_pairs' profile materialization must be result-
  invariant (lazy multi-pass plan ≡ checkpointed one-pass plan).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _jobs_triggered(spark, fn):
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    out = fn()
    after = set(tracker.getJobIdsForGroup(None) or [])
    return out, len(after - before)


def test_ensure_parallelism_never_runs_jobs_at_build_time(spark, tmp_path):
    from sstable_hadoop_spark.operators._util import ensure_parallelism

    src = str(tmp_path / "docs.parquet")
    spark.range(2000).select(
        F.col("id"), (F.col("id") % 7).alias("k")).coalesce(1) \
        .write.parquet(src)
    base = spark.read.parquet(src)

    # post-shuffle plan: the old implementation ran the aggregation
    # here (AQE materializes stages to answer getNumPartitions)
    agg = base.groupBy("k").agg(F.count("*").alias("n"))
    fixed, jobs = _jobs_triggered(spark, lambda: ensure_parallelism(agg))
    assert jobs == 0, "ensure_parallelism executed upstream stages"
    # tiny input (file metadata) → the per-row-heavy chain after the
    # shuffle gets spread over the cores via one explicit repartition
    plan = fixed._jdf.queryExecution().analyzed().toString()
    assert "Repartition" in plan
    # ...and a second ensure_parallelism must NOT stack another one
    again, jobs2 = _jobs_triggered(spark, lambda: ensure_parallelism(fixed))
    assert jobs2 == 0
    assert again is fixed

    # results unchanged by the inserted exchange
    assert sorted(r["n"] for r in fixed.collect()) == \
        sorted(r["n"] for r in agg.collect())

    # leaf scan: the row-group probe path still applies (no jobs either)
    leaf, jobs3 = _jobs_triggered(spark, lambda: ensure_parallelism(base))
    assert jobs3 == 0


def test_head_sample_jvm_and_python_paths_sample_identically(spark, tmp_path):
    from sstable_hadoop_spark.operators import skew

    src = str(tmp_path / "ev.parquet")
    spark.range(5000).select(
        (F.col("id") % 37).alias("k"), F.col("id").alias("v")) \
        .coalesce(2).write.parquet(src)
    df = spark.read.parquet(src)

    old = skew._JVM_PROBE_MAX_BYTES
    try:
        skew._JVM_PROBE_MAX_BYTES = 256 * 1024 * 1024  # force JVM path
        jvm = skew._head_sample(df, ["k", "v"], 100)
        assert "mapInPandas" not in jvm._jdf.queryExecution() \
            .analyzed().toString()
        jvm_rows = sorted((r["k"], r["v"]) for r in jvm.collect())
        skew._JVM_PROBE_MAX_BYTES = 0  # force Python path
        py = skew._head_sample(df, ["k", "v"], 100)
        py_rows = sorted((r["k"], r["v"]) for r in py.collect())
    finally:
        skew._JVM_PROBE_MAX_BYTES = old
    assert jvm_rows == py_rows
    # per-partition head, not a global limit: 100 rows from each of 2
    assert len(jvm_rows) == 200


def test_skew_probe_size_gate(spark, tmp_path):
    """Inputs provably below AQE's skewed-partition threshold answer
    the skew question from metadata — zero probe jobs — and the gated
    decision can never change results (both paths exact)."""
    from sstable_hadoop_spark.operators import skew

    src = str(tmp_path / "tiny.parquet")
    spark.range(4000).select(
        F.when(F.col("id") % 2 == 0, F.lit(-1)).otherwise(F.col("id"))
         .alias("k"), F.col("id").alias("v")).coalesce(1).write.parquet(src)
    df = spark.read.parquet(src)

    # heavily skewed data, but tiny: the gate answers False, no jobs
    flagged, jobs = _jobs_triggered(
        spark, lambda: skew.detect_group_skew(df, ["k"]))
    assert jobs == 0 and flagged is False

    # the same data through the probe (gate disabled) DOES flag it —
    # the gate is a size decision, not a detection change
    old = skew._SKEW_MIN_INPUT_BYTES
    try:
        skew._SKEW_MIN_INPUT_BYTES = 0
        assert skew.detect_group_skew(df, ["k"]) is True
    finally:
        skew._SKEW_MIN_INPUT_BYTES = old

    # skew_join auto on a tiny left side: no probe jobs at build, and
    # row-identical to the plain join
    right = spark.range(50).select(F.col("id").alias("k"),
                                   (F.col("id") * 2).alias("w"))
    j, jobs2 = _jobs_triggered(
        spark, lambda: skew.skew_join(df, right, "k", "inner",
                                      hot_keys=None))
    assert jobs2 == 0
    assert sorted(map(tuple, j.collect())) == \
        sorted(map(tuple, df.join(right, "k", "inner").collect()))


def test_minhash_materialization_is_result_invariant(spark):
    from sstable_hadoop_spark.operators.dedup import minhash_dedup_pairs
    from sstable_hadoop_spark.queries import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    kw = dict(n=4, num_perm=16, bands=4, min_jaccard=0.5,
              max_doc_freq=None)
    lazy = minhash_dedup_pairs(docs, materialize_profiles=False, **kw)
    ckpt = minhash_dedup_pairs(docs, materialize_profiles=True, **kw)
    canon = lambda df: sorted(  # noqa: E731
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in df.collect())
    assert canon(lazy) == canon(ckpt)
    # r13 contract: ONLY the fixed-width signature table is
    # materialized — the banding branches read it from one RDD and the
    # 16-permutation min(md5(...)) aggregate never appears in the
    # returned plan (it ran once at build time); the corpus-scale
    # sh_set verification branch stays LAZY (parquet scans present —
    # nothing shingle-set-sized is pinned in executor storage)
    plan = ckpt._jdf.queryExecution().analyzed().toString()
    assert "ExistingRDD" in plan or "LogicalRDD" in plan
    assert "min(md5(" not in plan
    assert "parquet" in plan.lower()
    assert "collect_set" in plan
