"""Scale-path evidence: bucketed tables co-locate fact⋈fact joins —
the shuffle that dominates lineitem⋈orders at 100 TB disappears when
both sides are bucketed on the join key (PERF.md claim)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    from sstable_hadoop_spark.queries import load

    import shutil

    sf = "/root/testdata/sf0.001"
    li = load(spark, sf, "lineitem")
    o = load(spark, sf, "orders")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    # a fresh metastore doesn't know stale table dirs from prior runs —
    # remove the locations too or saveAsTable fails
    warehouse = spark.conf.get("spark.sql.warehouse.dir",
                               "spark-warehouse").replace("file:", "")
    for t in ("li_b", "o_b"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .mode("overwrite").saveAsTable("li_b"))
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .mode("overwrite").saveAsTable("o_b"))
    return "li_b", "o_b"


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    li_b, o_b = warehouse
    li = spark.table(li_b)
    o = spark.table(o_b)
    # disable broadcast so the join would otherwise need an exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (li.join(o, li.l_orderkey == o.o_orderkey)
                    .groupBy("o_orderstatus")
                    .agg(F.sum("l_quantity").alias("q")))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # both sides pre-bucketed on the key → SortMergeJoin with NO
        # shuffle exchange under it
        assert "SortMergeJoin" in plan
        join_part = plan.split("SortMergeJoin", 1)[1]
        agg_part = plan.split("SortMergeJoin", 1)[0]
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # correctness unchanged
        got = {r["o_orderstatus"]: r["q"] for r in joined.collect()}
        from sstable_hadoop_spark.queries import load

        sf = "/root/testdata/sf0.001"
        want = {r["o_orderstatus"]: r["q"]
                for r in load(spark, sf, "lineitem")
                .join(load(spark, sf, "orders"),
                      F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("o_orderstatus")
                .agg(F.sum("l_quantity").alias("q")).collect()}
        assert set(got) == set(want)
        for k in got:
            assert abs(got[k] - want[k]) < 1e-6
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
                       str(64 * 1024 * 1024))


def test_bucketed_profile_store_cuts_dedup_shuffles(spark):
    """The incremental-dedup verification join over a BUCKETED profile
    store plans strictly fewer hash exchanges than over raw profiles
    (the corpus side arrives pre-partitioned), with identical pairs."""
    import shutil

    from sstable_hadoop_spark.operators.dedup import (
        minhash_dedup_incremental,
        minhash_profiles,
        write_profile_store,
    )
    from sstable_hadoop_spark.queries import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    new = docs.filter(F.col("doc_id") % 10 == 0)
    prof = minhash_profiles(corpus, num_perm=16, max_doc_freq=None)

    spark.sql("DROP TABLE IF EXISTS prof_store")
    warehouse = spark.conf.get("spark.sql.warehouse.dir",
                               "spark-warehouse").replace("file:", "")
    shutil.rmtree(f"{warehouse}/prof_store", ignore_errors=True)
    write_profile_store(prof, "prof_store", n_buckets=8)

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        def run(store):
            df = minhash_dedup_incremental(
                new, store, num_perm=16, bands=4,
                min_jaccard=0.5, max_doc_freq=None)
            plan = df._jdf.queryExecution().executedPlan().toString()
            pairs = {(r["id_a"], r["id_b"], round(r["jaccard"], 6))
                     for r in df.collect()}
            return plan.count("Exchange hashpartitioning"), pairs

        raw_exchanges, raw_pairs = run(prof)
        b_exchanges, b_pairs = run(spark.table("prof_store"))
        assert b_pairs == raw_pairs and raw_pairs  # identical result
        assert b_exchanges < raw_exchanges, \
            f"bucketed store did not cut shuffles: {b_exchanges} vs " \
            f"{raw_exchanges}"
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
