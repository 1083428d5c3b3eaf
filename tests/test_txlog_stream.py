"""Streaming SOURCE over transaction-log tables
(sources/txlog_stream.py): version offsets, op-aware batch planning
(data-identical commits invisible, changing commits refused or
Delta-style ignored), checkpoint restarts, backpressure."""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 10).alias("g"))


def _drain(spark, path, out, ckpt, **opts):
    from sstable_hadoop_spark.sources.datasource import register

    register(spark)
    r = spark.readStream.format("txlog")
    for k, v in opts.items():
        r = r.option(k, v)
    q = (r.load(path)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    assert not q.isActive


def test_txlog_stream_appends_and_identical_ops(spark, tmp_path):
    """The whole table is the first batch; appends stream in on
    restart; compact (data-identical) emits NOTHING — no
    ignoreChanges dance, the log knows the op; _commit_version tags
    provenance."""
    from sstable_hadoop_spark.operators import txlog as tx

    p, out, ck = (str(tmp_path / d) for d in ("t", "out", "ck"))
    tx.txlog_create(spark, p, _mk(spark, 0, 500), ("k",), 4)
    tx.txlog_append(spark, p, _mk(spark, 500, 600))
    _drain(spark, p, out, ck, with_version="true")
    r = spark.read.parquet(out)
    assert r.count() == 600
    assert sorted(x[0] for x in
                  r.select("_commit_version").distinct().collect()) \
        == [1, 2]
    # compact + zorder change bytes, not rows → invisible to the feed
    tx.txlog_compact(spark, p, min_files=1)
    tx.txlog_zorder(spark, p, ("k", "g"), files_per_bucket=2,
                    bits=4)
    tx.txlog_append(spark, p, _mk(spark, 600, 650))
    _drain(spark, p, out, ck, with_version="true")
    r = spark.read.parquet(out)
    assert r.count() == 650
    assert sorted(x[0] for x in
                  r.select("_commit_version").distinct().collect()) \
        == [1, 2, 5]
    # streamed rows == the table (no dupes, no losses)
    got = sorted((x["k"], x["g"]) for x in
                 r.select("k", "g").collect())
    want = sorted(tuple(x) for x in
                  tx.txlog_read(spark, p).collect())
    assert got == want


def test_txlog_stream_refuses_changes_and_deletes(spark, tmp_path):
    """upsert/delete_dv commits cannot ride an insert feed: the query
    fails with a pointed message; ignore_deletes skips deletions;
    ignore_changes re-emits rewritten files (Delta semantics)."""
    from sstable_hadoop_spark.operators import txlog as tx

    p, out, ck = (str(tmp_path / d) for d in ("t", "out", "ck"))
    tx.txlog_create(spark, p, _mk(spark, 0, 200), ("k",), 2)
    _drain(spark, p, out, ck)
    tx.txlog_delete_rows(spark, p, "k = 7")
    with pytest.raises(Exception, match="ignore_deletes"):
        _drain(spark, p, out, ck)
    _drain(spark, p, out, ck, ignore_deletes="true")
    assert spark.read.parquet(out).count() == 200  # nothing retracted

    def merge(stored, delta):
        return (stored.join(delta, on=["k"], how="left_anti")
                .select(*stored.columns).unionByName(delta))
    tx.txlog_upsert(spark, p, _mk(spark, 0, 3), merge, ("k",), 2)
    with pytest.raises(Exception, match="ignore_changes"):
        _drain(spark, p, out, ck, ignore_deletes="true")
    _drain(spark, p, out, ck, ignore_changes="true")
    # the rewritten buckets re-emit: duplicates by design, documented
    assert spark.read.parquet(out).count() > 200


def test_txlog_stream_tail_and_backpressure(spark, tmp_path):
    """starting_version=latest tails only post-start commits;
    max_versions_per_trigger splits a backlog across micro-batches
    (first restart trigger uncapped by the coverage rule)."""
    from sstable_hadoop_spark.operators import txlog as tx
    from sstable_hadoop_spark.sources.txlog_stream import (
        TxlogFeedStreamReader,
    )

    p, out, ck = (str(tmp_path / d) for d in ("t", "out", "ck"))
    tx.txlog_create(spark, p, _mk(spark, 0, 100), ("k",), 2)
    _drain(spark, p, out, ck, starting_version="latest")
    assert not shutil.os.path.exists(out) \
        or spark.read.parquet(out).count() == 0
    tx.txlog_append(spark, p, _mk(spark, 100, 120))
    _drain(spark, p, out, ck, starting_version="latest")
    assert spark.read.parquet(out).count() == 20

    # unit-level: capping advances one window at a time, never
    # regressing, uncapped on the first post-restart trigger
    rd = TxlogFeedStreamReader(
        {"path": p, "max_versions_per_trigger": "1"}, None)
    assert rd.latestOffset() == {"version": 2}  # restart: uncapped
    tx.txlog_append(spark, p, _mk(spark, 120, 130))
    tx.txlog_append(spark, p, _mk(spark, 130, 140))
    assert rd.latestOffset() == {"version": 3}  # capped: +1
    assert rd.latestOffset() == {"version": 4}
    assert rd.latestOffset() == {"version": 4}  # at head: no regress


def test_txlog_stream_vacuumed_file_fails_loudly(spark, tmp_path):
    from sstable_hadoop_spark.operators import txlog as tx
    from sstable_hadoop_spark.sources.txlog_stream import (
        TxlogFeedPartition,
        TxlogFeedStreamReader,
    )

    p = str(tmp_path / "t")
    tx.txlog_create(spark, p, _mk(spark, 0, 10), ("k",), 2)
    rd = TxlogFeedStreamReader({"path": p},
                               tx.txlog_read(spark, p).schema)
    part = TxlogFeedPartition(str(tmp_path / "t" / "gone.parquet"), 1)
    with pytest.raises(FileNotFoundError, match="vacuum retention"):
        list(rd.read(part))


def test_txlog_stream_batch_read_points_at_txlog_read(spark,
                                                      tmp_path):
    from sstable_hadoop_spark.operators import txlog as tx
    from sstable_hadoop_spark.sources.datasource import register

    p = str(tmp_path / "t")
    tx.txlog_create(spark, p, _mk(spark, 0, 10), ("k",), 2)
    register(spark)
    with pytest.raises(Exception, match="txlog_read"):
        spark.read.format("txlog").load(p).collect()


def test_txlog_to_txlog_medallion_hop(spark, tmp_path):
    """bronze → silver as one streaming pipeline: the txlog SOURCE
    feeds the exactly-once txlog append SINK.  Appends to bronze flow
    through a transform into silver; a full replay from a fresh
    checkpoint changes nothing (source offsets are versions, sink
    appends are txn-tagged)."""
    from sstable_hadoop_spark.operators import txlog as tx
    from sstable_hadoop_spark.sources.datasource import register
    from sstable_hadoop_spark.streaming.compaction import (
        append_stream_to_txlog,
    )

    register(spark)
    bronze, silver = str(tmp_path / "bronze"), str(tmp_path / "silver")
    ck = str(tmp_path / "ck")

    tx.txlog_create(spark, bronze, _mk(spark, 0, 300), ("k",), 2)
    tx.txlog_append(spark, bronze, _mk(spark, 300, 400))

    def hop(ckpt):
        src = (spark.readStream.format("txlog").load(bronze)
               .withColumn("v2", F.col("k") * 2))
        q = append_stream_to_txlog(
            src, silver, ckpt, bucket_by=("k",), n_buckets=2,
            txn_app="medallion")
        q.awaitTermination(180)
        assert not q.isActive

    hop(ck)
    want = sorted((r["k"], r["g"], 2 * r["k"]) for r in
                  tx.txlog_read(spark, bronze).collect())
    assert sorted(tuple(r) for r in
                  tx.txlog_read(spark, silver).collect()) == want

    # more bronze appends flow through incrementally
    tx.txlog_append(spark, bronze, _mk(spark, 400, 450))
    hop(ck)
    assert tx.txlog_count(silver) == 450

    # fresh-checkpoint replay: txn tags make the sink a no-op
    v_before = tx.txlog_snapshot(silver)["version"]
    hop(str(tmp_path / "ck2"))
    assert tx.txlog_count(silver) == 450
    assert tx.txlog_snapshot(silver)["version"] == v_before


def test_txlog_stream_survives_mid_stream_rename(spark, tmp_path):
    """A rename commit is row-invisible; a RESTARTED stream adopts
    the current logical schema while reading files by their stable
    PHYSICAL names — rows before and after the rename both stream
    with correct values (old-name batches under the old run, new
    name after the restart, Delta restart semantics)."""
    from sstable_hadoop_spark.operators import txlog as tx

    p, out, ck = (str(tmp_path / d) for d in ("t", "out", "ck"))
    tx.txlog_create(spark, p, _mk(spark, 0, 50), ("k",), 2)
    _drain(spark, p, out, ck)
    tx.txlog_rename_column(p, "g", "grp")
    delta = (spark.range(50, 60)
             .select(F.col("id").alias("k"),
                     (F.col("id") % 10).alias("grp")))
    tx.txlog_append(spark, p, delta)
    _drain(spark, p, out, ck)  # restart: schema is now (k, grp)
    r = spark.read.option("mergeSchema", "true").parquet(out)
    assert r.count() == 60
    assert sorted(x["k"] for x in r.collect()) == list(range(60))
    # pre-rename batches carried g, post-restart batches grp — the
    # VALUES are right in both eras (physical reads never drifted)
    assert r.filter("k < 50 and g = k % 10").count() == 50
    assert r.filter("k >= 50 and grp = k % 10").count() == 10


def test_delete_stream_applies_dvs_idempotently(spark, tmp_path):
    """The streaming DELETE sink erases keyed rows as deletion
    vectors per micro-batch; a full replay from a fresh checkpoint
    journals NOTHING new (vectors are naturally idempotent)."""
    from sstable_hadoop_spark.operators import txlog as tx
    from sstable_hadoop_spark.streaming.compaction import (
        delete_stream_to_txlog,
    )

    p = str(tmp_path / "t")
    tx.txlog_create(spark, p, _mk(spark, 0, 300), ("k",), 2)
    src = str(tmp_path / "dels")
    (spark.range(0, 20).select(F.col("id").alias("k"))
     .coalesce(1).write.parquet(src))

    def run(ck):
        q = delete_stream_to_txlog(
            spark.readStream.schema("k bigint").parquet(src),
            p, str(tmp_path / ck), key_cols=["k"])
        q.awaitTermination(120)
        assert not q.isActive

    run("ck1")
    assert tx.txlog_count(p) == 280
    assert tx.txlog_read(spark, p).filter("k < 20").count() == 0
    v = tx.txlog_snapshot(p)["version"]
    run("ck2")  # fresh-checkpoint replay: no new commit
    assert tx.txlog_snapshot(p)["version"] == v
    assert tx.txlog_count(p) == 280


def test_delete_stream_composite_keys(spark, tmp_path):
    from sstable_hadoop_spark.operators import txlog as tx
    from sstable_hadoop_spark.streaming.compaction import (
        delete_stream_to_txlog,
    )

    p = str(tmp_path / "t")
    tx.txlog_create(spark, p, _mk(spark, 0, 100), ("k",), 2)
    src = str(tmp_path / "dels")
    # exact tuples (k, g): (5, 5) matches, (6, 5) must NOT erase k=6
    (spark.createDataFrame([(5, 5), (6, 5)], "k bigint, g bigint")
     .coalesce(1).write.parquet(src))
    q = delete_stream_to_txlog(
        spark.readStream.schema("k bigint, g bigint").parquet(src),
        p, str(tmp_path / "ck"), key_cols=["k", "g"])
    q.awaitTermination(120)
    left = {r["k"] for r in tx.txlog_read(spark, p).collect()}
    assert 5 not in left and 6 in left
    assert tx.txlog_count(p) == 99


def test_stream_of_cloned_dv_table_applies_vectors(spark, tmp_path):
    """ADVICE r11: a clone commit journals the source's deletion
    vectors on the files it adds — streaming the clone must SUBTRACT
    those positions (executor-side, from the commit's journal entry),
    never silently resurrect the deleted rows, and without any
    ignore_deletes opt-in (the feed emits only live rows; nothing is
    being retracted)."""
    from sstable_hadoop_spark.operators import txlog as tx

    src, dst, out, ck = (str(tmp_path / d)
                         for d in ("src", "dst", "out", "ck"))
    tx.txlog_create(spark, src, _mk(spark, 0, 400), ("k",), 2)
    tx.txlog_delete_rows(spark, src, "g = 3")
    tx.txlog_clone(spark, src, dst)
    _drain(spark, dst, out, ck)
    got = sorted((x["k"], x["g"]) for x in
                 spark.read.parquet(out).collect())
    want = sorted(tuple(x) for x in
                  tx.txlog_read(spark, dst).collect())
    assert got == want
    assert not [r for r in got if r[1] == 3]
    assert len(got) == 360
