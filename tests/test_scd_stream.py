"""Streaming SCD2 sink (streaming/scd_stream.py): the drained stream
must equal the same batches applied sequentially with scd2_apply, and
a replayed batch (crash between publish and checkpoint commit) must
leave the history content-identical."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

SCHEMA = "k long, color string, ts long"

# four micro-batches of (key, color, event-time µs as nano-longs):
# k=1 changes twice, k=2 changes then disappears (stays open),
# k=3 appears late, k=1 has an in-batch ordering race in batch 2
BATCHES = [
    [(1, "red", 1000), (2, "blue", 1100)],
    [(1, "pink", 2000), (1, "mauve", 1900)],    # latest-in-batch wins
    [(3, "green", 3000)],
    [(1, "black", 4000), (3, "green", 4100)],   # 3 unchanged
]


def _nanos(rows):
    return [(k, c, t * 1000) for k, c, t in rows]


def _stage(spark, d):
    for i, rows in enumerate(BATCHES):
        p = os.path.join(d, f"b{i}")
        spark.createDataFrame(_nanos(rows), SCHEMA) \
             .coalesce(1).write.parquet(p)
        for f in os.listdir(p):
            os.utime(os.path.join(p, f),
                     ((i + 1) * 1000, (i + 1) * 1000))
    return d


def _batch_truth(spark):
    from sstable_hadoop_spark.operators.scd import scd2_apply, scd2_init

    dim = None
    for rows in BATCHES:
        df = spark.createDataFrame(rows, SCHEMA)
        snap = (df.withColumn(
                    "_rn", F.row_number().over(
                        __import__("pyspark").sql.window.Window
                        .partitionBy("k")
                        .orderBy(F.col("ts").desc(),
                                 F.col("color").asc())))
                  .filter(F.col("_rn") == 1).drop("_rn", "ts"))
        as_of = max(t for _, _, t in rows)
        dim = (scd2_init(snap, as_of_us=as_of) if dim is None
               else scd2_apply(dim, snap, ["k"], as_of_us=as_of,
                               close_missing=False))
    return sorted(tuple(r) for r in dim.collect())


def _run_stream(spark, src, store, ckpt):
    from sstable_hadoop_spark.streaming.scd_stream import (
        upsert_stream_to_scd2,
    )

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", "1")
              .parquet(os.path.join(src, "b*")))
    q = upsert_stream_to_scd2(stream, store, ckpt, ["k"], ts_col="ts")
    try:
        q.awaitTermination()
    finally:
        q.stop()


def test_stream_equals_sequential_batch_applies(spark, tmp_path):
    from sstable_hadoop_spark.streaming.scd_stream import read_scd2_store

    src = _stage(spark, str(tmp_path / "src"))
    store = str(tmp_path / "store")
    os.makedirs(store)
    _run_stream(spark, src, store, str(tmp_path / "ckpt"))
    got = sorted(tuple(r)
                 for r in read_scd2_store(spark, store).collect())
    assert got == _batch_truth(spark)
    # spot-pin the semantics: k=1 history is red->pink->black with
    # half-open µs stamps; the in-batch race picked the later event
    k1 = [r for r in got if r[0] == 1]
    assert k1 == [(1, "black", 4100, None),
                  (1, "pink", 2000, 4100),
                  (1, "red", 1100, 2000)] or k1 == sorted(
        [(1, "red", 1100, 2000), (1, "pink", 2000, 4100),
         (1, "black", 4100, None)],
        key=lambda t: tuple((v is None, v) for v in t))


def test_replayed_batch_is_content_identical(spark, tmp_path):
    import shutil

    from sstable_hadoop_spark.streaming.scd_stream import read_scd2_store

    src = _stage(spark, str(tmp_path / "src"))
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(store)
    _run_stream(spark, src, store, ckpt)
    truth = sorted(tuple(r)
                   for r in read_scd2_store(spark, store).collect())
    # simulate a crash between publish and checkpoint commit: erase
    # the checkpoint entirely and drain again — every batch replays
    shutil.rmtree(ckpt)
    _run_stream(spark, src, store, str(tmp_path / "ckpt2"))
    again = sorted(tuple(r)
                   for r in read_scd2_store(spark, store).collect())
    assert again == truth


def test_empty_store_reader_returns_none(spark, tmp_path):
    from sstable_hadoop_spark.streaming.scd_stream import read_scd2_store

    assert read_scd2_store(spark, str(tmp_path)) is None
