"""Structured Streaming: the same window functions run as real streams
(file source, availableNow trigger) must equal their batch twins, and
the applyInPandasWithState LWW upsert must converge to the batch
lww_cell result when generations arrive in separate micro-batches."""

from __future__ import annotations

import time

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _await(q, timeout=120):
    q.awaitTermination(timeout)
    if q.isActive:
        q.stop()
        raise TimeoutError("stream did not finish")


def test_streaming_tumbling_equals_batch(spark, tmp_path):
    from sstable_hadoop_spark.queries import load
    from sstable_hadoop_spark.streaming import tumbling_counts

    events = load(spark, SF, "events")
    src = str(tmp_path / "events_stream")
    events.repartition(4).write.parquet(src)

    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = tumbling_counts(stream, "1 hour", watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("tumbling_sink")
         .outputMode("complete").trigger(availableNow=True).start())
    _await(q)

    got = {tuple(r) for r in
           spark.sql("select * from tumbling_sink").collect()}
    want = {tuple(r) for r in tumbling_counts(events, "1 hour").collect()}
    assert got == want


def test_streaming_lww_converges_to_batch(spark, tmp_path):
    """Feed the derived cell table one generation per micro-batch; the
    final winner per (key, name) must equal batch lww_cell."""
    from sstable_hadoop_spark.operators import lww_cell
    from sstable_hadoop_spark.queries import derived_cells
    from sstable_hadoop_spark.streaming import streaming_lww_cells

    cells = derived_cells(spark, SF)
    src = str(tmp_path / "cells_stream")
    # one file per generation → arrivals ordered by generation
    for g in [1, 2, 3, 4]:
        (cells.filter(F.col("generation") == g).coalesce(1)
              .write.mode("append").parquet(src))

    stream = (spark.readStream.schema(cells.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (streaming_lww_cells(stream)
         .writeStream.format("memory").queryName("lww_sink")
         .outputMode("update").trigger(availableNow=True).start())
    _await(q)

    emitted = spark.sql("select * from lww_sink").collect()
    assert emitted, "stream emitted nothing"
    # the final winner = the max-order emission per (key, name); winners
    # only ever improve, so max over emissions == last state
    rank = {"DELETED": 2, "EXPIRING": 1, "NORMAL": 0}
    final = {}
    for r in emitted:
        k = (bytes(r["key"]), bytes(r["name"]))
        key_order = (r["timestamp"], rank[r["state"]], r["generation"],
                     bytes(r["data"] or b""))
        if k not in final or key_order > final[k][0]:
            final[k] = (key_order, r)
    got = {(k[0], k[1], v[1]["state"], v[1]["timestamp"], v[1]["generation"])
           for k, v in final.items()}
    want = {(bytes(r["key"]), bytes(r["name"]), r["state"], r["timestamp"],
             r["generation"]) for r in lww_cell(cells).collect()}
    assert got == want
