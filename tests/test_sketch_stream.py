"""Streaming HLL register store (streaming/sketch_stream.py): the
stream-maintained store must equal the batch sketch over the same
rows, replaying a batch must be a no-op (the crash story — publish
landed, checkpoint commit didn't), and a store written with a
different ``p`` must be refused, not merged."""

from __future__ import annotations

import json
import os

import pytest

from sstable_hadoop_spark.operators.sketch import (
    hll_build,
    hll_estimate,
)
from sstable_hadoop_spark.streaming.sketch_stream import (
    hll_stream_to_registers,
    read_stored_registers,
)

P = 6


def _regs_dict(df):
    return {r["bucket"]: r["rho"] for r in df.collect()}


def _events(spark, n=400):
    # ids with repeats across chunk boundaries so batches overlap
    rows = [(i % 157, f"u{i % 61}") for i in range(n)]
    return spark.createDataFrame(rows, "event_id int, user string")


def _run_stream(spark, src_dir, store, ckpt):
    schema = "event_id int, user string"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(src_dir))
    q = hll_stream_to_registers(stream, "event_id", store, ckpt, p=P)
    try:
        q.awaitTermination()
    finally:
        q.stop()


def test_stream_store_equals_batch_sketch(spark, tmp_path):
    src = str(tmp_path / "src")
    events = _events(spark)
    # 3 files -> 3 micro-batches under maxFilesPerTrigger=1
    for i in range(3):
        (events.filter(events.event_id % 3 == i).coalesce(1)
               .write.mode("overwrite").parquet(f"{src}/c{i}"))
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    os.makedirs(store)
    _run_stream(spark, f"{src}/c*", store, ckpt)

    got = _regs_dict(read_stored_registers(spark, store, p=P))
    want = _regs_dict(hll_build(events, "event_id", p=P))
    assert got == want
    est = hll_estimate(read_stored_registers(spark, store, p=P),
                       p=P).collect()[0]["est_distinct"]
    assert est > 0


def test_replayed_batch_is_noop(spark, tmp_path):
    """Crash between store publish and checkpoint commit: the batch
    replays against a store that already contains it. max(rho) is
    idempotent, so the registers — and the estimate — cannot move."""
    store = str(tmp_path / "store")
    os.makedirs(store)
    batch = _events(spark, 200)

    from sstable_hadoop_spark.streaming import sketch_stream as ss

    # apply the same batch twice through the module's own fold path
    for _ in range(2):
        regs = hll_build(batch, "event_id", p=P)
        prev = read_stored_registers(spark, store, p=P)
        from sstable_hadoop_spark.operators.sketch import hll_merge
        ss._publish_registers(hll_merge(prev, regs), store, p=P)

    got = _regs_dict(read_stored_registers(spark, store, p=P))
    want = _regs_dict(hll_build(batch, "event_id", p=P))
    assert got == want


def test_store_p_mismatch_refused(spark, tmp_path):
    store = str(tmp_path / "store")
    os.makedirs(store)
    with open(os.path.join(store, "registers.json"), "w") as f:
        json.dump({"p": P + 1, "registers": [[0, 3]]}, f)
    with pytest.raises(ValueError, match="p="):
        read_stored_registers(spark, store, p=P)


def test_empty_store_reads_empty(spark, tmp_path):
    df = read_stored_registers(spark, str(tmp_path / "nowhere"), p=P)
    assert df.count() == 0
    assert df.columns == ["bucket", "rho"]


# --- streaming count-min store (non-idempotent fold, batch-id guard) ----


def _run_cms_stream(spark, src_glob, store, ckpt):
    from sstable_hadoop_spark.streaming.sketch_stream import (
        cms_stream_to_store,
    )

    schema = "event_id int, user string"
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(src_glob))
    q = cms_stream_to_store(stream, store, ckpt, token_col="user",
                            depth=3, width=32)
    try:
        q.awaitTermination()
    finally:
        q.stop()


def test_cms_stream_store_equals_batch_sketch(spark, tmp_path):
    from sstable_hadoop_spark.operators.sketch import cms_build
    from sstable_hadoop_spark.streaming.sketch_stream import (
        read_stored_cms,
    )

    src = str(tmp_path / "src")
    events = _events(spark)
    for i in range(3):
        (events.filter(events.event_id % 3 == i).coalesce(1)
               .write.mode("overwrite").parquet(f"{src}/c{i}"))
    store, ckpt = str(tmp_path / "store"), str(tmp_path / "ckpt")
    os.makedirs(store)
    _run_cms_stream(spark, f"{src}/c*", store, ckpt)

    cells, last = read_stored_cms(spark, store, depth=3, width=32)
    got = {(r["row"], r["pos"]): r["c"] for r in cells.collect()}
    want = {(r["row"], r["pos"]): r["c"]
            for r in cms_build(events, token_col="user",
                               depth=3, width=32).collect()}
    assert got == want
    assert last == 2  # 3 micro-batches: ids 0, 1, 2


def test_cms_stream_replay_with_fresh_checkpoint_is_skipped(
        spark, tmp_path):
    """Replay story for the NON-idempotent fold: re-running the same
    source against the SAME store with a fresh checkpoint restarts
    batch ids at 0 — every batch is at-or-below the stored
    last_batch_id and must be skipped, or the sum would double-count.
    The store bytes must come out identical."""
    import json as _json

    from sstable_hadoop_spark.streaming.sketch_stream import _CMS_STORE

    src = str(tmp_path / "src")
    events = _events(spark, 150)
    for i in range(2):
        (events.filter(events.event_id % 2 == i).coalesce(1)
               .write.mode("overwrite").parquet(f"{src}/c{i}"))
    store = str(tmp_path / "store")
    os.makedirs(store)
    _run_cms_stream(spark, f"{src}/c*", store, str(tmp_path / "ck1"))
    with open(os.path.join(store, _CMS_STORE)) as f:
        blob1 = _json.load(f)

    _run_cms_stream(spark, f"{src}/c*", store, str(tmp_path / "ck2"))
    with open(os.path.join(store, _CMS_STORE)) as f:
        blob2 = _json.load(f)
    assert blob1 == blob2  # replayed batches were skipped, not summed


def test_cms_store_shape_mismatch_refused(spark, tmp_path):
    import json as _json

    from sstable_hadoop_spark.streaming.sketch_stream import (
        _CMS_STORE,
        read_stored_cms,
    )

    store = str(tmp_path / "store")
    os.makedirs(store)
    with open(os.path.join(store, _CMS_STORE), "w") as f:
        _json.dump({"depth": 4, "width": 64, "last_batch_id": 0,
                    "cells": []}, f)
    with pytest.raises(ValueError, match="depth"):
        read_stored_cms(spark, store, depth=3, width=32)


def test_cms_empty_store_reads_empty(spark, tmp_path):
    from sstable_hadoop_spark.streaming.sketch_stream import (
        read_stored_cms,
    )

    cells, last = read_stored_cms(spark, str(tmp_path / "nowhere"))
    assert cells.count() == 0
    assert last == -1
