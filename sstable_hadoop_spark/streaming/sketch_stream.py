"""Streaming sketch maintenance: persistent sketch stores folded
forward per micro-batch (beyond-reference surface; the streaming face
of operators/sketch.py).

The production ask is "distinct users / heavy hitters so far, live"
over an unbounded stream.  Exact state grows with cardinality; the
sketch stores here are FIXED size, and the two folds demonstrate the
two exactly-once regimes a streaming sink can be in:

  * HLL registers merge by ``max(rho)`` — IDEMPOTENT.  If the store
    publish lands but the checkpoint commit doesn't, the replayed
    batch re-merges registers the store already contains and nothing
    changes.  Exactly-once by algebra — no guard needed.
  * count-min cells merge by ``sum`` — NOT idempotent: a replayed
    batch would double-count.  The store therefore carries
    ``last_batch_id`` and the fold SKIPS any batch at-or-below it —
    the store publish and the progress watermark commit in ONE atomic
    rename, which is exactly the transactional-sink pattern
    (store + offset in one write) Structured Streaming prescribes for
    non-idempotent folds.

Store layout: ONE json blob per store dir, published with
``fs.write_bytes_atomic`` (fsync'd temp + rename), so readers —
including the next micro-batch — see the old or the new state, never
a torn file.  Both sketches are metadata-sized by construction
(2^p <= 65536 registers; depth x width <= a few 100k cells), which is
what makes a single-blob store the right shape; a sharded variant
would merge blobs with the same fold.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

_STORE = "registers.json"


def read_stored_registers(spark: SparkSession, store_dir: str, *,
                          p: int = 8) -> DataFrame:
    """The store's current register table (empty if never published).
    Refuses a store written with a different ``p`` — merging sketches
    of different width is silently wrong, not approximate."""
    from ..sources import fs

    try:
        blob = json.loads(fs.read_bytes(
            store_dir.rstrip("/") + "/" + _STORE))
    except (FileNotFoundError, OSError):
        return spark.createDataFrame([], "bucket int, rho int")
    if int(blob.get("p", -1)) != p:
        raise ValueError(
            f"register store at {store_dir} was built with "
            f"p={blob.get('p')}, asked for p={p}")
    return spark.createDataFrame(
        [(int(b), int(r)) for b, r in blob["registers"]],
        "bucket int, rho int")


def _publish_registers(regs: DataFrame, store_dir: str, *,
                       p: int) -> None:
    from ..sources import fs

    rows = [(r["bucket"], r["rho"]) for r in regs.collect()]
    fs.write_bytes_atomic(
        store_dir.rstrip("/") + "/" + _STORE,
        json.dumps({"p": p, "registers": sorted(rows)}).encode())


def hll_stream_to_registers(stream: DataFrame, col: str,
                            store_dir: str, checkpoint_dir: str, *,
                            p: int = 8):
    """Fold a stream's micro-batches into the persistent register
    store: per batch, ``hll_build(batch)`` (one bucket-keyed exchange,
    <= 2^p rows out) merged into the stored table with ``max(rho)``
    and republished atomically.  The collect is the register table
    itself — metadata-sized by construction, never batch data.

    Crash/replay safety is the merge's idempotence (see module
    docstring); a batch applied twice produces the identical store.
    """
    from sstable_hadoop_spark.operators.sketch import (
        _check_hll_p,
        hll_build,
        hll_merge,
    )

    _check_hll_p(p)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        regs = hll_build(batch_df, col, p=p)
        prev = read_stored_registers(spark, store_dir, p=p)
        _publish_registers(hll_merge(prev, regs), store_dir, p=p)

    return (stream.writeStream
            .foreachBatch(fold)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


_CMS_STORE = "cms_cells.json"


def read_stored_cms(spark: SparkSession, store_dir: str, *,
                    depth: int = 4, width: int = 1 << 12):
    """The store's current ``(cells DataFrame, last_batch_id)`` —
    ``(empty, -1)`` if never published.  Refuses a store written with
    different ``(depth, width)``: summing cells of differently-shaped
    sketches is silently wrong, not approximate."""
    from ..sources import fs

    try:
        blob = json.loads(fs.read_bytes(
            store_dir.rstrip("/") + "/" + _CMS_STORE))
    except (FileNotFoundError, OSError):
        return (spark.createDataFrame([], "row int, pos long, c long"),
                -1)
    if (int(blob.get("depth", -1)), int(blob.get("width", -1))) \
            != (depth, width):
        raise ValueError(
            f"count-min store at {store_dir} was built with "
            f"depth={blob.get('depth')} width={blob.get('width')}, "
            f"asked for depth={depth} width={width}")
    cells = spark.createDataFrame(
        [(int(r), int(p), int(c)) for r, p, c in blob["cells"]],
        "row int, pos long, c long")
    return cells, int(blob["last_batch_id"])


def _publish_cms(cells: DataFrame, store_dir: str, *, depth: int,
                 width: int, batch_id: int) -> None:
    from ..sources import fs

    rows = [(r["row"], r["pos"], r["c"]) for r in cells.collect()]
    fs.write_bytes_atomic(
        store_dir.rstrip("/") + "/" + _CMS_STORE,
        json.dumps({"depth": depth, "width": width,
                    "last_batch_id": batch_id,
                    "cells": sorted(rows)}).encode())


def cms_stream_to_store(stream: DataFrame, store_dir: str,
                        checkpoint_dir: str, *,
                        text_col: str = "text",
                        token_col: str | None = None,
                        depth: int = 4, width: int = 1 << 12):
    """Fold a stream's micro-batches into a persistent count-min
    store: per batch, ``cms_build(batch)`` (one exchange, <= depth x
    width cells out) SUMMED into the stored cells and republished
    atomically together with ``last_batch_id = batch_id``.

    The sum fold is NOT idempotent, so crash/replay safety comes from
    the watermark, not the algebra: a replayed batch (its id <= the
    stored ``last_batch_id``) is skipped entirely — the cells it
    contributed are already in the blob the same rename published.
    Batch ids from Structured Streaming are strictly increasing, so
    one integer is a complete applied-set summary.
    """
    from sstable_hadoop_spark.operators.sketch import (
        _check_params,
        cms_build,
        cms_merge,
    )

    _check_params(depth, width)

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev, last = read_stored_cms(spark, store_dir,
                                     depth=depth, width=width)
        if batch_id <= last:
            return  # replay of an already-published batch
        batch = cms_build(batch_df, text_col, token_col=token_col,
                          depth=depth, width=width)
        _publish_cms(cms_merge(prev, batch), store_dir,
                     depth=depth, width=width, batch_id=batch_id)

    return (stream.writeStream
            .foreachBatch(fold)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
