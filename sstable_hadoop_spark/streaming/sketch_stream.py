"""Streaming sketch maintenance: a persistent HyperLogLog register
store folded forward per micro-batch (beyond-reference surface; the
streaming face of operators/sketch.py).

The production ask is "distinct users so far, live" over an unbounded
stream.  Exact distinct state grows with cardinality; the HLL register
table is FIXED size (2^p rows) and its merge is ``max(rho)`` —
IDEMPOTENT, which is the whole crash story: if the store publish
lands but the checkpoint commit doesn't, the replayed batch re-merges
the same registers into a store that already contains them and
nothing changes.  Exactly-once by algebra — no transaction log, no
dedup pass, no recovery step.

Store layout: ONE json blob (``registers.json``) per store dir,
published with ``fs.write_bytes_atomic`` (fsync'd temp + rename), so
readers — including the next micro-batch — see the old or the new
registers, never a torn file.  Registers are metadata-sized by
construction (2^p <= 65536 rows), which is what makes a single-blob
store the right shape; a sharded-sketch variant would merge blobs
with the same max(rho) fold.
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
