"""Streaming SCD2 maintenance: a type-2 dimension folded forward per
micro-batch (the streaming face of operators/scd.py — beyond-reference
surface, SURVEY.md §2.8).

Each micro-batch carries changed entity rows (a CDC tail or an upsert
feed): the fold reduces the batch to ONE snapshot row per key (latest
by the event-time column, deterministic tie-break on the key), stamps
the apply at the batch's max event time (derived from the DATA, never
the wall clock — replays stamp identically), and applies it with
``close_missing=False`` (a key absent from a batch is simply
unchanged, the partial-feed semantics).

Exactly-once: SCD2 application is ORDER-SENSITIVE (an old snapshot
applied over a newer head would close rows backwards), so the store
carries its head's ``as_of_us`` as an EVENT-TIME WATERMARK and the
fold SKIPS any batch whose stamp is strictly older — a replayed
history (crash recovery, wiped checkpoint) drains without touching
the store.  A batch replayed at exactly the head stamp (the crash-
between-publish-and-checkpoint case) re-applies idempotently:
unchanged rows pass through untouched and the stamp re-derives
equal, so the re-publish is content-identical.  The sink's contract
is therefore that batch max event times are NON-DECREASING across
batches (any ordered feed; the file stream's oldest-first default).

Store layout: the dimension is DATA-sized, so it lives as parquet
under ``dim-v{batch_id}`` directories with a tiny ``head.json``
pointer published via ``fs.write_bytes_atomic`` — a reader (including
the next micro-batch) sees the old or the new dimension, never a torn
one.  Superseded dimension dirs older than the previous head are
removed after each publish.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_HEAD = "head.json"


def read_scd2_store(spark: SparkSession, store_dir: str) -> DataFrame | None:
    """The stream-maintained dimension at its current head, or None
    when nothing has been published yet."""
    from ..sources import fs

    try:
        head = json.loads(fs.read_bytes(
            store_dir.rstrip("/") + "/" + _HEAD))
    except (FileNotFoundError, OSError):
        return None
    return spark.read.parquet(
        os.path.join(store_dir, head["dim"]))


def upsert_stream_to_scd2(stream: DataFrame, store_dir: str,
                          checkpoint_dir: str, key_cols: list[str],
                          ts_col: str = "ts"):
    """foreachBatch sink maintaining an SCD2 dimension from a change
    stream.  ``stream`` rows are entity states: key columns + tracked
    attribute columns + ``ts_col`` (event time; nano-epoch longs and
    timestamps both accepted).  Returns the started query
    (``availableNow`` trigger)."""
    from ..operators.scd import scd2_apply, scd2_init
    from ..queries import ts_us
    from ..sources import fs

    spark = stream.sparkSession

    def fold(batch: DataFrame, batch_id: int) -> None:
        rows = batch.withColumn("_ts_us", ts_us(batch, ts_col)) \
                    .drop(ts_col)
        as_of = rows.agg(F.max("_ts_us")).collect()[0][0]
        if as_of is None:  # empty (or all-null-time) batch
            return
        head = None
        try:
            head = json.loads(fs.read_bytes(
                os.path.join(store_dir, _HEAD)))
        except (FileNotFoundError, OSError, ValueError):
            pass
        if head is not None and int(as_of) < int(head["as_of_us"]):
            return  # stale replay: already folded past this stamp
        # one snapshot row per key: latest by event time, key-ordered
        # deterministic tie-break
        w = [F.col("_ts_us").desc()] + \
            [F.col(k).asc() for k in rows.columns
             if k not in key_cols and k != "_ts_us"]
        snap = (rows.withColumn(
                    "_rn", F.row_number().over(
                        Window.partitionBy(*key_cols).orderBy(*w)))
                    .filter(F.col("_rn") == 1)
                    .drop("_rn", "_ts_us"))
        prev = read_scd2_store(spark, store_dir)
        dim = (scd2_init(snap, as_of_us=int(as_of)) if prev is None
               else scd2_apply(prev, snap, key_cols,
                               as_of_us=int(as_of),
                               close_missing=False))
        import uuid

        # unique dir per publish: a same-stamp replay must never
        # overwrite the directory its own input is being read from
        name = f"dim-v{batch_id}-{uuid.uuid4().hex[:8]}"
        dim.write.mode("overwrite").parquet(
            os.path.join(store_dir, name))
        old = head["dim"] if head else None
        fs.write_bytes_atomic(
            os.path.join(store_dir, _HEAD),
            json.dumps({"dim": name, "batch_id": batch_id,
                        "as_of_us": int(as_of)}).encode())
        # sweep dirs older than the PREVIOUS head (kept for readers
        # that resolved the old pointer just before the swap)
        import shutil

        for d in os.listdir(store_dir):
            if d.startswith("dim-v") and d not in (name, old):
                shutil.rmtree(os.path.join(store_dir, d),
                              ignore_errors=True)

    return (stream.writeStream.foreachBatch(fold)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True).start())
