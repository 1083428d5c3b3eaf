"""Streaming ingest → SSTable flush: Cassandra's memtable/flush write
path as a Structured Streaming job.

Each micro-batch is locally LWW-merged (one winner per (key, name)
within the batch — the memtable dedup) and flushed as a NEW SSTable
generation via the distributed write sink.  The on-disk directory is
then a normal multi-generation SSTable set: batch ``lww_cell`` over a
scan of it reconstructs exactly the LWW state of everything ingested —
read path and write path close the loop.

Scale notes: per-batch merge is the usual one-shuffle partial-agg
aggregation; the flush writes key-sorted files per task partition;
no state store is needed (generations carry the merge semantics, as in
Cassandra — compaction is deferred to readers or a periodic batch
rewrite with ``lww_cell`` + the sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flush_stream_to_sstables(cell_stream: DataFrame, out_dir: str,
                             checkpoint_dir: str, name: str = "flush",
                             compressed: bool = False):
    """Start the flush query (caller awaits/stops it).  ``cell_stream``
    must have the exploded cell schema (key, name, state, data,
    timestamp, ttl, expiration, generation)."""
    from sstable_hadoop_spark.operators import collect_rows, lww_cell

    def flush(batch_df: DataFrame, batch_id: int) -> None:
        winners = lww_cell(batch_df)
        # generation = batch id + 1 (generations are 1-based); newer
        # batches must win ties, matching arrival order
        rows = collect_rows(
            winners.withColumn("generation",
                               F.lit(batch_id + 1).cast("int")),
            by_generation=True)
        (rows.write.format("sstable")
             .option("path", out_dir)
             .option("name", f"{name}-{batch_id + 1}")
             .option("compressed", str(compressed).lower())
             .mode("append").save())

    return (cell_stream.writeStream
            .foreachBatch(flush)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
