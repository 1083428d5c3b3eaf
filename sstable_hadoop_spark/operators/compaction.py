"""Batch compaction — Cassandra's major compaction as one Spark job:
read every generation in a directory, per-cell LWW merge, write a
single merged generation.

The reference implements exactly this pipeline as a MapReduce job
(ReadSSTableWithoutSplits.scala:14-33: whole-file scan →
MsgPackSSTableDataReducer merge → text output); here the output is a
real SSTable generation readable by the same source, so compaction
composes with everything else.

GC semantics (optional, like Cassandra's gc_grace + TTL purge):
- ``gc_before_ms``: DELETED winners with timestamp older than this
  (µs-compared against ms×1000) are dropped entirely — the tombstone
  has shadowed everything it needed to and can be purged;
- expired EXPIRING winners (expiration ≤ gc_before_ms) are dropped.
Newer tombstones are RETAINED (they must keep shadowing older
generations that might still exist elsewhere).

Scale notes: one shuffle (the LWW hash-agg with map-side combine) +
one shuffle to key-range-partition the output so each task writes a
key-sorted, non-overlapping file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lww import collect_rows, explode_cells, lww_cell


def compact(spark: SparkSession, in_dir: str, out_dir: str,
            generation: int | None = None,
            gc_before_ms: int | None = None,
            target_partitions: int | None = None,
            compressed: bool = False) -> DataFrame:
    """Compact ``in_dir`` (all generations) into one merged generation
    at ``out_dir``.  Returns the merged-cell DataFrame (lazy reuse).

    ``generation`` defaults to max(input generations) + 1 so the
    compacted file wins any future tie against its inputs.
    """
    from sstable_hadoop_spark.sources.datasource import register

    register(spark)
    rows = spark.read.format("sstable").load(in_dir)
    if generation is None:
        generation = (rows.agg(F.max("generation")).collect()[0][0] or 0) + 1
    winners = lww_cell(explode_cells(rows))

    if gc_before_ms is not None:
        gc_us = gc_before_ms * 1000
        winners = winners.filter(~(
            ((F.col("state") == "DELETED") & (F.col("timestamp") < gc_us))
            | ((F.col("state") == "EXPIRING")
               & F.col("expiration").isNotNull()
               & (F.col("expiration") <= gc_before_ms))))

    merged = winners.withColumn("generation",
                                F.lit(generation).cast("int"))
    nested = collect_rows(merged, by_generation=True)
    if target_partitions:
        nested = nested.repartitionByRange(target_partitions, "key")
    (nested.write.format("sstable")
           .option("path", out_dir)
           .option("name", "compacted")
           .option("compressed", str(compressed).lower())
           .mode("append").save())
    return merged
