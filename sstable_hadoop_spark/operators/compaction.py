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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .lww import collect_rows, explode_cells, lww_cell


def _gc(winners: DataFrame, gc_before_ms: int | None) -> DataFrame:
    if gc_before_ms is None:
        return winners
    gc_us = gc_before_ms * 1000
    return winners.filter(~(
        ((F.col("state") == "DELETED") & (F.col("timestamp") < gc_us))
        | ((F.col("state") == "EXPIRING")
           & F.col("expiration").isNotNull()
           & (F.col("expiration") <= gc_before_ms))))


def _write_merged(winners: DataFrame, out_dir: str, generation: int,
                  name: str, target_partitions: int | None,
                  compressed: bool) -> DataFrame:
    merged = winners.withColumn("generation",
                                F.lit(generation).cast("int"))
    nested = collect_rows(merged, by_generation=True)
    if target_partitions:
        nested = nested.repartitionByRange(target_partitions, "key")
    (nested.write.format("sstable")
           .option("path", out_dir)
           .option("name", name)
           .option("compressed", str(compressed).lower())
           .mode("append").save())
    return merged


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
    winners = _gc(lww_cell(explode_cells(rows)), gc_before_ms)
    return _write_merged(winners, out_dir, generation, "compacted",
                         target_partitions, compressed)


def pick_size_tiered(in_dir: str, bucket_low: float = 0.5,
                     bucket_high: float = 1.5,
                     min_threshold: int = 4,
                     max_threshold: int = 32) -> list[list[str]]:
    """Size-tiered compaction candidate selection — Cassandra's STCS
    bucketing algorithm on Data.db file sizes: a file joins an existing
    bucket when its size lies within [bucket_low·avg, bucket_high·avg]
    of that bucket's running average; buckets with at least
    ``min_threshold`` files are due for compaction (largest files
    capped at ``max_threshold`` per run).

    Metadata-only (one directory listing + stat per file — no data
    I/O), so it runs on the driver in O(files log files) regardless of
    data volume; returns buckets sorted smallest-average-first, each a
    list of Data.db paths for ``compact_files``.
    """
    from sstable_hadoop_spark.sources.datasource import _list_files

    sized = sorted(((os.path.getsize(f), f)
                    for f in _list_files(in_dir, "-Data.db")))
    buckets: list[tuple[float, list[tuple[int, str]]]] = []
    for size, path in sized:
        placed = False
        for i, (avg, members) in enumerate(buckets):
            if bucket_low * avg <= size <= bucket_high * avg:
                members.append((size, path))
                total = sum(s for s, _ in members)
                buckets[i] = (total / len(members), members)
                placed = True
                break
        if not placed:
            buckets.append((float(size), [(size, path)]))
    due = [(avg, [p for _, p in members[:max_threshold]])
           for avg, members in buckets if len(members) >= min_threshold]
    return [paths for _, paths in sorted(due, key=lambda b: b[0])]


def compact_files(spark: SparkSession, files: list[str], out_dir: str,
                  generation: int | None = None,
                  gc_before_ms: int | None = None,
                  target_partitions: int | None = None,
                  compressed: bool = False) -> DataFrame:
    """Compact an explicit file set (one STCS bucket from
    ``pick_size_tiered``) into a single merged generation, leaving
    every other generation in place — Cassandra's incremental
    size-tiered compaction as a Spark job.  Semantics identical to
    ``compact`` restricted to ``files``."""
    from functools import reduce

    from sstable_hadoop_spark.sources.datasource import register

    if not files:
        raise ValueError("compact_files requires a non-empty file list")
    register(spark)
    rows = reduce(lambda a, b: a.unionByName(b),
                  [spark.read.format("sstable").load(f) for f in files])
    if generation is None:
        generation = (rows.agg(F.max("generation")).collect()[0][0] or 0) + 1
    winners = _gc(lww_cell(explode_cells(rows)), gc_before_ms)
    return _write_merged(winners, out_dir, generation, "tiered",
                         target_partitions, compressed)
