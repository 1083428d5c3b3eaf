"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ONLY if the input is under-parallelized.

    Small single-file parquet inputs arrive as one partition, which
    serializes compute-heavy per-row work (shingling, hashing, vector
    math) onto one core.  At real scale inputs already have
    ≥ default-parallelism partitions and this is a no-op — no shuffle
    is added on the 100 TB path.
    """
    if df.isStreaming:
        # partitioning is governed by the source/trigger on a stream
        # (df.rdd is illegal there); operators stay usable unchanged
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(target // 2, 2):
        return df.repartition(target)
    return df
