"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

#: above this many input files the scan parallelizes regardless of
#: per-file row-group geometry — skip the footer probe entirely
_PROBE_MAX_FILES = 64


def _parquet_effective_splits(df: DataFrame) -> int | None:
    """Total ROW GROUPS behind a local-parquet scan, or None when the
    question doesn't apply (non-file plan, many files, remote store,
    unreadable footer).

    Partition COUNT lies about parquet parallelism: Spark splits files
    into byte ranges, but a row group is the minimum read unit — a
    900 MB file written as ONE row group yields 7 "partitions" of
    which 6 are empty, and every downstream per-row stage serializes
    onto one core while looking well-partitioned.  Footers are the
    same metadata Spark's own scan planner reads, so this probe is
    driver-cheap and bounded (≤ ``_PROBE_MAX_FILES`` footers)."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files or len(files) > _PROBE_MAX_FILES:
        return None
    from urllib.parse import unquote, urlparse

    import pyarrow.parquet as pq

    total = 0
    for uri in files:
        if not uri.endswith(".parquet"):
            return None
        parsed = urlparse(uri)
        if parsed.scheme not in ("", "file"):
            return None  # remote store: trust its split planning
        path = unquote(parsed.path) if parsed.scheme else uri
        try:
            total += pq.ParquetFile(path).metadata.num_row_groups
        except Exception:
            return None
    return total


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ONLY if the input is under-parallelized.

    Small single-file parquet inputs arrive as one partition, which
    serializes compute-heavy per-row work (shingling, hashing, vector
    math) onto one core.  At real scale inputs already have
    ≥ default-parallelism partitions and this is a no-op — no shuffle
    is added on the 100 TB path.

    Under-parallelized means partition count OR effective parquet
    row-group count (``_parquet_effective_splits``) below half the
    target: a big single-row-group file — a real upstream-writer
    pathology — presents plenty of byte-range partitions but all of
    its rows hide in one of them."""
    if df.isStreaming:
        # partitioning is governed by the source/trigger on a stream
        # (df.rdd is illegal there); operators stay usable unchanged
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    floor = max(target // 2, 2)
    if df.rdd.getNumPartitions() < floor:
        return df.repartition(target)
    eff = _parquet_effective_splits(df)
    if eff is not None and eff < floor:
        return df.repartition(target)
    return df
