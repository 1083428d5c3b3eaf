"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

#: above this many input files the scan parallelizes regardless of
#: per-file row-group geometry — skip the footer probe entirely
_PROBE_MAX_FILES = 64

#: logical-plan node names that imply a shuffle (or a deliberate
#: repartition) somewhere below — on such plans the runtime partitioning
#: is the upstream exchange's business (AQE), and probing it via
#: ``df.rdd`` would EXECUTE those stages at DataFrame-build time (AQE
#: materializes every query stage just to answer ``getNumPartitions``).
_SHUFFLE_NODES = ("Aggregate", "Join", "Window", "Repartition",
                  "Rebalance", "Deduplicate", "Intersect", "Except",
                  "Sort", "GlobalLimit", "CoGroup", "FlatMapGroups",
                  "ApplyInPandas", "MapGroups")


def _analyzed_plan_str(df: DataFrame) -> str | None:
    """Analyzed logical plan as text — driver-cheap (no optimization,
    no execution), None when unavailable."""
    try:
        return df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return None


def _has_shuffle_below(df: DataFrame) -> bool:
    """True when the analyzed logical plan contains a node that plans to
    an exchange (aggregate/join/window/sort/distinct/explicit
    repartition…).  String match over the analyzed plan errs on the
    safe side: a false positive only skips an optional repartition."""
    s = _analyzed_plan_str(df)
    if s is None:
        return True  # unknown plan shape: never risk a build-time job
    return any(k in s for k in _SHUFFLE_NODES)


#: inputs whose leaf files total at most this many bytes are "tiny":
#: one extra exchange over them is cheap, so spreading per-row work
#: across idle cores is always worth it.  Anything bigger trusts AQE.
_TINY_INPUT_MAX_BYTES = 256 * 1024 * 1024


def _input_file_bytes(df: DataFrame) -> int | None:
    """Total bytes of the plan's local leaf input files (an upper bound
    on any post-shuffle intermediate derived from them), or None when
    unknown (no file leaves, remote store, listing failure)."""
    import os
    from urllib.parse import unquote, urlparse

    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for uri in files:
        p = urlparse(uri)
        if p.scheme not in ("", "file"):
            return None  # remote store: sizes unknown without I/O
        try:
            total += os.path.getsize(unquote(p.path) if p.scheme else uri)
        except OSError:
            return None
    return total


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
    """Repartition ONLY if the input is an under-parallelized scan.

    Small single-file parquet inputs arrive as one partition, which
    serializes compute-heavy per-row work (shingling, hashing, vector
    math) onto one core.  At real scale inputs already have
    ≥ default-parallelism partitions and this is a no-op — no shuffle
    is added on the 100 TB path.

    Under-parallelized means partition count OR effective parquet
    row-group count (``_parquet_effective_splits``) below half the
    target: a big single-row-group file — a real upstream-writer
    pathology — presents plenty of byte-range partitions but all of
    its rows hide in one of them.

    Plans that already contain a shuffle (aggregate/join/window/…) are
    never probed via ``df.rdd`` — under AQE that would *execute* the
    upstream stages at build time, a hidden job per operator call
    (measured r12: the corpus pipelines ran their dedup shuffle once
    per downstream operator just to answer ``getNumPartitions``).
    Instead the decision uses leaf-file metadata: a tiny input's
    post-shuffle intermediate is AQE-coalesced to ~1 partition and one
    cheap exchange buys back all the cores; big or unknown inputs
    trust AQE's width."""
    if df.isStreaming:
        # partitioning is governed by the source/trigger on a stream
        # (df.rdd is illegal there); operators stay usable unchanged
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    floor = max(target // 2, 2)
    plan = _analyzed_plan_str(df)
    if plan is None or any(k in plan for k in _SHUFFLE_NODES):
        # Post-shuffle plan.  AQE sizes the exchange's output by BYTES
        # (advisory partition size), not by downstream CPU cost, so a
        # tiny intermediate coalesces to ~1 partition and per-row-heavy
        # work after it serializes onto one core.  File metadata gives
        # an upper bound on the intermediate's size without running
        # anything: tiny input → one cheap exchange buys back all the
        # cores; big/unknown input → trust AQE's width (at scale the
        # exchange output is already wide, and an unconditional
        # repartition would be a full extra pass over the corpus).
        # A Repartition already in the plan means an upstream operator
        # (usually this function) has spread the data — never stack a
        # second exchange on it.
        if plan is None or "Repartition" in plan or "Rebalance" in plan:
            return df
        total = _input_file_bytes(df)
        if total is not None and 0 < total <= _TINY_INPUT_MAX_BYTES:
            return df.repartition(target)
        return df
    # leaf-ish plan (scan/local values/union of scans): df.rdd is
    # planning-only here — no exchange below means nothing to execute
    if df.rdd.getNumPartitions() < floor:
        return df.repartition(target)
    eff = _parquet_effective_splits(df)
    if eff is not None and eff < floor:
        return df.repartition(target)
    return df
