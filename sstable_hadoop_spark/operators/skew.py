"""Skew-mitigation helpers for hot keys at scale.

AQE's skew-join splitting handles joins automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in the session factory),
but a single hot GROUP BY key still lands on one reducer.  Salted
two-phase aggregation spreads the hot key over ``n_salts`` reducers,
then merges the partials — the standard remedy when one row key holds
millions of cells (a known Cassandra wide-row pathology the reference's
MR jobs would also serialize on a single reducer).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: inputs whose files total at most this many bytes take the JVM
#: head-sample path: a full codegen scan of ≤64 MiB is cheaper than
#: one JVM→Python round trip, and the probe then costs no Python
#: worker at all (guide §4: eliminate the boundary where a built-in
#: expresses the same thing)
_JVM_PROBE_MAX_BYTES = 64 * 1024 * 1024


def _head_sample(df: DataFrame, cols: Sequence[str],
                 rows_per_partition: int) -> DataFrame:
    """First ``rows_per_partition`` rows of every partition.

    Two result-identical implementations picked by plan shape and
    input size (both sample exactly the same rows — the leading rows
    of each partition in scan order):

    - SCAN-SHAPED local inputs (no shuffle/Generate below — a
      row-expanding plan would void the size bound) whose file
      metadata says ≤ ``_JVM_PROBE_MAX_BYTES`` filter on the
      per-partition row position encoded in
      ``monotonically_increasing_id`` (low 33 bits) — pure codegen,
      no Python worker; the "full" scan it implies is bounded by the
      size + shape checks that selected it;
    - everything else (big, remote, unsized, exploded or post-shuffle
      inputs) keeps the mapInPandas that stops pulling Arrow batches
      once satisfied — cost O(partitions × rows_per_partition), NOT a
      full scan, so it stays cheap at 100 TB (vs ``sample(fraction)``,
      which reads everything)."""
    from ._util import (
        _GENERATE_RE,
        _SHUFFLE_NODE_RE,
        _analyzed_plan_str,
        _input_file_bytes,
    )

    proj = df.select(*cols)

    small = False
    if not df.isStreaming:
        plan = _analyzed_plan_str(df)
        scan_shaped = (plan is not None
                       and not _SHUFFLE_NODE_RE.search(plan)
                       and not _GENERATE_RE.search(plan))
        if scan_shaped:
            total = _input_file_bytes(df)
            small = (total is not None
                     and 0 < total <= _JVM_PROBE_MAX_BYTES)
    if small:
        pos = F.monotonically_increasing_id().bitwiseAND(
            F.lit((1 << 33) - 1))
        return (proj.withColumn("_pp_pos", pos)
                    .filter(F.col("_pp_pos") < rows_per_partition)
                    .drop("_pp_pos"))

    def take(batches):
        n = 0
        for pdf in batches:
            if n >= rows_per_partition:
                break
            chunk = pdf.iloc[:rows_per_partition - n]
            n += len(chunk)
            yield chunk

    return proj.mapInPandas(take, proj.schema)


#: below this total input size no reducer partition can exceed AQE's
#: own skew definition (``spark.sql.adaptive.skewJoin.
#: skewedPartitionThresholdInBytes``, default 256 MB: a partition only
#: COUNTS as skewed above it) — so probing is pure overhead and the
#: detector answers False from file metadata alone, no job.  The gate
#: is 64 MiB, not 256: file bytes are COMPRESSED parquet while AQE's
#: threshold measures shuffle bytes, and dictionary/RLE-encoded
#: columns commonly expand several-fold at shuffle — the 4× safety
#: factor keeps a ≤256 MB-compressed hot key from slipping past the
#: probe (ADVICE r12; results stay exact either way, the gate trades
#: only probe latency).
_SKEW_MIN_INPUT_BYTES = 64 * 1024 * 1024


def _provably_tiny(df: DataFrame) -> bool:
    from ._util import _input_file_bytes

    if df.isStreaming:
        return False
    total = _input_file_bytes(df)
    return total is not None and 0 < total <= _SKEW_MIN_INPUT_BYTES


def detect_group_skew(df: DataFrame, keys: Sequence[str],
                      rows_per_partition: int = 1000,
                      skew_factor: int = 32,
                      min_hot: int = 100) -> bool:
    """Cheap pre-flight skew probe for a ``groupBy(keys)``: head-sample
    each partition, count per key, and flag when the hottest sampled key
    holds ≥ ``skew_factor``× the mean group size (and at least
    ``min_hot`` sampled rows, so near-empty samples never trigger).

    One small driver-side collect of a 1-row aggregate; the sample scan
    touches only the first batch(es) of each partition.  Inputs whose
    leaf files total ≤ ``_SKEW_MIN_INPUT_BYTES`` answer False from
    metadata alone (r12): skew mitigation exists to keep one reducer
    from drowning, and below the size a single partition must EXCEED
    to count as skewed (AQE's 256 MB threshold) the worst case — one
    reducer handling the whole input — is already cheaper than the
    probe job itself.  Which path runs never changes results (the
    salted merge is exact), so the gate trades only probe latency."""
    if _provably_tiny(df):
        return False
    row = (_head_sample(df, keys, rows_per_partition)
           .groupBy(*keys).count()
           .agg(F.max("count").alias("mx"), F.sum("count").alias("n"),
                F.count(F.lit(1)).alias("g"))
           .collect()[0])
    if not row["g"]:
        return False
    mean = row["n"] / row["g"]
    return row["mx"] >= min_hot and row["mx"] >= skew_factor * mean


def salted_agg(df: DataFrame, keys: Sequence[str],
               aggs: dict[str, tuple[str, str]],
               n_salts: int = 16) -> DataFrame:
    """Two-phase salted aggregation for algebraic aggregates.

    ``aggs`` maps output column → (input column, fn) with fn one of
    ``sum | count | min | max``.  Phase 1 aggregates on
    (keys + salt) — the hot key spreads over ``n_salts`` reducers —
    phase 2 merges partials on the true keys (count partials re-merge
    with sum).

    >>> salted_agg(cells, ["key"], {"n": ("*", "count"),
    ...                             "max_ts": ("timestamp", "max")})
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    salt = (F.abs(F.hash(F.monotonically_increasing_id())) % n_salts) \
        .alias("_salt")
    phase1_aggs = []
    for out, (col, fn) in aggs.items():
        c = F.lit(1) if col == "*" else F.col(col)
        phase1_aggs.append(getattr(F, "count" if fn == "count" else fn)(c)
                           .alias(f"_p_{out}"))
    phase1 = (df.withColumn("_salt", salt)
                .groupBy(*keys, "_salt")
                .agg(*phase1_aggs))
    phase2_aggs = [getattr(F, merge_fn[fn])(F.col(f"_p_{out}")).alias(out)
                   for out, (_col, fn) in aggs.items()]
    return phase1.groupBy(*keys).agg(*phase2_aggs)


def salted_lww_cell(cells: DataFrame, n_salts: int = 16) -> DataFrame:
    """Per-cell LWW for pathologically hot row keys: phase 1 picks a
    local winner per (key, name, salt); phase 2 merges the ≤n_salts
    survivors per (key, name).  Same result as ``lww_cell`` (max_by is
    associative), bounded reducer load."""
    from .lww import CELL_COLS, _order_key

    payload = F.struct(*[F.col(c) for c in CELL_COLS])
    salt = (F.abs(F.hash(F.monotonically_increasing_id())) % n_salts)
    local = (cells.withColumn("_salt", salt)
             .groupBy("key", "name", "_salt")
             .agg(F.max_by(payload, _order_key()).alias("w"))
             .select("key", "name", "w.state", "w.data", "w.timestamp",
                     "w.ttl", "w.expiration", "w.generation"))
    return (local
            .groupBy("key", "name")
            .agg(F.max_by(F.struct(*[F.col(c) for c in CELL_COLS]),
                          _order_key()).alias("w"))
            .select("key", "name", "w.state", "w.data", "w.timestamp",
                    "w.ttl", "w.expiration", "w.generation"))


def skew_join(left: DataFrame, right: DataFrame, on: str,
              how: str = "inner",
              hot_keys: Sequence | None = None,
              sample_rows_per_partition: int = 1000,
              hot_fraction_milli: int = 50) -> DataFrame:
    """Hot-key-split join, ROW-IDENTICAL to ``left.join(right, on,
    how)`` by construction: rows whose key is HOT take a broadcast
    leg (the right side restricted to the hot keys is tiny by
    definition of "few hot keys", so the 90th-percentile key's
    shuffle partition never receives the hot key's flood), everything
    else takes the normal hash join; the two legs union.  The
    straggler-killer for power-law keys (the one user with 10^9
    events) that AQE's skew-split mitigates only partially — AQE
    splits the oversized partition's FILES, but every row of the hot
    key still meets every matching right row in one task's sort-merge.

    ``hot_keys``: explicit hot key values (deterministic, the
    oracle-checkable path).  When None, keys claiming more than
    ``hot_fraction_milli`` per-mille of a head-sample
    (:func:`detect_group_skew`'s probe) are taken — detection reads
    only the first Arrow batches of each partition, O(partitions) at
    any scale; which leg a key takes NEVER changes the result, so a
    detection miss costs speed, not correctness.

    ``how``: ``inner`` or ``left`` (legs partition the LEFT rows, so
    unioning leg results is exact for left-retaining joins; a right/
    full join would need the split on the right side instead —
    unsupported here, loudly)."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"skew_join supports inner/left, got {how!r} (split the "
            "other side for right-retaining joins)")
    if hot_keys is None:
        if _provably_tiny(left):
            # below AQE's own skewed-partition threshold no key can
            # flood a reducer — the two probe jobs would cost more
            # than the worst case they protect against; the plain
            # join is row-identical by construction (r12)
            hot_keys = []
        else:
            counts = (_head_sample(left, [on], sample_rows_per_partition)
                      .groupBy(on).count())
            total = counts.agg(F.sum("count")).collect()[0][0] or 1
            cut = total * hot_fraction_milli // 1000
            # top-64 candidates only: the collect stays metadata-sized
            # at any cluster width
            hot_keys = [r[on] for r in
                        counts.orderBy(F.desc("count")).limit(64).collect()
                        if r["count"] > cut and r[on] is not None]
    # a None in a declared list would poison isin into SQL three-
    # valued logic (every non-listed key evaluates NULL and BOTH legs
    # drop it); NULL keys never match an equi join anyway, so routing
    # them to the cold leg below is exact
    hot_keys = [k for k in hot_keys if k is not None]
    if not hot_keys:
        return left.join(right, on, how)
    is_hot = F.col(on).isin(*hot_keys)
    hot = (left.filter(is_hot)
               .join(F.broadcast(right.filter(is_hot)), on, how))
    cold = left.filter(~is_hot | F.col(on).isNull()) \
               .join(right, on, how)
    return hot.unionByName(cold)
