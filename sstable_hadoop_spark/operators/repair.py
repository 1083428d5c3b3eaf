"""Anti-entropy replica repair over sstable cell sets.

The reference tooling reads Cassandra sstables (SSTableData.scala:
45-62 — the immutable cell model this module operates on); the
operation a fleet of such replicas needs next is Cassandra's own
anti-entropy REPAIR: detect which token ranges two replicas disagree
on via Merkle-style range digests, then stream only the cells the
other side is missing.  The reference has no repair surface — this is
the natural 100 TB extension: two 50 TB replicas that agree on 99.9 %
of ranges must exchange digests (KBs), not rows.

Spark-first shape:

* ``cell_digest64`` / ``key_range`` — pure codegen projections; the
  digest is the house cross-engine hash (md5 → first 15 hex → 60-bit
  long, the same primitive corpus.py's hash_split rides) over ONE
  canonical rendering of the full cell, so a DuckDB oracle reproduces
  every digest bit-for-bit.
* ``merkle_ranges`` — ONE aggregation exchange that reduces each
  replica to ``n_ranges`` rows: ``bit_xor`` of cell digests (order-
  and partition-insensitive) plus an exact count.  At any data scale
  the digest table is O(n_ranges).
* ``repair_stream`` — joins the two digest tables (tiny), takes the
  out-of-sync range ids, and anti-joins ONLY those ranges' cells by
  full-cell digest.  The range filter is a broadcast semi join, so
  the big sides are each scanned once and the anti join's shuffle
  carries out-of-sync ranges only — with 0.1 % drift, 0.1 % of rows.

Exactness contract: repair is digest-gated BY DESIGN (as Cassandra's
is) — a 60-bit xor+count collision inside a range would hide that
range, and both engines inherit the same blindness because the oracle
implements the identical gate.  The streamed rows themselves are
exact set differences (anti join on the full-cell digest).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cell_digest64(key: Column, name: Column, state: Column,
                  data: Column, timestamp: Column, ttl: Column,
                  expiration: Column, generation: Column) -> Column:
    """60-bit digest of one cell: md5 of a canonical ``:``-joined
    rendering.  EVERY field is sentinel-coalesced with ``*`` (a
    character outside the base64 alphabet and outside any cast
    number), because Spark's ``concat_ws`` silently SKIPS a NULL
    segment — an un-coalesced NULL would shift the rendering and let
    two cells that differ only in WHICH field is NULL digest
    identically (review r10).  The same rule keeps NULL data from
    aliasing EMPTY data (base64 of b'' is the empty string)."""
    def s(c: Column) -> Column:
        return F.coalesce(c, F.lit("*"))

    canon = F.concat_ws(
        ":",
        s(F.base64(key)),
        s(F.base64(name)),
        s(state),
        s(F.base64(data)),
        s(timestamp.cast("string")),
        s(ttl.cast("string")),
        s(expiration.cast("string")),
        s(generation.cast("string")))
    return F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")


def key_range(key: Column, n_ranges: int) -> Column:
    """Token range of a partition key: md5 of the base64'd key bytes
    mod ``n_ranges`` — a pure function of the key, so one cell lands
    in the same range on every replica (Cassandra's token ring,
    hash-partitioned).  NULL keys coalesce to the digest sentinel so
    they land in ONE well-defined range on every replica instead of a
    NULL range id."""
    h = F.conv(F.substring(F.md5(
        F.coalesce(F.base64(key), F.lit("*"))), 1, 15), 16, 10) \
         .cast("long")
    return F.pmod(h, F.lit(int(n_ranges))).cast("int")


def _with_digests(cells: DataFrame, n_ranges: int) -> DataFrame:
    return cells.withColumn(
        "_digest", cell_digest64(
            F.col("key"), F.col("name"), F.col("state"), F.col("data"),
            F.col("timestamp"), F.col("ttl"), F.col("expiration"),
            F.col("generation"))
    ).withColumn("_range", key_range(F.col("key"), n_ranges))


def merkle_ranges(cells: DataFrame, n_ranges: int = 64) -> DataFrame:
    """Range digest table: ``(range_id, digest, n_cells)`` — one
    aggregation exchange, output O(n_ranges) regardless of input
    size.  ``digest`` is ``bit_xor`` of the 60-bit cell digests (xor:
    associative, commutative, duplicate-free cell sets → order- and
    partitioning-insensitive)."""
    return (_with_digests(cells, n_ranges)
            .groupBy(F.col("_range").alias("range_id"))
            .agg(F.expr("bit_xor(_digest)").alias("digest"),
                 F.count("*").alias("n_cells")))


def merkle_report(a: DataFrame, b: DataFrame,
                  n_ranges: int = 64) -> DataFrame:
    """Side-by-side digest comparison: ``(range_id, n_a, n_b,
    digest_a, digest_b, in_sync)``.  Ranges empty on one side report
    count 0 / digest 0 (the xor identity)."""
    da = merkle_ranges(a, n_ranges).withColumnsRenamed(
        {"digest": "digest_a", "n_cells": "n_a"})
    db = merkle_ranges(b, n_ranges).withColumnsRenamed(
        {"digest": "digest_b", "n_cells": "n_b"})
    j = da.join(db, "range_id", "full")
    return j.select(
        "range_id",
        F.coalesce("n_a", F.lit(0)).cast("long").alias("n_a"),
        F.coalesce("n_b", F.lit(0)).cast("long").alias("n_b"),
        F.coalesce("digest_a", F.lit(0)).cast("long").alias("digest_a"),
        F.coalesce("digest_b", F.lit(0)).cast("long").alias("digest_b"),
        (F.coalesce("digest_a", F.lit(0))
         .eqNullSafe(F.coalesce("digest_b", F.lit(0)))
         & F.coalesce("n_a", F.lit(0))
          .eqNullSafe(F.coalesce("n_b", F.lit(0)))).alias("in_sync"))


def repair_stream(a: DataFrame, b: DataFrame,
                  n_ranges: int = 64) -> DataFrame:
    """Cells each replica must stream to the other, gated by the
    Merkle comparison: ``(direction, key, name, state, data,
    timestamp, ttl, expiration, generation)`` with direction
    ``a_to_b`` for cells only A holds (B needs them) and ``b_to_a``
    for the reverse.

    Plan shape: digest tables (one narrow exchange each) → tiny
    out-of-sync id set, broadcast-semi-joined against both replicas →
    full-cell-digest anti joins over the surviving rows only.  In-sync
    ranges never reach the anti join's shuffle."""
    bad = (merkle_report(a, b, n_ranges)
           .filter(~F.col("in_sync")).select("range_id"))
    da = _with_digests(a, n_ranges)
    db = _with_digests(b, n_ranges)
    cols = [c for c in a.columns]

    def _only_in(x: DataFrame, y: DataFrame, tag: str) -> DataFrame:
        x = x.join(F.broadcast(bad),
                   x["_range"] == F.col("range_id"), "semi")
        y = y.join(F.broadcast(bad),
                   y["_range"] == F.col("range_id"), "semi")
        return (x.join(y.select("_digest"), "_digest", "anti")
                 .select(F.lit(tag).alias("direction"), *cols))

    return _only_in(da, db, "a_to_b").unionByName(
        _only_in(db, da, "b_to_a"))


def repair_replicas(spark, dir_a: str, dir_b: str,
                    n_ranges: int = 64, fmt: str = "native",
                    compressed: bool = False) -> dict:
    """CLOSE the anti-entropy loop over two real SSTable replica
    DIRECTORIES: read both through the binary source, detect and
    stream the differences (:func:`repair_stream`), and WRITE each
    side's missing cells back into it through the distributed SSTable
    sink — per-generation families, so streamed cells keep their
    original generation and timestamps and the repaired replicas
    converge EXACTLY (cell-set equality, not just LWW-winner
    equality).  Returns ``{"a_to_b": n, "b_to_a": n}``.

    The sink's append mode is collision-free (task+job-token file
    names) and commit-atomic (hidden staging, Data.db renamed last),
    so a repair that dies mid-write leaves no half-visible family and
    a re-run converges idempotently: already-streamed cells are no
    longer missing, so the second stream is empty.

    Scale shape: detection is the Merkle gate (O(n_ranges) digests),
    the streams carry only missing cells, and the write is the normal
    distributed sink — a mostly-in-sync pair costs two scans plus the
    drift."""
    from pyspark.sql import functions as F

    from .lww import collect_rows, explode_cells

    def read(d: str) -> DataFrame:
        return explode_cells(spark.read.format("sstable")
                             .option("format", fmt).load(d))

    stream = repair_stream(read(dir_a), read(dir_b), n_ranges).cache()
    try:
        counts = {r["direction"]: r["n"] for r in
                  stream.groupBy("direction")
                        .agg(F.count("*").alias("n")).collect()}
        for direction, target in (("a_to_b", dir_b),
                                  ("b_to_a", dir_a)):
            if not counts.get(direction):
                continue
            rows = collect_rows(
                stream.filter(F.col("direction") == direction)
                      .drop("direction"),
                by_generation=True)
            (rows.write.format("sstable").option("path", target)
                 .option("format", fmt)
                 .option("compressed", str(compressed).lower())
                 .mode("append").save())
        return {"a_to_b": counts.get("a_to_b", 0),
                "b_to_a": counts.get("b_to_a", 0)}
    finally:
        stream.unpersist()
