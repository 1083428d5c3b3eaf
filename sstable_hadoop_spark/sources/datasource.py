"""PySpark Python DataSource exposing SSTable files as DataFrames:
``spark.read.format("sstable").option("kind", "data").load(dir)``.

Replaces, structurally, the reference's entire scan stack:

- ``SSTableDataInputFormat`` / ``SSTableDataRecordReader`` (whole-file
  scan, reference load/SSTableDataInputFormat.scala:12-21,
  load/SSTableDataRecordReader.scala:23-98)
- ``SplitSSTableDataInputFormat`` / ``SplitSSTableDataRecordReader``
  (manifest-driven parallel scan of compressed files, reference
  load/SplitSSTableDataInputFormat.scala:21-71,
  load/SplitSSTableDataRecordReader.scala:13-79)
- the three chained split-planning MapReduce jobs
  (tools/GenerateSSTableIndexSplits.scala,
  tools/GenerateSSTableDataSplits.scala, tools/ReadSSTableDataFile.scala)
  — their chunk/offset math (``chunksPerSplit = maxSplitSize /
  chunkLength``, GenerateSSTableDataSplits.scala:131-136) runs here at
  ``partitions()`` time instead of as a pre-job writing TSV manifests.

Scale design: planning reads only Index.db offsets (8+len bytes per
row) and CompressionInfo chunk tables — metadata, never data.  Each
partition is an independent uncompressed byte range starting at a row
boundary, so a 100 TB directory of SSTables fans out to
``total_bytes / max_split_bytes`` tasks with no driver-side data
movement.  Reading decompresses chunk-at-a-time (64 KiB peak memory),
unlike the reference's whole-split materialization
(SplitSSTableDataRecordReader.scala:58-72).

Key-range scan pruning: equality/range filters on ``key`` prune whole
partitions using the min/max key recorded per split from Index.db — a
capability the reference reads the index for but never exploits
(``setPartitionFilter`` is a no-op stub, SSTableDataLoader.scala:33).
"""

from __future__ import annotations

import os
import tempfile
import zipfile
import struct
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from . import codec, fs

CELL_STRUCT = StructType([
    StructField("name", BinaryType(), False),
    StructField("state", StringType(), False),
    StructField("data", BinaryType(), True),
    StructField("timestamp", LongType(), False),
    StructField("ttl", LongType(), True),
    StructField("expiration", LongType(), True),
])

DATA_SCHEMA = StructType([
    StructField("key", BinaryType(), False),
    StructField("columns", ArrayType(CELL_STRUCT), False),
    StructField("generation", IntegerType(), False),
])

# kind=cells: one record per CELL (the shape of operators.explode_cells
# output) — batches flush on cell count, so wide rows never materialize
# as a single nested value; prefer it when the first downstream op
# would be explode_cells anyway.
CELLS_SCHEMA = StructType([
    StructField("key", BinaryType(), False),
    StructField("name", BinaryType(), False),
    StructField("state", StringType(), False),
    StructField("data", BinaryType(), True),
    StructField("timestamp", LongType(), False),
    StructField("ttl", LongType(), True),
    StructField("expiration", LongType(), True),
    StructField("generation", IntegerType(), False),
])

INDEX_SCHEMA = StructType([
    StructField("key", BinaryType(), False),
    StructField("pos", LongType(), False),
    StructField("generation", IntegerType(), False),
])

SUMMARY_SCHEMA = StructType([
    StructField("key", BinaryType(), False),
    StructField("index_offset", LongType(), False),
    StructField("generation", IntegerType(), False),
])

# One row per planned split — the split manifest of the reference's
# Job-2 output (GenerateSSTableDataSplits.scala:213) exposed as a
# queryable DataFrame instead of a TSV.  Like the reference,
# byte_start/byte_length are FILE-space (compressed bytes for a
# compressed table: rawSplitPosition/length), inner_offset/inner_length
# locate the split's rows inside the uncompressed view of its chunk
# range (the reference's firstKeyOffset / lastKeyOffset-firstKeyOffset),
# uncompressed_length is the chunk range's uncompressed size, and
# chunks lists the compressed chunk positions the split spans.  Splits
# are planned at ROW boundaries (not chunk boundaries), so adjacent
# compressed splits may share their boundary chunk — byte ranges can
# overlap by at most one chunk; uncompressed files tile exactly.
MANIFEST_SCHEMA = StructType([
    StructField("filename", StringType(), False),
    StructField("split_index", LongType(), False),
    StructField("byte_start", LongType(), False),
    StructField("byte_length", LongType(), False),
    StructField("inner_offset", LongType(), False),
    StructField("inner_length", LongType(), False),
    StructField("uncompressed_length", LongType(), False),
    StructField("chunks", ArrayType(LongType()), True),
    StructField("generation", IntegerType(), False),
])

DEFAULT_MAX_SPLIT_BYTES = 128 * 1024 * 1024  # reference used 256 MiB
                                             # (GenerateSSTableDataSplits.scala:238)

_SCHEMAS_BY_KIND = {"data": DATA_SCHEMA, "cells": CELLS_SCHEMA,
                    "index": INDEX_SCHEMA, "summary": SUMMARY_SCHEMA,
                    "manifest": MANIFEST_SCHEMA}


@dataclass
class RangePartition(InputPartition):
    path: str
    start: int
    end: int
    generation: int
    min_key: bytes | None = None  # exact per-split key bounds from Index.db
    max_key: bytes | None = None


def _parse_columns(options: dict) -> tuple[str, ...] | None:
    """``option("columns", "key,generation")`` → validated projection
    tuple in schema-field order (None = all columns)."""
    raw = options.get("columns")
    if raw is None:
        return None
    kind = options.get("kind", "data")
    names = [c.strip() for c in str(raw).split(",") if c.strip()]
    schema = _SCHEMAS_BY_KIND.get(kind)
    if schema is None:
        raise ValueError(f"unknown kind: {kind}")
    known = schema.fieldNames()
    bad = [n for n in names if n not in known]
    if bad:
        raise ValueError(
            f"columns option names unknown field(s) {bad} for "
            f"kind={kind}; available: {known}")
    if not names:
        raise ValueError("columns option must name at least one field")
    return tuple(n for n in known if n in names)


def _list_files(path: str, suffix: str) -> list[str]:
    """Directory-listing suffix filter, the reference's P1 operator
    (SSTableDataInputFormat.scala:13-18).  Hidden entries — any
    dot/underscore path COMPONENT below the listing root, the full
    Hadoop convention — are skipped: the write sink stages in-flight
    families under dot-names (and layout code stages in dot-dirs), and
    a scan racing a write must never read a half-written Data.db (r7;
    same protocol as the WARC sink).  A path that IS an explicitly
    named file is returned as-is: naming a file directly overrides the
    hidden convention (debugging a staged temp is legitimate)."""
    if fs.is_file(path):
        return [path]
    root = path.rstrip("/")

    def hidden(f: str) -> bool:
        rel = f[len(root):] if f.startswith(root) else os.path.basename(f)
        return any(part.startswith((".", "_"))
                   for part in rel.split("/") if part)

    return [f for f in fs.list_files(path, suffix) if not hidden(f)]


#: every non-Data member a generation family can carry — used by the
#: orphan guard below and the sink's stale-orphan sweep
_COMPANION_SUFFIXES = ("-Index.db", "-Summary.db", "-Filter.db",
                       "-CompressionInfo.db")


def _orphan_companion(path: str) -> bool:
    """True when a companion file's sibling ``Data.db`` is absent.

    A driver that crashes mid-``commit()`` publishes a PREFIX of its
    rename plan: a family whose companions were renamed final but
    whose ``Data.db`` was not would otherwise be served by
    ``kind='index'/'summary'`` scans (which list companions
    independently) while being invisible to data scans — an
    inconsistent metadata view (review r8).  Data scans key off
    ``Data.db``, so guarding the companion kinds restores the
    invariant "a family is visible to ALL kinds or to NONE"; the
    sink's sweep reaps the orphaned bytes later."""
    name = os.path.basename(path)
    for suf in _COMPANION_SUFFIXES:
        if name.endswith(suf):
            return not fs.exists(path[:-len(suf)] + "-Data.db")
    return False


def _plan_file(data_path: str, max_split: int,
               ci_reader=None) -> list[RangePartition]:
    """Split one Data.db at row boundaries taken from Index.db.

    Performs, in one metadata pass, what the reference's G1/G2 jobs do
    with two MapReduce rounds: walk offsets, emit a boundary whenever
    the accumulated gap exceeds the target split size
    (GenerateSSTableIndexSplits.scala:75-91 for the gap loop;
    GenerateSSTableDataSplits.scala:131-136 for the size target).
    Falls back to one partition per file when no Index.db companion
    exists — the reference's unsplittable whole-file mode
    (SSTableDataInputFormat.scala:20 ``isSplitable=false``).
    """
    gen = codec.generation_of(data_path)
    index_path = data_path.replace("-Data.db", "-Index.db")
    ci_path = data_path.replace("-Data.db", "-CompressionInfo.db")
    if fs.exists(ci_path):
        # ci_reader parses the companion's format (native by default;
        # cassandra1x for format=cassandra files)
        total = (ci_reader or codec.read_compression_info)(
            ci_path).uncompressed_length
    else:
        total = fs.file_size(data_path)

    if not fs.exists(index_path):
        return [RangePartition(data_path, 0, total, gen)]

    parts: list[RangePartition] = []
    split_start = 0
    lo = hi = None
    for key, pos in codec.read_index_entries(index_path):
        if pos - split_start >= max_split:
            parts.append(RangePartition(data_path, split_start, pos, gen,
                                        lo, hi))
            split_start = pos
            lo = hi = None
        # exact min/max per split — correct even if keys are unsorted
        lo = key if lo is None or key < lo else lo
        hi = key if hi is None or key > hi else hi
    if split_start < total or not parts:
        parts.append(RangePartition(data_path, split_start, total, gen,
                                    lo, hi))
    return parts


class SSTableReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sstable source requires a path")
        self.kind = options.get("kind", "data")
        # format=native (this package's layout, default) | cassandra
        # (real Apache Cassandra 1.x files, best-effort; see
        # sources/cassandra1x.py for the parsed public layout)
        self.fmt = options.get("format", "native")
        if self.fmt not in ("native", "cassandra"):
            raise ValueError(f"unknown format: {self.fmt}")
        self.max_split = int(options.get("max_split_bytes",
                                         DEFAULT_MAX_SPLIT_BYTES))
        # Spark convention: skip unreadable files instead of failing the
        # job (torn writes, partial uploads). Default false = fail fast.
        self.ignore_corrupt = str(options.get("ignore_corrupt_files",
                                              "false")).lower() == "true"
        # Arrow-batched reads are the default hot path (one Arrow IPC
        # transfer per ~4k rows instead of one pickled tuple per row);
        # use_arrow=false falls back to the row iterator.
        self.use_arrow = str(options.get("use_arrow",
                                         "true")).lower() == "true"
        # format=cassandra only: error (default) | skip for columns
        # outside the 3-variant model (counters, range tombstones) —
        # real backups can contain them (cassandra1x.py module doc)
        self.on_unsupported = str(options.get("on_unsupported", "error"))
        if self.on_unsupported not in ("error", "skip"):
            raise ValueError(
                f"on_unsupported must be error|skip, "
                f"got {self.on_unsupported!r}")
        # Explicit column projection — the pruning Catalyst cannot push
        # through the Python DataSource API.  columns= narrows the scan
        # schema itself (codec skips materializing pruned fields);
        # skip_values= keeps the schema but nulls cell data without
        # slicing the value bytes.
        self.project = _parse_columns(dict(options))
        self.skip_values = str(options.get("skip_values",
                                           "false")).lower() == "true"
        self._key_lo: bytes | None = None  # inclusive
        self._key_hi: bytes | None = None  # inclusive
        self._gen_lo: int | None = None    # inclusive
        self._gen_hi: int | None = None    # inclusive
        self._gen_in: set[int] | None = None

    def pushFilters(self, filters: list[Filter]):
        """Key-range scan pruning from Index.db split bounds — the
        capability the reference's no-op ``setPartitionFilter`` stub
        never implemented (SSTableDataLoader.scala:33).

        Filters are used ONLY to prune whole partitions; every filter is
        returned to Spark, which re-applies them post-scan, so pruning
        can never change results — only skip unreadable-anyway splits.
        """
        def as_bytes(v):
            if isinstance(v, (bytes, bytearray)):
                return bytes(v)
            if isinstance(v, str):
                return v.encode("utf-8")
            return None

        if self.kind in ("data", "cells"):
            for f in filters:
                attr = getattr(f, "attribute", None)
                if attr != ("key",):
                    continue
                v = as_bytes(getattr(f, "value", None))
                if v is None:
                    continue
                if isinstance(f, EqualTo):
                    self._tighten(v, v)
                elif isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                    self._tighten(v, None)
                elif isinstance(f, (LessThan, LessThanOrEqual)):
                    self._tighten(None, v)
        # generation is derivable from the FILENAME, so generation
        # predicates prune whole files at plan time, exactly — the
        # incremental-consumer pattern (generation > last_processed)
        # costs a directory listing, not a scan.  Open bounds are
        # adjusted by 1 because file pruning needs inclusive bounds.
        if self.kind in ("data", "cells", "index"):
            for f in filters:
                if getattr(f, "attribute", None) != ("generation",):
                    continue
                v = getattr(f, "value", None)
                if isinstance(f, EqualTo) and isinstance(v, int):
                    self._tighten_gen(v, v)
                elif isinstance(f, GreaterThan) and isinstance(v, int):
                    self._tighten_gen(v + 1, None)
                elif isinstance(f, GreaterThanOrEqual) and isinstance(v, int):
                    self._tighten_gen(v, None)
                elif isinstance(f, LessThan) and isinstance(v, int):
                    self._tighten_gen(None, v - 1)
                elif isinstance(f, LessThanOrEqual) and isinstance(v, int):
                    self._tighten_gen(None, v)
                elif isinstance(f, In):
                    vals = [x for x in getattr(f, "value", ())
                            if isinstance(x, int)]
                    if vals and len(vals) == len(getattr(f, "value", ())):
                        s = set(vals)
                        self._gen_in = (s if self._gen_in is None
                                        else self._gen_in & s)
        return filters  # Spark re-applies everything

    def _tighten(self, lo: bytes | None, hi: bytes | None) -> None:
        if lo is not None and (self._key_lo is None or lo > self._key_lo):
            self._key_lo = lo
        if hi is not None and (self._key_hi is None or hi < self._key_hi):
            self._key_hi = hi

    def _tighten_gen(self, lo: int | None, hi: int | None) -> None:
        if lo is not None and (self._gen_lo is None or lo > self._gen_lo):
            self._gen_lo = lo
        if hi is not None and (self._gen_hi is None or hi < self._gen_hi):
            self._gen_hi = hi

    def _gen_admits(self, path: str) -> bool:
        """File-level generation pruning (exact: generation IS the
        filename's generation; Spark still re-applies the filter).
        Works for any component filename (-Data.db, -Index.db, ...);
        an unparseable name never prunes."""
        if (self._gen_lo is None and self._gen_hi is None
                and self._gen_in is None):
            return True
        import re as _re

        m = _re.search(r"-(\d+)-[A-Za-z]+\.db$", os.path.basename(path))
        if m is None:
            return True
        g = int(m.group(1))
        if self._gen_lo is not None and g < self._gen_lo:
            return False
        if self._gen_hi is not None and g > self._gen_hi:
            return False
        if self._gen_in is not None and g not in self._gen_in:
            return False
        return True

    def _overlaps(self, p: RangePartition) -> bool:
        if p.min_key is None or p.max_key is None:
            return True  # no index → cannot prune
        if self._key_lo is not None and p.max_key < self._key_lo:
            return False
        if self._key_hi is not None and p.min_key > self._key_hi:
            return False
        return True

    def _bloom_rejects(self, data_path: str) -> bool:
        """Point lookups (key == k) skip whole files via the per-SSTable
        bloom filter (-Filter.db) — Cassandra's read-path first check.
        Bloom says 'definitely absent' only; false positives just fall
        through to the range-pruned scan."""
        if self._key_lo is None or self._key_lo != self._key_hi:
            return False
        f_path = data_path.replace("-Data.db", "-Filter.db")
        if not fs.exists(f_path):
            return False
        try:
            return not codec.BloomFilter(f_path).might_contain(self._key_lo)
        except (IOError, struct.error):
            return False  # unreadable filter → never prune

    def partitions(self):
        if self.kind in ("data", "cells"):
            ci_reader = None
            if self.fmt == "cassandra":
                from .cassandra1x import read_cassandra_compression_info

                ci_reader = read_cassandra_compression_info
            parts = []
            for f in _list_files(self.path, "-Data.db"):
                if not self._gen_admits(f):
                    continue
                # -Filter.db bloom pruning is native-format only (the
                # real Cassandra Filter.db is a different serialization
                # — misparsing it must never prune)
                if self.fmt == "native" and self._bloom_rejects(f):
                    continue
                parts.extend(
                    q for q in _plan_file(f, self.max_split, ci_reader)
                    if self._overlaps(q))
            return parts or [RangePartition("", 0, 0, 0)]
        if self.kind == "index":
            parts = []
            for f in _list_files(self.path, "-Index.db"):
                # explicitly naming the file overrides the orphan
                # guard, same convention as _list_files's hidden skip
                if not self._gen_admits(f) or \
                        (f != self.path and _orphan_companion(f)):
                    continue
                parts.extend(self._plan_index_file(f))
            return parts or [RangePartition("", 0, 0, 0)]
        if self.kind == "summary":
            return [RangePartition(f, 0, fs.file_size(f),
                                   codec.generation_of(
                                       f.replace("-Summary.db", "-Data.db")))
                    for f in _list_files(self.path, "-Summary.db")
                    if f == self.path or not _orphan_companion(f)] \
                or [RangePartition("", 0, 0, 0)]
        if self.kind == "manifest":
            # planned-split view; one partition listing all files is fine
            # (manifest rows are tiny metadata).
            return [RangePartition(self.path, 0, 0, 0)]
        raise ValueError(f"unknown kind: {self.kind}")

    def _plan_index_file(self, f: str) -> list[RangePartition]:
        """Plan byte-range splits of one Index.db.  A file over
        ``max_split_bytes`` is split at Summary.db sample offsets —
        exactly the reference's GenerateSSTableIndexSplits job
        (IndexMapper, GenerateSSTableIndexSplits.scala:61-96: walk the
        summary; every time the gap since the previous cut exceeds
        max_split, emit (prevPos, len); final remainder to EOF).
        Summary offsets are Index.db record boundaries, so each split
        parses cleanly.  Without a Summary.db companion the file stays
        one split (index records are var-length; mid-file offsets are
        not safe cut points)."""
        gen = codec.generation_of(f.replace("-Index.db", "-Data.db"))
        size = fs.file_size(f)
        summary_path = f.replace("-Index.db", "-Summary.db")
        if size <= self.max_split or not fs.is_file(summary_path):
            return [RangePartition(f, 0, size, gen)]
        if self.fmt == "cassandra":
            from .cassandra1x import read_cassandra_summary_entries \
                as _read_summary
        else:
            _read_summary = codec.read_summary_entries
        parts, prev = [], 0
        for _key, off in _read_summary(summary_path):
            if off - prev > self.max_split:
                parts.append(RangePartition(f, prev, off, gen))
                prev = off
        if size - prev > 0 or not parts:
            parts.append(RangePartition(f, prev, size, gen))
        return parts

    @staticmethod
    def _log_skipped(partition: RangePartition, skipped: list) -> None:
        if skipped[0]:
            import logging

            logging.getLogger(__name__).warning(
                "sstable %s[%d:%d]: skipped %d unsupported column(s) "
                "(on_unsupported=skip)", partition.path, partition.start,
                partition.end, skipped[0])

    def _project_tuples(self, kind: str, tuples):
        """Non-Arrow fallback projection: narrow full-width tuples to
        ``self.project`` (schema-order)."""
        if self.project is None:
            yield from tuples
            return
        names = _SCHEMAS_BY_KIND[kind].fieldNames()
        idx = [names.index(n) for n in self.project]
        for t in tuples:
            yield tuple(t[i] for i in idx)

    def read(self, partition: RangePartition):
        if not partition.path:
            return
        skipped = [0]
        if self.kind == "cells":
            if self.fmt == "cassandra":
                from . import cassandra1x

                cell_iter = ((row.key, c) for row in
                             cassandra1x.read_cassandra_rows(
                                 partition.path, partition.start,
                                 partition.end,
                                 on_unsupported=self.on_unsupported,
                                 skipped=skipped)
                             for c in row.cells)
                if self.skip_values:
                    # 1.x parse walks the full row; prune post-parse
                    from dataclasses import replace as _replace

                    cell_iter = ((k, _replace(c, data=None))
                                 for k, c in cell_iter)
            elif self.use_arrow:
                # windowed fast parse straight into flat Arrow batches
                # (read_cell_batches: unpack_from over in-memory blocks,
                # per-cell flush keeps wide rows bounded)
                cell_iter = None
            else:
                cell_iter = codec.read_cells_flat(
                    partition.path, partition.start, partition.end,
                    skip_values=self.skip_values)
            if self.use_arrow:
                src = (codec.cells_to_batches(
                           cell_iter, generation=partition.generation,
                           project=self.project)
                       if cell_iter is not None else
                       codec.read_cell_batches(
                           partition.path, partition.start, partition.end,
                           generation=partition.generation,
                           skip_values=self.skip_values,
                           project=self.project))
            else:
                src = self._project_tuples("cells", (
                    (key, c.name, c.state, c.data, c.timestamp,
                     c.ttl, c.expiration, partition.generation)
                    for key, c in cell_iter))
            while True:
                try:
                    item = next(src)
                except StopIteration:
                    self._log_skipped(partition, skipped)
                    return
                except (EOFError, IOError, struct.error, KeyError) as exc:
                    if self.ignore_corrupt:
                        return
                    raise IOError(
                        f"corrupt sstable split {partition.path}"
                        f"[{partition.start}:{partition.end}]: {exc}"
                    ) from exc
                yield item  # RecordBatch (arrow) or projected tuple
            return
        if self.kind == "data":
            if self.fmt == "cassandra":
                from . import cassandra1x

                rows = cassandra1x.read_cassandra_rows(
                    partition.path, partition.start, partition.end,
                    on_unsupported=self.on_unsupported, skipped=skipped)
                use_arrow = self.use_arrow
                src = (codec.rows_to_batches(
                           rows, generation=partition.generation,
                           skip_values=self.skip_values,
                           project=self.project)
                       if use_arrow else rows)
            else:
                use_arrow = self.use_arrow
                src = (codec.read_data_batches(
                           partition.path, partition.start, partition.end,
                           generation=partition.generation,
                           skip_values=self.skip_values,
                           project=self.project)
                       if use_arrow else
                       codec.read_data_rows(partition.path, partition.start,
                                            partition.end,
                                            skip_values=self.skip_values))
            if not use_arrow:
                src = self._project_tuples("data", (
                    (item.key,
                     [(c.name, c.state,
                       None if self.skip_values else c.data,
                       c.timestamp, c.ttl, c.expiration)
                      for c in item.cells],
                     partition.generation)
                    for item in src))
            while True:
                try:
                    item = next(src)
                except StopIteration:
                    self._log_skipped(partition, skipped)
                    return
                except (EOFError, IOError, struct.error, KeyError) as exc:
                    if self.ignore_corrupt:
                        return  # drop the remainder of this split
                    raise IOError(
                        f"corrupt sstable split {partition.path}"
                        f"[{partition.start}:{partition.end}]: {exc}"
                    ) from exc
                yield item  # RecordBatch (arrow) or projected tuple
        elif self.kind == "index":
            yield from self._project_tuples("index", (
                (key, pos, partition.generation)
                for key, pos in codec.read_index_entries(
                    partition.path, partition.start, partition.end)))
        elif self.kind == "summary":
            if self.fmt == "cassandra":
                from .cassandra1x import read_cassandra_summary_entries \
                    as _read_summary
            else:
                _read_summary = codec.read_summary_entries
            yield from self._project_tuples("summary", (
                (key, off, partition.generation)
                for key, off in _read_summary(partition.path)))
        elif self.kind == "manifest":
            yield from self._project_tuples(
                "manifest", self._manifest_rows(partition))

    def _manifest_rows(self, partition: RangePartition):
        if self.fmt == "cassandra":
            from .cassandra1x import read_cassandra_compression_info \
                as _read_ci
        else:
            _read_ci = codec.read_compression_info
        for f in _list_files(partition.path, "-Data.db"):
            gen = codec.generation_of(f)
            ci_path = f.replace("-Data.db", "-CompressionInfo.db")
            ci = (_read_ci(ci_path)
                  if fs.exists(ci_path) else None)
            csize = fs.file_size(f)
            base = os.path.basename(f).replace("-Data.db", "")
            for i, p in enumerate(_plan_file(f, self.max_split,
                                             _read_ci)):
                if ci is None or not ci.chunk_offsets:
                    # uncompressed: file space == uncompressed space
                    yield (base, i, p.start, p.end - p.start,
                           0, p.end - p.start, p.end - p.start,
                           None, gen)
                    continue
                # compressed: map the uncompressed row range onto
                # its chunk range, report compressed-file positions
                # (reference DataSplitReducer,
                # GenerateSSTableDataSplits.scala:187-213)
                lth = ci.chunk_length
                first = p.start // lth
                last = max(first, -(-p.end // lth) - 1)
                cstart = ci.chunk_offsets[first]
                cend = (ci.chunk_offsets[last + 1]
                        if last + 1 < len(ci.chunk_offsets) else csize)
                uncomp = (min(ci.uncompressed_length, (last + 1) * lth)
                          - first * lth)
                yield (base, i, cstart, cend - cstart,
                       p.start - first * lth, p.end - p.start,
                       uncomp, ci.chunk_offsets[first:last + 1], gen)


class SSTableStreamReader(DataSourceStreamReader):
    """Streaming scan: each micro-batch reads SSTable generation files
    that appeared in the directory since the last offset — the
    continuous view of the cell model (SURVEY.md §1.3/§2.8).  Feed into
    ``streaming.streaming_lww_cells`` for a continuously-maintained
    merged table.

    Offsets are a compact ``(mtime_ns, basename)`` high-water mark
    plus a BOUNDED tail of recently-seen basenames — the same shape as
    Spark's file source seen-map with compaction, so the
    checkpoint/offset log stays bounded over a long-running stream
    (a full-file-set offset would grow quadratically).  A file is
    covered by an offset when its stamp is ≤ the watermark AND either
    its mtime is older than the offset's grace floor or its basename
    is in the offset's seen tail; a batch is ``covered(end) −
    covered(start)``.  Out-of-order mtimes are common in practice
    (``cp -p`` / ``rsync -t``, object-store restores, a slow writer
    finishing after a newer file was committed): a late file whose
    mtime lands inside the grace window (``late_file_grace_ms``,
    default 60 s) but whose name is not yet in the seen tail is still
    picked up by the next batch.  Only files later than the grace
    window are excluded — and that exclusion is logged.  The seen tail
    is capped at ``seen_files_cap`` names (default 1024); when the cap
    is hit the effective grace floor rises to the oldest retained
    name, keeping offsets O(cap).  ``max_files_per_trigger`` (Spark
    file-source ``maxFilesPerTrigger`` analog) bounds how many NEW
    files each trigger admits, oldest stamp first — a restarted stream
    over a huge backlog drains it across micro-batches instead of
    planning one giant first batch.  Replay after recovery re-derives
    batch membership from the directory listing with the same covered
    rule, so recovered batches match the originally executed ones for
    any file inside the grace window.  Legacy full-file-set and
    bare-watermark offsets from older checkpoints are still
    understood.

    Reads execute on executors, one partition per planned split per new
    file — the driver only lists the directory."""

    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sstable stream source requires a path")
        self.kind = options.get("kind", "data")
        if self.kind not in ("data", "cells"):
            raise ValueError(
                "sstable streaming supports kind=data|cells only")
        self.fmt = options.get("format", "native")
        if self.fmt not in ("native", "cassandra"):
            raise ValueError(f"unknown format: {self.fmt}")
        self.max_split = int(options.get("max_split_bytes",
                                         DEFAULT_MAX_SPLIT_BYTES))
        self.on_unsupported = str(options.get("on_unsupported", "error"))
        if self.on_unsupported not in ("error", "skip"):
            raise ValueError(
                f"on_unsupported must be error|skip, "
                f"got {self.on_unsupported!r}")
        self.grace_ns = int(options.get("late_file_grace_ms",
                                        60_000)) * 1_000_000
        self.seen_cap = int(options.get("seen_files_cap", 1024))
        # Backpressure (Spark file-source maxFilesPerTrigger analog): a
        # restarted stream facing a 100k-generation backlog must not
        # plan one giant first micro-batch.  Oldest-first admission —
        # late files inside the grace window sort first and are drained
        # with priority.
        raw_mft = (options.get("max_files_per_trigger")
                   or options.get("maxFilesPerTrigger")
                   or options.get("maxfilespertrigger"))
        self.max_files = int(raw_mft) if raw_mft is not None else None
        if self.max_files is not None and self.max_files <= 0:
            raise ValueError("max_files_per_trigger must be positive, "
                             f"got {self.max_files}")
        # same explicit projection options as the batch reader
        self.project = _parse_columns(dict(options))
        self.skip_values = str(options.get("skip_values",
                                           "false")).lower() == "true"
        # driver-side, best-effort late-file detection (log only):
        self._known: set[str] = set()
        self._prev_offset: dict | None = None
        # Spark calls initialOffset() ONLY when no checkpoint exists —
        # so its absence before the first latestOffset() means we are
        # restarting from an unknown committed offset, where capped
        # (oldest-first) admission would emit a coverage-REGRESSING
        # offset and poison the offset chain with re-reads of
        # already-committed files.  Fresh starts cap from trigger 1;
        # restarts emit one uncapped (full-coverage) offset — the
        # planned batch is still only covered(end)−covered(checkpoint),
        # i.e. the true backlog — and cap from trigger 2 on.
        self._fresh_start = False

    def _stamped(self) -> dict[str, tuple[int, str]]:
        """basename → (mtime_ns, basename) for every Data.db present."""
        out = {}
        for f in _list_files(self.path, "-Data.db"):
            base = os.path.basename(f)
            try:
                out[base] = (fs.mtime_ns(f), base)
            except OSError:
                continue  # raced with a concurrent delete
        return out

    def initialOffset(self) -> dict:
        self._fresh_start = True
        return {"wm": [0, ""], "floor": 0, "seen": []}

    def latestOffset(self) -> dict:
        stamped = self._stamped()
        if self._prev_offset is not None:
            # a basename first observed NOW but already covered by the
            # last offset arrived with an mtime beyond the grace window
            # — it will never be read; surface that instead of silence
            for b in self._covered(self._prev_offset, stamped):
                if b not in self._known:
                    import logging

                    logging.getLogger(__name__).warning(
                        "sstable stream %s: file %s appeared with mtime "
                        "at-or-below the committed watermark (beyond the "
                        "%d ms grace window) — excluded from the stream",
                        self.path, b, self.grace_ns // 1_000_000)
        self._known.update(stamped)
        if self.max_files is not None and (self._prev_offset is not None
                                           or self._fresh_start):
            prev = self._prev_offset or {"wm": [0, ""], "floor": 0,
                                         "seen": []}
            already = self._covered(prev, stamped)
            backlog = sorted(s for b, s in stamped.items()
                             if b not in already)
            if len(backlog) > self.max_files:
                admit = set(backlog[:self.max_files])
                # cap the offset advance: excluded files all carry
                # stamps above every admitted stamp, so they stay past
                # the new watermark and surface in later triggers
                stamped = {b: s for b, s in stamped.items()
                           if b in already or s in admit}
        wm = max(stamped.values(), default=(0, ""))
        if self._prev_offset is not None and "wm" in self._prev_offset:
            # never regress the watermark (newest covered file may have
            # been compacted away between triggers)
            wm = max(wm, tuple(self._prev_offset["wm"]))
        floor = wm[0] - self.grace_ns
        recent = sorted((s for s in stamped.values() if s[0] >= floor),
                        reverse=True)
        if len(recent) > self.seen_cap:
            recent = recent[:self.seen_cap]
            floor = recent[-1][0]  # cap hit → grace floor rises
        offset = {"wm": list(wm), "floor": floor,
                  "seen": sorted(b for _, b in recent)}
        self._prev_offset = offset
        return offset

    @staticmethod
    def _covered(offset: dict,
                 stamped: dict[str, tuple[int, str]]) -> set[str]:
        """Basenames a given offset has already committed."""
        if "files" in offset:  # legacy full-set offset (pre-watermark)
            return set(offset["files"])
        wm = tuple(offset.get("wm", (0, "")))
        if "seen" not in offset:  # legacy bare-watermark offset
            return {b for b, s in stamped.items() if s <= wm}
        floor = offset.get("floor", 0)
        seen = set(offset["seen"])
        return {b for b, s in stamped.items()
                if s <= wm and (s[0] < floor or b in seen)}

    def _adopt(self, offset: dict | None) -> None:
        """Ratchet the in-memory previous offset from a CHECKPOINTED
        offset Spark hands back through partitions()/commit().

        After a restart ``self._prev_offset`` is gone, so the first
        ``latestOffset()`` would otherwise admit from scratch — with
        ``max_files_per_trigger`` that means re-admitting the OLDEST
        on-disk files the checkpoint already committed and replaying
        them (duplicate data).  Adopting the checkpoint as the floor
        restores exactly-once: the one batch planned against a stale
        end offset computes covered(end)−covered(start) ⊆ ∅ (an empty
        batch, never a duplicate), and every later trigger builds on
        the adopted checkpoint."""
        if not offset:
            return
        if self._prev_offset is None:
            self._prev_offset = offset
            return
        new_wm = tuple(offset.get("wm", (0, "")))
        cur_wm = tuple(self._prev_offset.get("wm", (0, "")))
        if new_wm > cur_wm:
            self._prev_offset = offset

    def partitions(self, start: dict, end: dict):
        self._adopt(start)
        self._adopt(end)
        ci_reader = None
        if self.fmt == "cassandra":
            from .cassandra1x import read_cassandra_compression_info

            ci_reader = read_cassandra_compression_info
        stamped = self._stamped()
        new = sorted(self._covered(end, stamped)
                     - self._covered(start, stamped))
        parts: list[RangePartition] = []
        for base in new:
            full = os.path.join(self.path, base)
            if fs.exists(full):
                parts.extend(_plan_file(full, self.max_split, ci_reader))
        # Spark requires ≥1 partition; empty batch → one no-op marker
        return parts or [RangePartition("", 0, 0, 0)]

    def _rows(self, partition: RangePartition):
        if self.fmt == "cassandra":
            from .cassandra1x import read_cassandra_rows

            return read_cassandra_rows(partition.path, partition.start,
                                       partition.end,
                                       on_unsupported=self.on_unsupported)
        return codec.read_data_rows(partition.path, partition.start,
                                    partition.end,
                                    skip_values=self.skip_values)

    def _project_tuples(self, kind: str, tuples):
        if self.project is None:
            yield from tuples
            return
        names = _SCHEMAS_BY_KIND[kind].fieldNames()
        idx = [names.index(n) for n in self.project]
        for t in tuples:
            yield tuple(t[i] for i in idx)

    def read(self, partition: RangePartition):
        if not partition.path:
            return
        null_data = self.skip_values and self.fmt == "cassandra"
        if self.kind == "cells":
            # flat cell stream: feeds streaming.streaming_lww_cells
            # directly (its input schema), wide-row-safe
            if self.fmt == "cassandra":
                cell_iter = ((row.key, c) for row in self._rows(partition)
                             for c in row.cells)
            else:
                cell_iter = codec.read_cells_flat(
                    partition.path, partition.start, partition.end,
                    skip_values=self.skip_values)
            yield from self._project_tuples("cells", (
                (key, c.name, c.state,
                 None if null_data else c.data, c.timestamp,
                 c.ttl, c.expiration, partition.generation)
                for key, c in cell_iter))
            return
        yield from self._project_tuples("data", (
            (row.key,
             [(c.name, c.state, None if null_data else c.data,
               c.timestamp, c.ttl, c.expiration) for c in row.cells],
             partition.generation)
            for row in self._rows(partition)))

    def commit(self, end: dict) -> None:
        # nothing to clean up, but ratchet the committed offset so a
        # restart-recovery path that commits before the next
        # latestOffset() also restores the admission floor
        self._adopt(end)


@dataclass
class _WriteCommit(WriterCommitMessage):
    files: list


class SSTableWriteTask(DataSourceWriter):
    """Distributed SSTable sink: each task writes its partition as one
    SSTable generation family per distinct ``generation`` value,
    key-sorted (rows are buffered and sorted per task — bounded by the
    ~128 MiB partition size, so no global sort is required; pre-
    ``repartitionByRange("key")`` upstream for globally disjoint key
    ranges per file).

    File naming ``{name}p{partition}-{generation}-Data.db`` keeps the
    generation parseable by ``codec.generation_of`` while making task
    outputs collision-free.  Input schema must be DATA_SCHEMA
    (key, columns, generation).

    ``option("task_suffix", "false")`` drops the ``p{partition}`` task
    tag, producing classic single-family names ``{name}-{gen}-Data.db``
    — valid ONLY when the input is partitioned so no generation spans
    two tasks (e.g. ``df.repartition(n, "generation")``); a collision
    is detected (the target family already exists) and fails the task
    rather than silently interleaving two writers' rows.

    Commit protocol (r7; same as the WARC sink): tasks write every
    family under a hidden dot-prefixed name (readers skip hidden
    files), and only the driver-side ``commit()`` renames them final —
    companions first, ``Data.db`` LAST, so a half-published family is
    invisible to scans (which key off Data.db).  With
    ``task_suffix=true`` (the default) the final names also carry a
    per-job token, so two append jobs can never silently truncate each
    other's files; ``task_suffix=false`` keeps the classic names its
    mode exists for, guarded by the existing collision check.
    """

    def __init__(self, options: dict) -> None:
        import uuid

        self.path = options.get("path")
        if not self.path:
            raise ValueError("sstable sink requires a path")
        self.name = options.get("name", "sstable")
        self.compressed = str(options.get("compressed", "false")).lower() == "true"
        self.task_suffix = str(options.get("task_suffix",
                                           "true")).lower() == "true"
        self.format = options.get("format", "native")
        if self.format not in ("native", "cassandra"):
            raise ValueError(
                f"sstable sink format must be native|cassandra, "
                f"got {self.format!r}")
        self.chunk_length = int(options.get("chunk_length",
                                            codec.DEFAULT_CHUNK_LENGTH))
        self.summary_rate = int(options.get("summary_rate",
                                            codec.DEFAULT_SUMMARY_RATE))
        self.token = uuid.uuid4().hex[:10]  # minted once, driver-side
        # field POSITIONS, filled by the DataSource's writer() from the
        # negotiated schema: pyspark Row name-lookup does a linear
        # __fields__.index() per access, which dominated the task once
        # the codec itself got fast (PERF.md r8) — positional access
        # keeps the conversion loop O(1) per field
        self.row_idx: tuple[int, int, int] | None = None
        self.cell_idx: tuple[int, ...] | None = None

    def set_layout(self, schema) -> None:
        """Record (key, columns, generation) positions and the cell
        struct's (name, state, data, timestamp, ttl, expiration)
        positions from the df's actual schema — order-robust.  An
        unexpected shape (e.g. columns not array<struct>) just leaves
        the positions unset; write() then uses the name-lookup path,
        which reports missing fields the same way it always has."""
        try:
            names = schema.fieldNames()
            row_idx = (names.index("key"), names.index("columns"),
                       names.index("generation"))
            cell_fields = schema[names[row_idx[1]]] \
                .dataType.elementType.fieldNames()
            self.cell_idx = tuple(
                cell_fields.index(f) for f in
                ("name", "state", "data", "timestamp", "ttl",
                 "expiration"))
            self.row_idx = row_idx
        except (ValueError, AttributeError, KeyError):
            self.row_idx = self.cell_idx = None

    def write(self, iterator) -> _WriteCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        by_gen: dict[int, list[codec.Row]] = {}
        Cell, CRow = codec.Cell, codec.Row
        if self.row_idx is not None:
            ki, ci, gi = self.row_idx
            ni, si, di, ti, tli, ei = self.cell_idx
            for row in iterator:
                cells = [Cell(name=bytes(c[ni]), state=c[si],
                              data=(bytes(c[di])
                                    if c[di] is not None else None),
                              timestamp=c[ti], ttl=c[tli],
                              expiration=c[ei])
                         for c in (row[ci] or [])]
                by_gen.setdefault(int(row[gi]), []).append(
                    CRow(key=bytes(row[ki]), cells=cells))
        else:  # layout unknown (direct construction in tests): by name
            for row in iterator:
                cells = [Cell(name=bytes(c["name"]), state=c["state"],
                              data=(bytes(c["data"])
                                    if c["data"] is not None else None),
                              timestamp=c["timestamp"], ttl=c["ttl"],
                              expiration=c["expiration"])
                         for c in (row["columns"] or [])]
                by_gen.setdefault(int(row["generation"]), []).append(
                    CRow(key=bytes(row["key"]), cells=cells))
        files = []  # (tmp hidden path, final path) pairs
        stem = (f"{self.name}p{pid}t{self.token}"
                if self.task_suffix else self.name)
        # hidden (dot → _list_files skips it) and globally unique: the
        # job token separates concurrent JOBS (classic-name stems carry
        # no token of their own), and taskAttemptId — unique across
        # stage REATTEMPTS, unlike attemptNumber — separates a zombie
        # prior attempt from its replacement
        prefix = f".{self.token}x{TaskContext.get().taskAttemptId()}x"
        tmp_stem = prefix + stem
        for gen, rows in sorted(by_gen.items()):
            rows.sort(key=lambda r: r.key)
            if not self.task_suffix:
                target = os.path.join(self.path,
                                      f"{stem}-{gen}-Data.db")
                if fs.exists(target):
                    raise IOError(
                        f"sstable sink task_suffix=false collision: "
                        f"{target} already exists — generation {gen} "
                        f"spans multiple tasks; repartition the input "
                        f"by generation first")
            if self.format == "cassandra":
                from . import cassandra1x

                written = cassandra1x.write_cassandra_family(
                    self.path, tmp_stem, gen, rows,
                    compressed=self.compressed,
                    chunk_length=self.chunk_length,
                    summary_rate=self.summary_rate)
            else:
                writer = codec.SSTableWriter(
                    self.path, tmp_stem, generation=gen,
                    compressed=self.compressed,
                    chunk_length=self.chunk_length,
                    summary_rate=self.summary_rate)
                for r in rows:
                    writer.write_row(r)
                written = list(writer.close().values())
            # publish order inside commit(): companions first, Data.db
            # last — a family without Data.db is invisible to scans
            written.sort(key=lambda f: f.endswith("-Data.db"))
            for tmp in written:
                d, base = os.path.split(tmp)
                files.append((tmp, os.path.join(d, base[len(prefix):])))
        return _WriteCommit(files=files)

    def commit(self, messages) -> None:
        pairs = [p for m in messages if m is not None for p in m.files]
        if not self.task_suffix:
            # classic-name mode only (token-mode finals are job-unique
            # by construction): the per-task existence check cannot
            # see a SIBLING task's in-flight family (both are hidden
            # temps), so re-verify here, before anything is published
            from collections import Counter

            counts = Counter(final for _, final in pairs)
            dupes = sorted(f for f, n in counts.items() if n > 1)
            clashes = dupes or sorted(
                f for f in counts if fs.exists(f))
            if clashes:
                self.abort(messages)  # nothing published yet: clean
                raise IOError(
                    f"sstable sink collision on {clashes[:3]} — a "
                    f"generation spans multiple tasks (repartition by "
                    f"generation for task_suffix=false) or the family "
                    f"already exists at the target")
        for tmp, final in pairs:
            fs.rename(tmp, final)
            # rename preserves the WRITE-time mtime; the streaming
            # source admits by mtime vs watermark, so stamp the
            # PUBLISH time or a slow task's family could land beyond
            # the grace window and be skipped (fs.touch: real utime on
            # bare/file:// paths; object stores stamp the move itself)
            fs.touch(final)
        self._sweep_temps()

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                for tmp, _ in m.files:
                    try:
                        fs.remove(tmp)
                    except OSError:
                        pass
        self._sweep_temps()

    def _sweep_temps(self) -> None:
        """Reap THIS job's orphan hidden families (failed/speculative
        attempts that returned no commit message) — temps in every
        mode start with ``.{token}x``.  Also reap, when older than
        24 HOURS, (a) OTHER jobs' hidden temps (a driver that crashed
        mid-job never ran its own sweep, and nothing else would ever
        clean its leaks) and (b) final-named COMPANIONS whose sibling
        ``Data.db`` is absent — the litter a driver crash mid-commit()
        leaves when it published a family's companions but not its
        Data.db (readers already skip them via ``_orphan_companion``).

        The cutoff is deliberately generous (review r8: the previous
        1h cutoff could reap a LIVE many-wave job's temps — a task
        can finish its family hours before its driver's commit; and a
        live commit publishes companions moments before Data.db).
        Mis-sweeping a live temp fails that job's commit loudly (the
        rename source is gone), never corrupts data — but loud
        failures on 100 TB jobs are expensive, so err long."""
        import re
        import time

        stale_re = re.compile(r"^\.[0-9a-f]{10}x\d+x.*\.db$")
        cutoff_ns = (time.time() - 24 * 3600) * 1e9

        def older_than_cutoff(f: str) -> bool:
            try:
                return fs.mtime_ns(f) < cutoff_ns
            except OSError:
                return False

        for f in fs.list_dir(self.path) if fs.exists(self.path) else []:
            name = os.path.basename(f)
            mine = name.startswith(f".{self.token}x") \
                and name.endswith(".db")
            stale = (not mine and stale_re.match(name)
                     and older_than_cutoff(f))
            orphan = (not name.startswith(".")
                      and _orphan_companion(f)
                      and older_than_cutoff(f))
            if mine or stale or orphan:
                try:
                    fs.remove(f)
                except OSError:
                    pass


class SSTableDataSource(DataSource):
    """``spark.read.format("sstable")``.

    Options:
      path             directory (recursed) or single file
      kind             data | cells | index | summary | manifest
                       (default data; cells = one flat record per cell,
                       wide-row-safe)
      format           native | cassandra  (real 1.x files, incl. the
                       persisted IndexSummary layout of Summary.db —
                       writeInt count + writeUTF key / writeLong
                       offset pairs; Summary samples also drive
                       Index.db split planning for files over
                       max_split_bytes, mirroring the reference's
                       GenerateSSTableIndexSplits job)
      max_split_bytes  target uncompressed split size (default 128 MiB)
      on_unsupported   error | skip  (format=cassandra: counter /
                       range-tombstone columns; skip logs a count)
    """

    @classmethod
    def name(cls) -> str:
        return "sstable"

    def schema(self) -> StructType:
        kind = self.options.get("kind", "data")
        full = _SCHEMAS_BY_KIND[kind]
        project = _parse_columns(dict(self.options))
        if project is None:
            return full
        fields = {f.name: f for f in full.fields}
        return StructType([fields[n] for n in project])

    def reader(self, schema: StructType) -> SSTableReader:
        return SSTableReader(dict(self.options))

    def streamReader(self, schema: StructType) -> SSTableStreamReader:
        return SSTableStreamReader(dict(self.options))

    def writer(self, schema: StructType, overwrite: bool) -> SSTableWriteTask:
        names = set(schema.fieldNames())
        if not {"key", "columns", "generation"} <= names:
            raise ValueError(
                "sstable sink requires (key, columns, generation) — got "
                f"{sorted(names)}")
        if overwrite:
            import os.path as _osp
            import re as _re

            path = self.options.get("path", "")
            for f in fs.list_files(path, ".db"):
                # TOP-LEVEL files only: overwrite replaces the table at
                # this path, never sstables in nested subdirectories
                # (fs.list_files is recursive; ADVICE r4 — preserve the
                # original glob(path/*.db) delete scope)
                if _osp.dirname(f.rstrip("/")) != path.rstrip("/"):
                    continue
                if _re.search(
                        r"-(Data|Index|Summary|CompressionInfo|Filter)\.db$",
                        f):
                    fs.remove(f)
        task = SSTableWriteTask(dict(self.options))
        task.set_layout(schema)
        return task


def ship_package(spark) -> None:
    """Ship this package to Spark's Python workers via ``addPyFile``.

    Needed by anything unpickled inside worker processes — the
    DataSource itself, pandas UDF / mapInPandas closures referencing
    package modules — since workers' ``sys.path`` does not necessarily
    include this package's location (it is not site-installed).
    Idempotent per session; the zip name is content-addressed so stale
    caches from earlier package versions are never shipped."""
    import hashlib

    import sstable_hadoop_spark

    pkg_dir = os.path.dirname(os.path.dirname(
        os.path.abspath(sstable_hadoop_spark.__file__)))
    sources = []
    for root, _dirs, files in os.walk(
            os.path.join(pkg_dir, "sstable_hadoop_spark")):
        for fn in sorted(files):
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                st = os.stat(full)
                sources.append((full, os.path.relpath(full, pkg_dir),
                                st.st_mtime_ns, st.st_size))
    digest = hashlib.md5(repr([(s[1], s[2], s[3])
                               for s in sources]).encode()).hexdigest()[:12]
    if getattr(spark, "_sstable_pkg_digest", None) == digest:
        return
    zip_path = os.path.join(tempfile.gettempdir(),
                            f"sstable_hadoop_spark_pkg_{digest}.zip")
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path + ".tmp", "w") as zf:
            for full, rel, _mt, _sz in sources:
                zf.write(full, rel)
        os.replace(zip_path + ".tmp", zip_path)
    spark.sparkContext.addPyFile(zip_path)
    # Streaming source runner processes are spawned BY THE JVM with the
    # environment captured at JVM launch, so mutating os.environ here
    # cannot reach them — only the pre-JVM PYTHONPATH export in
    # plans.session_builder() does.  Streaming reads of this source
    # therefore require the session factory (get_session()); batch
    # reads and UDFs are covered by the addPyFile above either way.
    spark._sstable_pkg_digest = digest


def register(spark) -> None:
    """Idempotently register the source with a SparkSession."""
    ship_package(spark)
    try:
        # pushFilters() on a Python reader requires this flag; without it
        # Spark refuses to plan ANY read of the source.
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass
    from .txlog_stream import TxlogFeedDataSource
    from .warc import WarcDataSource

    for source in (SSTableDataSource, WarcDataSource,
                   TxlogFeedDataSource):
        try:
            spark.dataSource.register(source)
        except Exception as exc:  # already registered
            if "already" not in str(exc).lower():
                raise
            # Spark quirk (observed on 4.1): after session A registers,
            # a sibling newSession() B gets DATA_SOURCE_ALREADY_EXISTS
            # from registerPython — yet B's own sessionState manager
            # has no entry, so reads still fail NOT_FOUND.  Register
            # straight into THIS session's DataSourceManager.
            try:
                mgr = (spark._jsparkSession.sessionState()
                       .dataSourceManager())
                name = source.name()
                if not mgr.dataSourceExists(name):
                    from pyspark.sql.udf import _wrap_function

                    sc = spark.sparkContext
                    ds = getattr(
                        sc._jvm,
                        "org.apache.spark.sql.execution.datasources"
                        ".v2.python.UserDefinedPythonDataSource",
                    )(_wrap_function(sc, source))
                    mgr.registerDataSource(name, ds)
            except Exception as inner:
                # The fallback drives Spark-private APIs observed on
                # 4.1; if an upgrade moves them this must not be a
                # silent no-op — surface it so the eventual NOT_FOUND
                # read failure has a diagnosis attached.
                import warnings

                warnings.warn(
                    f"sibling-session registration fallback for "
                    f"{source.name()!r} failed on Spark "
                    f"{spark.version} ({type(inner).__name__}: "
                    f"{inner}); reads in this session may fail with "
                    f"DATA_SOURCE_NOT_FOUND",
                    RuntimeWarning, stacklevel=2)
