"""SSTable binary codec — writer + reader for the Cassandra-1.x-style
on-disk family ``*-Data.db`` / ``*-Index.db`` / ``*-Summary.db`` /
``*-CompressionInfo.db``.

The reference consumes these files through the external (unvendored)
library ``com.tehasdf:scala-sstable-reader`` (reference pom.xml:73-77),
so the byte layout here is our own Cassandra-1.x-inspired format.  What
matters — and what is reproduced exactly — is the *data model* the
reference reads out of these files:

- wide row = ``(key: bytes, ordered cells)``
  (reference SSTableDataRecordReader.scala:26,62-78)
- cell = NORMAL ``(name, data, timestamp)`` | DELETED ``(name,
  timestamp)`` | EXPIRING ``(name, data, ttl_secs, expiration_ms,
  timestamp)`` (reference SSTableDataRecordReader.scala:66-71,
  WritableColumn.java:12-21; ttl in seconds, expiration in ms)
- Index.db = ``(key, byte offset of the row in Data.db)``
  (reference SSTableIndexRecordReader.scala:51)
- Summary.db = every Nth index entry with its offset *into Index.db*
  (reference GenerateSSTableIndexSplits.scala:75-91 walks these)
- CompressionInfo.db = chunk length + ascending compressed chunk
  offsets; Data.db is a sequence of independently-compressed
  fixed-size-uncompressed chunks (reference
  GenerateSSTableDataSplits.scala:129-135,180-192)

Layout (all integers big-endian):

Data.db (uncompressed logical stream; rows start at offset 0):
    row   := u16 key_len, key, u32 n_cells, cell*
    cell  := u16 name_len, name, u8 state(0=NORMAL 1=DELETED 2=EXPIRING),
             i64 timestamp_us,
             [EXPIRING only] i64 ttl_secs, i64 expiration_ms,
             [not DELETED]   u32 data_len, data

Index.db:    entry := u16 key_len, key, u64 data_offset
Summary.db:  u32 sample_rate, then entry := u16 key_len, key, u64 index_offset
CompressionInfo.db:
    u8 algo_len, algo(ascii), u32 chunk_length, u64 uncompressed_length,
    u32 n_chunks, u64 compressed_offset * n_chunks
Compressed Data.db: per chunk — compressed bytes then u32 crc32 of the
    compressed bytes (mirrors Cassandra's per-chunk checksum).
"""

from __future__ import annotations

import io
import os
import re
import struct
import zlib
from dataclasses import dataclass, field
from typing import BinaryIO, Iterable, Iterator

from . import fs

try:  # pyarrow ships snappy/lz4/zstd codecs; no python-snappy needed
    import pyarrow as _pa

    def _compress(data: bytes, algo: str) -> bytes:
        if algo == "deflate":  # zlib stream (Cassandra DeflateCompressor)
            return zlib.compress(data)
        return _pa.compress(data, codec=algo, asbytes=True)

    def _decompress(data: bytes, algo: str, uncompressed_size: int) -> bytes:
        if algo == "deflate":
            return zlib.decompress(data)
        return _pa.decompress(data, decompressed_size=uncompressed_size,
                              codec=algo, asbytes=True)

    _HAVE_CODECS = True
except ImportError:  # pragma: no cover - pyarrow is a hard dep of pyspark
    _HAVE_CODECS = False

    def _compress(data: bytes, algo: str) -> bytes:
        if algo not in ("zlib", "deflate"):
            raise RuntimeError("pyarrow unavailable; only zlib supported")
        return zlib.compress(data)

    def _decompress(data: bytes, algo: str, uncompressed_size: int) -> bytes:
        if algo not in ("zlib", "deflate"):
            raise RuntimeError("pyarrow unavailable; only zlib supported")
        return zlib.decompress(data)


STATE_NORMAL = "NORMAL"
STATE_DELETED = "DELETED"
STATE_EXPIRING = "EXPIRING"
_STATE_TO_CODE = {STATE_NORMAL: 0, STATE_DELETED: 1, STATE_EXPIRING: 2}
_CODE_TO_STATE = {v: k for k, v in _STATE_TO_CODE.items()}

DEFAULT_CHUNK_LENGTH = 64 * 1024  # Cassandra default chunk_length_kb=64
DEFAULT_SUMMARY_RATE = 128        # Cassandra default index_interval

_DATA_SUFFIX = "-Data.db"
_GENERATION_RE = re.compile(r"-(\d+)-Data\.db$")


@dataclass
class Cell:
    """One cell; the 3-variant algebraic type of the reference
    (SSTableDataRecordReader.scala:66-71) flattened with a state tag the
    way the Pig loader flattens it (SSTableDataLoader.scala:56-60)."""

    name: bytes
    state: str = STATE_NORMAL
    data: bytes | None = b""
    timestamp: int = 0            # microseconds (Cassandra writetime)
    ttl: int | None = None        # seconds   (EXPIRING only)
    expiration: int | None = None # ms epoch  (EXPIRING only)

    def __post_init__(self) -> None:
        if self.state == STATE_DELETED:
            self.data = None
        if self.state != STATE_EXPIRING:
            self.ttl = None
            self.expiration = None


@dataclass
class Row:
    key: bytes
    cells: list[Cell] = field(default_factory=list)


# ---------------------------------------------------------------------------
# Writing
# ---------------------------------------------------------------------------

def _encode_cell(cell: Cell) -> bytes:
    name = cell.name
    if cell.state == STATE_NORMAL:  # hot path: one struct call
        data = cell.data or b""
        return struct.pack(f">H{len(name)}sBqI", len(name), name, 0,
                           cell.timestamp, len(data)) + data
    if cell.state == STATE_EXPIRING:
        data = cell.data or b""
        return struct.pack(
            f">H{len(name)}sBqqqI", len(name), name, 2, cell.timestamp,
            cell.ttl or 0, cell.expiration or 0, len(data)) + data
    return struct.pack(f">H{len(name)}sBq", len(name), name, 1,
                       cell.timestamp)  # DELETED: no value


def _encode_row(row: Row) -> bytes:
    key = row.key
    return (struct.pack(f">H{len(key)}sI", len(key), key, len(row.cells))
            + b"".join(map(_encode_cell, row.cells)))


class SSTableWriter:
    """Writes one SSTable generation: Data/Index/Summary
    (+CompressionInfo when compressed).  File naming
    ``{name}-{generation}-Data.db`` mirrors Cassandra's
    ``ks-cf-version-generation-Component.db`` convention; the companion
    paths derive by suffix rewrite exactly as the reference derives them
    (SSTableDataRecordReader.scala:20, GenerateSSTableDataSplits.scala:218-225).
    """

    def __init__(self, directory: str, name: str, generation: int = 1,
                 compressed: bool = False, algo: str = "snappy",
                 chunk_length: int = DEFAULT_CHUNK_LENGTH,
                 summary_rate: int = DEFAULT_SUMMARY_RATE) -> None:
        self.directory = directory
        self.base = os.path.join(directory, f"{name}-{generation}")
        self.compressed = compressed
        self.algo = algo
        self.chunk_length = chunk_length
        self.summary_rate = summary_rate
        self._data = io.BytesIO()
        self._index: list[tuple[bytes, int]] = []

    def write_row(self, row: Row) -> None:
        self._index.append((row.key, self._data.tell()))
        self._data.write(_encode_row(row))

    def close(self) -> dict[str, str]:
        fs.makedirs(self.directory)
        paths = {}
        raw = self._data.getvalue()

        data_path = self.base + _DATA_SUFFIX
        if self.compressed:
            chunk_offsets: list[int] = []
            with fs.open_output(data_path) as f:
                for start in range(0, max(len(raw), 1), self.chunk_length):
                    chunk_offsets.append(f.tell())
                    comp = _compress(raw[start:start + self.chunk_length], self.algo)
                    f.write(comp)
                    f.write(struct.pack(">I", zlib.crc32(comp) & 0xFFFFFFFF))
            ci_path = self.base + "-CompressionInfo.db"
            with fs.open_output(ci_path) as f:
                algo_b = self.algo.encode("ascii")
                f.write(struct.pack(">B", len(algo_b)))
                f.write(algo_b)
                f.write(struct.pack(">IQI", self.chunk_length, len(raw),
                                    len(chunk_offsets)))
                for off in chunk_offsets:
                    f.write(struct.pack(">Q", off))
            paths["compression_info"] = ci_path
        else:
            with fs.open_output(data_path) as f:
                f.write(raw)
        paths["data"] = data_path

        index_path = self.base + "-Index.db"
        index_offsets: list[int] = []
        with fs.open_output(index_path) as f:
            for key, pos in self._index:
                index_offsets.append(f.tell())
                f.write(struct.pack(">H", len(key)))
                f.write(key)
                f.write(struct.pack(">Q", pos))
        paths["index"] = index_path

        summary_path = self.base + "-Summary.db"
        with fs.open_output(summary_path) as f:
            f.write(struct.pack(">I", self.summary_rate))
            for i in range(0, len(self._index), self.summary_rate):
                key = self._index[i][0]
                f.write(struct.pack(">H", len(key)))
                f.write(key)
                f.write(struct.pack(">Q", index_offsets[i]))
        paths["summary"] = summary_path

        filter_path = self.base + "-Filter.db"
        write_bloom(filter_path, [k for k, _ in self._index])
        paths["filter"] = filter_path
        return paths


def write_sstable(directory: str, name: str, rows: Iterable[Row],
                  generation: int = 1, **kwargs) -> dict[str, str]:
    writer = SSTableWriter(directory, name, generation=generation, **kwargs)
    for row in rows:
        writer.write_row(row)
    return writer.close()


# ---------------------------------------------------------------------------
# Reading
# ---------------------------------------------------------------------------

@dataclass
class CompressionInfo:
    algo: str
    chunk_length: int
    uncompressed_length: int
    chunk_offsets: list[int]


def read_compression_info(path: str) -> CompressionInfo:
    with fs.open_input(path) as f:
        (algo_len,) = struct.unpack(">B", f.read(1))
        algo = f.read(algo_len).decode("ascii")
        chunk_length, uncompressed_length, n_chunks = struct.unpack(
            ">IQI", f.read(16))
        offsets = list(struct.unpack(f">{n_chunks}Q", f.read(8 * n_chunks)))
    return CompressionInfo(algo, chunk_length, uncompressed_length, offsets)


class ChunkedDecompressingReader:
    """Sequential reads over the *uncompressed* view of a compressed
    Data.db, decompressing one chunk at a time.

    Deliberately NOT the reference's strategy: its split reader loads
    the whole compressed byte range into memory and decompresses the
    entire stream at once (SplitSSTableDataRecordReader.scala:58-72),
    an OOM hazard at 256 MiB splits.  Chunked streaming keeps peak
    memory at one chunk (64 KiB default) regardless of split size.
    """

    def __init__(self, f: BinaryIO, info: CompressionInfo,
                 file_size: int | None = None,
                 checksum: str = "crc32") -> None:
        self._f = f
        self._info = info
        if file_size is None:
            f.seek(0, os.SEEK_END)
            file_size = f.tell()
        self._file_size = file_size
        # native chunks carry a CRC32 trailer; real Cassandra 1.x chunks
        # carry Adler32 (CompressedSequentialWriter)
        if checksum not in ("crc32", "adler32"):
            raise ValueError(f"unknown chunk checksum: {checksum}")
        self._cksum = zlib.crc32 if checksum == "crc32" else zlib.adler32
        self._chunk_idx = -1
        self._chunk = b""
        self._chunk_pos = 0  # uncompressed offset of start of current chunk
        self._pos = 0        # current uncompressed position

    def seek(self, uncompressed_offset: int) -> None:
        self._pos = uncompressed_offset

    def tell(self) -> int:
        return self._pos

    def _load_chunk(self, idx: int) -> None:
        offs = self._info.chunk_offsets
        start = offs[idx]
        end = offs[idx + 1] if idx + 1 < len(offs) else self._file_size
        self._f.seek(start)
        blob = self._f.read(end - start)
        comp, crc = blob[:-4], struct.unpack(">I", blob[-4:])[0]
        if self._cksum(comp) & 0xFFFFFFFF != crc:
            raise IOError(f"chunk {idx}: checksum mismatch")
        remaining = self._info.uncompressed_length - idx * self._info.chunk_length
        size = min(self._info.chunk_length, remaining)
        self._chunk = _decompress(comp, self._info.algo, size)
        self._chunk_idx = idx
        self._chunk_pos = idx * self._info.chunk_length

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0 and self._pos < self._info.uncompressed_length:
            idx = self._pos // self._info.chunk_length
            if idx != self._chunk_idx:
                self._load_chunk(idx)
            local = self._pos - self._chunk_pos
            take = self._chunk[local:local + n]
            if not take:
                break
            out += take
            self._pos += len(take)
            n -= len(take)
        return bytes(out)


class _RawReader:
    """Same read/seek/tell surface over an uncompressed file."""

    def __init__(self, f: BinaryIO) -> None:
        self._f = f

    def seek(self, off: int) -> None:
        self._f.seek(off)

    def tell(self) -> int:
        return self._f.tell()

    def read(self, n: int) -> bytes:
        return self._f.read(n)


def _read_exact(reader, n: int) -> bytes | None:
    buf = reader.read(n)
    if len(buf) == 0:
        return None
    if len(buf) != n:
        raise EOFError(f"truncated read: wanted {n}, got {len(buf)}")
    return buf


def _read_cell(reader, skip_value: bool = False) -> Cell:
    """``skip_value`` seeks past the value bytes instead of
    materializing them (data → None) — the codec-level half of the
    scan's ``skip_values`` projection: the stream is still consumed
    sequentially (chunk decompression can't skip I/O) but no bytes
    object is built or shipped."""
    (name_len,) = struct.unpack(">H", _read_exact(reader, 2))
    name = _read_exact(reader, name_len) if name_len else b""
    state_code, timestamp = struct.unpack(">Bq", _read_exact(reader, 9))
    state = _CODE_TO_STATE[state_code]
    ttl = expiration = None
    data: bytes | None = None
    if state == STATE_EXPIRING:
        ttl, expiration = struct.unpack(">qq", _read_exact(reader, 16))
    if state != STATE_DELETED:
        (data_len,) = struct.unpack(">I", _read_exact(reader, 4))
        if skip_value:
            reader.seek(reader.tell() + data_len)
        else:
            data = _read_exact(reader, data_len) if data_len else b""
    return Cell(name=name, state=state, data=data, timestamp=timestamp,
                ttl=ttl, expiration=expiration)


def _open_reader(data_path: str):
    """Return (reader, uncompressed_length).  Auto-detects compression by
    the presence of the companion CompressionInfo.db, like the
    reference's ``sstable.compressed`` switch
    (SSTableDataRecordReader.scala:37-45) but without manual config."""
    ci_path = data_path.replace(_DATA_SUFFIX, "-CompressionInfo.db")
    f = fs.open_input(data_path)
    if fs.exists(ci_path):
        info = read_compression_info(ci_path)
        return ChunkedDecompressingReader(f, info), info.uncompressed_length
    f.seek(0, os.SEEK_END)
    size = f.tell()
    f.seek(0)
    return _RawReader(f), size


def read_data_rows(data_path: str, start: int = 0,
                   end: int | None = None,
                   skip_values: bool = False) -> Iterator[Row]:
    """Iterate rows of one Data.db within uncompressed byte range
    [start, end).  ``start`` must be a row boundary (offset 0 or an
    offset taken from Index.db).  Streams row-at-a-time in O(1) memory,
    like the reference's reader loop (SSTableDataRecordReader.scala:85-97).
    ``skip_values`` seeks past cell value bytes (data → None).
    """
    reader, total = _open_reader(data_path)
    if end is None:
        end = total
    reader.seek(start)
    while reader.tell() < end:
        header = _read_exact(reader, 2)
        if header is None:
            break
        (key_len,) = struct.unpack(">H", header)
        key = _read_exact(reader, key_len) if key_len else b""
        (n_cells,) = struct.unpack(">I", _read_exact(reader, 4))
        cells = [_read_cell(reader, skip_value=skip_values)
                 for _ in range(n_cells)]
        yield Row(key=key, cells=cells)


def read_data_batches(data_path: str, start: int = 0,
                      end: int | None = None, generation: int = 0,
                      rows_per_batch: int = 4096,
                      read_block: int = 8 * 1024 * 1024,
                      skip_values: bool = False,
                      project: tuple[str, ...] | None = None):
    """Iterate ``pyarrow.RecordBatch`` objects over rows of one Data.db
    within uncompressed byte range [start, end) — the vectorized twin of
    ``read_data_rows`` for the Spark DataSource hot path.

    Rows cross from Python-object land into Spark as Arrow columns
    (one IPC transfer per ~``rows_per_batch`` rows) instead of one
    pickled tuple per row, and the parse loop runs ``unpack_from`` over
    an in-memory block instead of per-field file reads.  Memory stays
    bounded: the stream is consumed in ``read_block`` windows (the
    chunked decompressor underneath keeps its one-chunk behavior), and
    a batch is flushed as soon as it reaches ``rows_per_batch``.

    Schema matches ``datasource.DATA_SCHEMA`` + the partition's
    ``generation``: (key binary, columns list<struct>, generation int32).

    Column projection (the pruning the Python DataSource API cannot
    push down itself — the reference reads Index.db for key-only jobs,
    SSTableIndexRecordReader.scala:47-58, but has no way to prune a
    Data.db scan):
    - ``project`` keeps only the named top-level fields; without
      ``columns`` in the projection the parse loop walks cell headers
      purely to find the next row boundary — no cell object, list, or
      bytes slice is ever built, and the Arrow batch carries just the
      projected columns;
    - ``skip_values`` keeps the cell structure but nulls ``data``
      without slicing the value bytes (a key+timestamp scan at full
      cell fidelity).
    The byte stream itself is still consumed sequentially — chunked
    compression means value bytes must be decompressed regardless; the
    savings are materialization, batch width, and transfer.
    """
    import pyarrow as pa

    want = (("key", "columns", "generation") if project is None
            else tuple(project))
    need_cells = "columns" in want

    cell_struct = pa.struct([
        pa.field("name", pa.binary(), nullable=False),
        pa.field("state", pa.string(), nullable=False),
        pa.field("data", pa.binary()),
        pa.field("timestamp", pa.int64(), nullable=False),
        pa.field("ttl", pa.int64()),
        pa.field("expiration", pa.int64()),
    ])
    full_fields = {
        "key": pa.field("key", pa.binary(), nullable=False),
        "columns": pa.field("columns", pa.list_(cell_struct),
                            nullable=False),
        "generation": pa.field("generation", pa.int32(), nullable=False),
    }
    schema = pa.schema([full_fields[n] for n in want])

    reader, total = _open_reader(data_path)
    if end is None:
        end = total
    reader.seek(start)
    remaining = end - start

    buf = b""
    pos = 0
    unpack_from = struct.unpack_from
    code_to_state = _CODE_TO_STATE

    n_rows = 0
    keys: list[bytes] = []
    cell_offsets: list[int] = [0]
    c_name: list[bytes] = []
    c_state: list[str] = []
    c_data: list[bytes | None] = []
    c_ts: list[int] = []
    c_ttl: list[int | None] = []
    c_exp: list[int | None] = []

    def flush():
        nonlocal n_rows
        arrays = {}
        if "key" in want:
            arrays["key"] = pa.array(keys, pa.binary())
        if need_cells:
            struct_arr = pa.StructArray.from_arrays(
                [pa.array(c_name, pa.binary()),
                 pa.array(c_state, pa.string()),
                 pa.array(c_data, pa.binary()),
                 pa.array(c_ts, pa.int64()),
                 pa.array(c_ttl, pa.int64()),
                 pa.array(c_exp, pa.int64())],
                fields=list(cell_struct))
            arrays["columns"] = pa.ListArray.from_arrays(
                pa.array(cell_offsets, pa.int32()), struct_arr)
        if "generation" in want:
            arrays["generation"] = pa.array([generation] * n_rows,
                                            pa.int32())
        batch = pa.RecordBatch.from_arrays([arrays[n] for n in want],
                                           schema=schema)
        n_rows = 0
        keys.clear()
        del cell_offsets[:]
        cell_offsets.append(0)
        c_name.clear(); c_state.clear(); c_data.clear()
        c_ts.clear(); c_ttl.clear(); c_exp.clear()
        return batch

    while True:
        # refill the parse window; drop the consumed prefix
        if remaining > 0 and len(buf) - pos < read_block:
            block = reader.read(min(read_block, remaining))
            if not block and len(buf) == pos:
                break
            remaining -= len(block)
            buf = buf[pos:] + block
            pos = 0
        if pos >= len(buf):
            break
        # parse one row; an incomplete row at the window edge triggers
        # a refill (or a truncation error at true EOF)
        try:
            (key_len,) = unpack_from(">H", buf, pos)
            p = pos + 2
            key = buf[p:p + key_len]
            if len(key) != key_len:
                raise EOFError("truncated key")
            p += key_len
            (n_cells,) = unpack_from(">I", buf, p)
            p += 4
            row_names, row_states = [], []
            row_datas, row_ts = [], []
            row_ttl, row_exp = [], []
            for _ in range(n_cells):
                (name_len,) = unpack_from(">H", buf, p)
                p += 2
                if need_cells:
                    name = buf[p:p + name_len]
                    if len(name) != name_len:
                        raise EOFError("truncated cell name")
                elif p + name_len > len(buf):
                    raise EOFError("truncated cell name")
                p += name_len
                state_code, ts = unpack_from(">Bq", buf, p)
                p += 9
                if state_code not in code_to_state:
                    raise KeyError(f"bad cell state code {state_code}")
                ttl = exp = None
                data: bytes | None = None
                if state_code == 2:  # EXPIRING
                    if need_cells:
                        ttl, exp = unpack_from(">qq", buf, p)
                    elif p + 16 > len(buf):
                        raise EOFError("truncated cell expiry")
                    p += 16
                if state_code != 1:  # not DELETED
                    (data_len,) = unpack_from(">I", buf, p)
                    p += 4
                    if need_cells and not skip_values:
                        data = buf[p:p + data_len]
                        if len(data) != data_len:
                            raise EOFError("truncated cell data")
                    elif p + data_len > len(buf):
                        raise EOFError("truncated cell data")
                    p += data_len
                if need_cells:
                    row_names.append(name)
                    row_states.append(code_to_state[state_code])
                    row_datas.append(data)
                    row_ts.append(ts)
                    row_ttl.append(ttl)
                    row_exp.append(exp)
        except (struct.error, EOFError):
            if remaining > 0:
                # row straddles the window edge — widen and retry
                block = reader.read(min(read_block, remaining))
                if block:
                    remaining -= len(block)
                    buf = buf[pos:] + block
                    pos = 0
                    continue
            # truncated stream: surface the readable prefix first so
            # ignore_corrupt_files keeps it, then fail the iterator
            if n_rows:
                yield flush()
            raise EOFError(f"truncated row at uncompressed offset "
                           f"{start + pos} of {data_path}")
        pos = p
        n_rows += 1
        if "key" in want:
            keys.append(key)
        if need_cells:
            c_name.extend(row_names)
            c_state.extend(row_states)
            c_data.extend(row_datas)
            c_ts.extend(row_ts)
            c_ttl.extend(row_ttl)
            c_exp.extend(row_exp)
            cell_offsets.append(len(c_name))
        if n_rows >= rows_per_batch:
            yield flush()
    if n_rows:
        yield flush()


def read_cells_flat(data_path: str, start: int = 0,
                    end: int | None = None,
                    skip_values: bool = False) -> Iterator[tuple]:
    """Iterate (key, Cell) pairs of one Data.db within uncompressed
    byte range [start, end) WITHOUT materializing per-row cell lists —
    memory is O(1) per cell even for pathological million-cell wide
    rows, where the nested ``read_data_rows`` shape must hold the whole
    row.  ``skip_values`` seeks past value bytes (data → None)."""
    reader, total = _open_reader(data_path)
    if end is None:
        end = total
    reader.seek(start)
    while reader.tell() < end:
        header = _read_exact(reader, 2)
        if header is None:
            break
        (key_len,) = struct.unpack(">H", header)
        key = _read_exact(reader, key_len) if key_len else b""
        (n_cells,) = struct.unpack(">I", _read_exact(reader, 4))
        for _ in range(n_cells):
            yield key, _read_cell(reader, skip_value=skip_values)


def read_cell_batches(data_path: str, start: int = 0,
                      end: int | None = None, generation: int = 0,
                      cells_per_batch: int = 8192,
                      read_block: int = 8 * 1024 * 1024,
                      skip_values: bool = False,
                      project: tuple[str, ...] | None = None):
    """Windowed fast parse of one Data.db straight into FLAT cell
    ``pyarrow.RecordBatch`` objects (CELLS_SCHEMA order) — the
    ``kind=cells`` twin of ``read_data_batches``: ``unpack_from`` over
    an in-memory block instead of per-field file reads, one Arrow
    transfer per ~``cells_per_batch`` cells.  Batches flush on CELL
    count (checked after every cell, so a single wide row spreads
    across batches — bounded memory where the nested shape cannot be).
    ``project``/``skip_values`` as in ``read_data_batches``."""
    import pyarrow as pa

    all_names = ("key", "name", "state", "data", "timestamp", "ttl",
                 "expiration", "generation")
    want = all_names if project is None else tuple(project)
    types = {"key": pa.binary(), "name": pa.binary(),
             "state": pa.string(), "data": pa.binary(),
             "timestamp": pa.int64(), "ttl": pa.int64(),
             "expiration": pa.int64(), "generation": pa.int32()}
    nullable = {"data", "ttl", "expiration"}
    schema = pa.schema([pa.field(n, types[n], nullable=n in nullable)
                        for n in want])

    reader, total = _open_reader(data_path)
    if end is None:
        end = total
    reader.seek(start)
    remaining = end - start

    buf = b""
    pos = 0
    unpack_from = struct.unpack_from
    code_to_state = _CODE_TO_STATE

    cols: dict[str, list] = {n: [] for n in want if n != "generation"}
    n_out = 0

    def flush():
        nonlocal n_out
        arrays = [pa.array(cols[n], types[n]) if n != "generation"
                  else pa.array([generation] * n_out, pa.int32())
                  for n in want]
        batch = pa.RecordBatch.from_arrays(arrays, schema=schema)
        n_out = 0
        for c in cols.values():
            c.clear()
        return batch

    def walk_row(b: bytes, at: int) -> int:
        """Bounds-only walk: offset just past the row at ``at``, or
        raise EOFError/struct.error if the window ends mid-row."""
        (key_len,) = unpack_from(">H", b, at)
        p = at + 2 + key_len
        (n_cells,) = unpack_from(">I", b, p)
        p += 4
        for _ in range(n_cells):
            (name_len,) = unpack_from(">H", b, p)
            p += 2 + name_len
            state_code, _ts = unpack_from(">Bq", b, p)
            p += 9
            if state_code not in code_to_state:
                raise KeyError(f"bad cell state code {state_code}")
            if state_code == 2:
                p += 16
            if state_code != 1:
                (data_len,) = unpack_from(">I", b, p)
                p += 4 + data_len
        if p > len(b):
            raise EOFError("row extends past window")
        return p

    while True:
        if remaining > 0 and len(buf) - pos < read_block:
            block = reader.read(min(read_block, remaining))
            if not block and len(buf) == pos:
                break
            remaining -= len(block)
            buf = buf[pos:] + block
            pos = 0
        if pos >= len(buf):
            break
        # phase 1: ensure the WHOLE row is inside the buffer (cheap
        # header walk; widens the window on a row that straddles it),
        # so phase 2 can flush mid-row without any rollback concern —
        # wide rows spread across batches with bounded cell memory
        try:
            row_end = walk_row(buf, pos)
        except (struct.error, EOFError):
            if remaining > 0:
                block = reader.read(min(read_block, remaining))
                if block:
                    remaining -= len(block)
                    buf = buf[pos:] + block
                    pos = 0
                    continue
            if n_out:
                yield flush()
            raise EOFError(f"truncated row at uncompressed offset "
                           f"{start + pos} of {data_path}")
        # phase 2: materialize + emit (no bounds re-checks needed)
        (key_len,) = unpack_from(">H", buf, pos)
        p = pos + 2
        key = buf[p:p + key_len]
        p += key_len
        (n_cells,) = unpack_from(">I", buf, p)
        p += 4
        for _ in range(n_cells):
            (name_len,) = unpack_from(">H", buf, p)
            p += 2
            name = buf[p:p + name_len]
            p += name_len
            state_code, ts = unpack_from(">Bq", buf, p)
            p += 9
            ttl = exp = None
            data: bytes | None = None
            if state_code == 2:  # EXPIRING
                ttl, exp = unpack_from(">qq", buf, p)
                p += 16
            if state_code != 1:  # not DELETED
                (data_len,) = unpack_from(">I", buf, p)
                p += 4
                if not skip_values:
                    data = buf[p:p + data_len]
                p += data_len
            if "key" in cols:
                cols["key"].append(key)
            if "name" in cols:
                cols["name"].append(name)
            if "state" in cols:
                cols["state"].append(code_to_state[state_code])
            if "data" in cols:
                cols["data"].append(data)
            if "timestamp" in cols:
                cols["timestamp"].append(ts)
            if "ttl" in cols:
                cols["ttl"].append(ttl)
            if "expiration" in cols:
                cols["expiration"].append(exp)
            n_out += 1
            if n_out >= cells_per_batch:
                yield flush()
        pos = row_end
    if n_out:
        yield flush()


def cells_to_batches(cell_iter: Iterator[tuple], generation: int = 0,
                     cells_per_batch: int = 8192,
                     project: tuple[str, ...] | None = None):
    """(key, Cell) iterator → flat ``pyarrow.RecordBatch`` stream
    (CELLS_SCHEMA: one record per cell).  Batches flush on CELL count,
    so a single wide row spreads across batches — bounded executor
    memory where the nested schema cannot be.  ``project`` keeps only
    the named fields (Arrow batches narrow accordingly)."""
    import pyarrow as pa

    full = {
        "key": (pa.field("key", pa.binary(), nullable=False),
                lambda key, cell: key),
        "name": (pa.field("name", pa.binary(), nullable=False),
                 lambda key, cell: cell.name),
        "state": (pa.field("state", pa.string(), nullable=False),
                  lambda key, cell: cell.state),
        "data": (pa.field("data", pa.binary()),
                 lambda key, cell: cell.data),
        "timestamp": (pa.field("timestamp", pa.int64(), nullable=False),
                      lambda key, cell: cell.timestamp),
        "ttl": (pa.field("ttl", pa.int64()),
                lambda key, cell: cell.ttl),
        "expiration": (pa.field("expiration", pa.int64()),
                       lambda key, cell: cell.expiration),
    }
    want = (("key", "name", "state", "data", "timestamp", "ttl",
             "expiration", "generation") if project is None
            else tuple(project))
    getters = [full[n][1] for n in want if n != "generation"]
    schema = pa.schema([full[n][0] if n != "generation" else
                        pa.field("generation", pa.int32(), nullable=False)
                        for n in want])
    cols: list[list] = [[] for _ in getters]
    n_cells = 0

    def flush():
        nonlocal n_cells
        arrays = []
        i = 0
        for n in want:
            if n == "generation":
                arrays.append(pa.array([generation] * n_cells, pa.int32()))
            else:
                arrays.append(pa.array(cols[i], schema.field(n).type))
                i += 1
        batch = pa.RecordBatch.from_arrays(arrays, schema=schema)
        n_cells = 0
        for c in cols:
            c.clear()
        return batch

    for key, cell in cell_iter:
        for c, get in zip(cols, getters):
            c.append(get(key, cell))
        n_cells += 1
        if n_cells >= cells_per_batch:
            yield flush()
    if n_cells:
        yield flush()


def rows_to_batches(row_iter: Iterator[Row], generation: int = 0,
                    rows_per_batch: int = 4096,
                    skip_values: bool = False,
                    project: tuple[str, ...] | None = None):
    """Generic ``Row`` iterator → ``pyarrow.RecordBatch`` adapter
    (DATA_SCHEMA + generation).  Arrow transfer for read paths whose
    parse loop is not window-vectorized — e.g. ``format=cassandra``
    (cassandra1x.read_cassandra_rows): the per-row parse stays Python,
    but rows cross into Spark as Arrow columns instead of one pickled
    tuple each.  ``project``/``skip_values`` prune post-parse (the 1.x
    parser must still walk the full row), narrowing the Arrow
    transfer."""
    import pyarrow as pa

    cell_struct = pa.struct([
        pa.field("name", pa.binary(), nullable=False),
        pa.field("state", pa.string(), nullable=False),
        pa.field("data", pa.binary()),
        pa.field("timestamp", pa.int64(), nullable=False),
        pa.field("ttl", pa.int64()),
        pa.field("expiration", pa.int64()),
    ])
    schema = pa.schema([
        pa.field("key", pa.binary(), nullable=False),
        pa.field("columns", pa.list_(cell_struct), nullable=False),
        pa.field("generation", pa.int32(), nullable=False),
    ])

    want = (("key", "columns", "generation") if project is None
            else tuple(project))
    need_cells = "columns" in want
    schema = pa.schema([schema.field(n) for n in want])

    n_rows = 0
    keys: list[bytes] = []
    cell_offsets: list[int] = [0]
    c_name: list[bytes] = []
    c_state: list[str] = []
    c_data: list[bytes | None] = []
    c_ts: list[int] = []
    c_ttl: list[int | None] = []
    c_exp: list[int | None] = []

    def flush():
        nonlocal n_rows
        arrays = {}
        if "key" in want:
            arrays["key"] = pa.array(keys, pa.binary())
        if need_cells:
            struct_arr = pa.StructArray.from_arrays(
                [pa.array(c_name, pa.binary()),
                 pa.array(c_state, pa.string()),
                 pa.array(c_data, pa.binary()),
                 pa.array(c_ts, pa.int64()),
                 pa.array(c_ttl, pa.int64()),
                 pa.array(c_exp, pa.int64())],
                fields=list(cell_struct))
            arrays["columns"] = pa.ListArray.from_arrays(
                pa.array(cell_offsets, pa.int32()), struct_arr)
        if "generation" in want:
            arrays["generation"] = pa.array([generation] * n_rows,
                                            pa.int32())
        batch = pa.RecordBatch.from_arrays([arrays[n] for n in want],
                                           schema=schema)
        n_rows = 0
        keys.clear()
        del cell_offsets[:]
        cell_offsets.append(0)
        c_name.clear(); c_state.clear(); c_data.clear()
        c_ts.clear(); c_ttl.clear(); c_exp.clear()
        return batch

    for row in row_iter:
        n_rows += 1
        if "key" in want:
            keys.append(row.key)
        if need_cells:
            for c in row.cells:
                c_name.append(c.name)
                c_state.append(c.state)
                c_data.append(None if skip_values else c.data)
                c_ts.append(c.timestamp)
                c_ttl.append(c.ttl)
                c_exp.append(c.expiration)
            cell_offsets.append(len(c_name))
        if n_rows >= rows_per_batch:
            yield flush()
    if n_rows:
        yield flush()


def read_index_entries(index_path: str, start: int = 0,
                       end: int | None = None) -> Iterator[tuple[bytes, int]]:
    """Iterate (key, data_offset) from an Index.db
    (reference SSTableIndexRecordReader.scala:47-58)."""
    with fs.open_input(index_path) as f:
        if end is None:
            f.seek(0, os.SEEK_END)
            end = f.tell()
        f.seek(start)
        while f.tell() < end:
            header = f.read(2)
            if not header:
                break
            (key_len,) = struct.unpack(">H", header)
            key = f.read(key_len)
            (pos,) = struct.unpack(">Q", f.read(8))
            yield key, pos


def read_summary_entries(summary_path: str) -> Iterator[tuple[bytes, int]]:
    """Iterate (key, index_offset) samples from a Summary.db
    (reference GenerateSSTableIndexSplits.scala:75-91)."""
    with fs.open_input(summary_path) as f:
        f.read(4)  # sample rate header
        while True:
            header = f.read(2)
            if not header:
                break
            (key_len,) = struct.unpack(">H", header)
            key = f.read(key_len)
            (off,) = struct.unpack(">Q", f.read(8))
            yield key, off


# ---------------------------------------------------------------------------
# Bloom filter (-Filter.db) — Cassandra's per-SSTable key membership
# component.
#
# v1 layout: u32 m_bits, u8 k_hashes, ceil(m/8) filter bytes; k
# INDEPENDENT md5(i || key) positions per key.
# v2 layout (r8): u32 0xFFFFFFFF sentinel (impossible as a real v1
# m_bits — the builder sizes by key count), u8 version=2, then the v1
# header+bits; positions by Kirsch–Mitzenmaier DOUBLE HASHING — one
# md5 per key split into (h1, h2|1), position_i = (h1 + i·h2) mod m —
# which profiling showed cuts the k md5 calls per key to one (the
# bloom build was 48% of the native sink's write time) at an
# asymptotically equivalent false-positive rate.
#
# The reader dispatches on the sentinel, so Filter.db files written by
# earlier rounds keep pruning CORRECTLY (a silent scheme change would
# produce false negatives — pruning files that contain the key).
# ---------------------------------------------------------------------------

import hashlib as _hashlib
import math as _math

_BLOOM_V2_SENTINEL = 0xFFFFFFFF


def _bloom_positions_v1(key: bytes, k: int, m_bits: int) -> list[int]:
    return [int.from_bytes(
        _hashlib.md5(bytes([i]) + key).digest()[:8], "big") % m_bits
        for i in range(k)]


def _bloom_positions(key: bytes, k: int, m_bits: int) -> list[int]:
    d = _hashlib.md5(key).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1  # odd → full-cycle stride
    return [(h1 + i * h2) % m_bits for i in range(k)]


def build_bloom(keys: list[bytes], fp_rate: float = 0.01) -> tuple[bytes, int, int]:
    """Return (filter_bytes, m_bits, k) sized for ``fp_rate``
    (v2 double-hashing positions)."""
    n = max(len(keys), 1)
    m_bits = max(8, int(-n * _math.log(fp_rate) / (_math.log(2) ** 2)))
    k = max(1, round(m_bits / n * _math.log(2)))
    bits = bytearray((m_bits + 7) // 8)
    for key in keys:
        for pos in _bloom_positions(key, k, m_bits):
            bits[pos // 8] |= 1 << (pos % 8)
    return bytes(bits), m_bits, k


def write_bloom(path: str, keys: list[bytes], fp_rate: float = 0.01) -> None:
    bits, m_bits, k = build_bloom(keys, fp_rate)
    with fs.open_output(path) as f:
        f.write(struct.pack(">IB", _BLOOM_V2_SENTINEL, 2))
        f.write(struct.pack(">IB", m_bits, k))
        f.write(bits)


class BloomFilter:
    def __init__(self, path: str) -> None:
        with fs.open_input(path) as f:
            first, ver = struct.unpack(">IB", f.read(5))
            if first == _BLOOM_V2_SENTINEL:
                if ver != 2:
                    raise ValueError(
                        f"unknown Filter.db version {ver} in {path}")
                self.version = 2
                self.m_bits, self.k = struct.unpack(">IB", f.read(5))
            else:  # legacy v1: those 5 bytes WERE the header
                self.version = 1
                self.m_bits, self.k = first, ver
            self.bits = f.read()

    def might_contain(self, key: bytes) -> bool:
        positions = (_bloom_positions if self.version == 2
                     else _bloom_positions_v1)
        for pos in positions(key, self.k, self.m_bits):
            if not (self.bits[pos // 8] >> (pos % 8)) & 1:
                return False
        return True


def generation_of(data_path: str) -> int:
    m = _GENERATION_RE.search(os.path.basename(data_path))
    return int(m.group(1)) if m else 0
