"""Codec round-trip + split-invariant tests (SURVEY.md §5.3/§5.4)."""

from __future__ import annotations

import os

import pytest

from sstable_hadoop_spark.sources import codec
from sstable_hadoop_spark.sources.codec import (
    Cell,
    Row,
    SSTableWriter,
    read_data_rows,
    read_index_entries,
    read_summary_entries,
)


def _rows_equal(a: Row, b: Row) -> bool:
    if a.key != b.key or len(a.cells) != len(b.cells):
        return False
    return all(x == y for x, y in zip(a.cells, b.cells))


@pytest.mark.parametrize("compressed", [False, True])
def test_roundtrip(tmp_path, cell_fixture, compressed):
    rows = [row for g, row in cell_fixture if g == 1]
    w = SSTableWriter(str(tmp_path), "rt", generation=1,
                      compressed=compressed, chunk_length=1024)
    for row in rows:
        w.write_row(row)
    paths = w.close()
    back = list(read_data_rows(paths["data"]))
    assert len(back) == len(rows)
    for a, b in zip(rows, back):
        assert _rows_equal(a, b)


def test_index_points_at_row_starts(tmp_path, cell_fixture):
    rows = [row for g, row in cell_fixture if g == 2]
    w = SSTableWriter(str(tmp_path), "idx", generation=2)
    for row in rows:
        w.write_row(row)
    paths = w.close()
    entries = list(read_index_entries(paths["index"]))
    assert [k for k, _ in entries] == [r.key for r in rows]
    # reading from each indexed offset must yield exactly that row first
    for (key, pos), expect in zip(entries, rows):
        got = next(read_data_rows(paths["data"], start=pos))
        assert got.key == key
        assert _rows_equal(got, expect)


def test_summary_samples_index(tmp_path, cell_fixture):
    rows = [row for g, row in cell_fixture if g == 1]
    w = SSTableWriter(str(tmp_path), "sm", generation=1, summary_rate=4)
    for row in rows:
        w.write_row(row)
    paths = w.close()
    index = list(read_index_entries(paths["index"]))
    summary = list(read_summary_entries(paths["summary"]))
    assert [k for k, _ in summary] == [k for k, _ in index][::4]
    # index offsets recorded in the summary must be readable seek points
    for key, ioff in summary:
        k2, _pos = next(read_index_entries(paths["index"], start=ioff))
        assert k2 == key


def test_compressed_random_access(tmp_path):
    """Chunked reader must serve reads from arbitrary uncompressed
    offsets (the split-reading path)."""
    rows = [Row(key=f"k{i:05d}".encode(),
                cells=[Cell(name=b"n", data=os.urandom(100), timestamp=i)])
            for i in range(500)]
    w = SSTableWriter(str(tmp_path), "ra", generation=1, compressed=True,
                      chunk_length=512)
    for row in rows:
        w.write_row(row)
    paths = w.close()
    entries = list(read_index_entries(paths["index"]))
    for key, pos in entries[::37]:
        got = next(read_data_rows(paths["data"], start=pos))
        assert got.key == key


def test_partition_planning_tiles_file(tmp_path):
    """G2 invariant: consecutive splits tile the uncompressed stream
    exactly once (GenerateSSTableDataSplits.scala:196-199), and reading
    the planned partitions yields every row exactly once."""
    from sstable_hadoop_spark.sources.datasource import _plan_file

    rows = [Row(key=f"k{i:05d}".encode(),
                cells=[Cell(name=b"n", data=b"x" * 200, timestamp=i)])
            for i in range(300)]
    w = SSTableWriter(str(tmp_path), "pl", generation=1, compressed=True,
                      chunk_length=1024)
    for row in rows:
        w.write_row(row)
    paths = w.close()
    parts = _plan_file(paths["data"], max_split=8 * 1024)
    assert len(parts) > 3
    assert parts[0].start == 0
    for a, b in zip(parts, parts[1:]):
        assert a.end == b.start
    got = []
    for p in parts:
        got.extend(r.key for r in read_data_rows(p.path, p.start, p.end))
    assert got == [r.key for r in rows]


def test_read_data_batches_equals_row_iterator(tmp_path):
    """The Arrow hot path must produce exactly the rows of the row
    iterator — all three cell states, both compression modes, and
    parse windows far smaller than a row batch (forcing window-edge
    row straddling and multi-batch output)."""
    rows = []
    for i in range(500):
        cells = [
            Cell(name=f"n{j}".encode(), state="NORMAL",
                 data=f"v{i}:{j}".encode() * (1 + i % 7),
                 timestamp=10_000 + i) for j in range(i % 4)]
        if i % 3 == 0:
            cells.append(Cell(name=b"dead", state="DELETED",
                              timestamp=20_000 + i))
        if i % 5 == 0:
            cells.append(Cell(name=b"exp", state="EXPIRING", data=b"ttl'd",
                              timestamp=30_000 + i, ttl=60,
                              expiration=40_000 + i))
        rows.append(Row(key=f"key{i:05d}".encode(), cells=cells))

    for compressed in (False, True):
        d = str(tmp_path / f"eq_{compressed}")
        paths = codec.write_sstable(d, "eq", rows, generation=3,
                                    compressed=compressed, chunk_length=2048)
        expect = [(r.key,
                   [(c.name, c.state, c.data, c.timestamp, c.ttl,
                     c.expiration) for c in r.cells], 3)
                  for r in read_data_rows(paths["data"])]
        from sstable_hadoop_spark.sources.codec import read_data_batches

        got = []
        n_batches = 0
        for b in read_data_batches(paths["data"], generation=3,
                                   rows_per_batch=64, read_block=512):
            n_batches += 1
            for rec in b.to_pylist():
                got.append((rec["key"],
                            [(c["name"], c["state"], c["data"],
                              c["timestamp"], c["ttl"], c["expiration"])
                             for c in rec["columns"]],
                            rec["generation"]))
        assert n_batches > 1
        assert got == expect


def test_writer_supports_lz4_and_zstd(tmp_path):
    """The native chunked format stores the codec name, so any pyarrow
    codec round-trips — lz4 and zstd beyond the default snappy (and
    deflate for Cassandra parity)."""
    from sstable_hadoop_spark.sources.codec import (
        Cell,
        Row,
        read_data_rows,
        write_sstable,
    )

    rows = [Row(key=f"k{i:03d}".encode(),
                cells=[Cell(name=b"c", state="NORMAL",
                            data=(f"v{i}" * 20).encode(), timestamp=i)])
            for i in range(200)]
    for algo in ("lz4", "zstd", "deflate"):
        d = str(tmp_path / algo)
        write_sstable(d, "cf", rows, generation=1, compressed=True,
                      algo=algo)
        got = list(read_data_rows(f"{d}/cf-1-Data.db"))
        assert [r.key for r in got] == [r.key for r in rows]
        assert got[5].cells[0].data == rows[5].cells[0].data
