"""spark.read.format("sstable") — scan correctness over real files."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from tests.conftest import cells_as_records


def test_data_scan_all_generations(spark, sstable_dir, cell_fixture):
    df = spark.read.format("sstable").load(sstable_dir)
    assert df.count() == len(cell_fixture)
    gens = {r["generation"] for r in df.select("generation").distinct().collect()}
    assert gens == {g for g, _ in cell_fixture}


def test_data_scan_cell_fidelity(spark, sstable_dir, cell_fixture):
    df = spark.read.format("sstable").load(sstable_dir)
    from sstable_hadoop_spark.operators import explode_cells

    got = {
        (bytes(r["key"]), bytes(r["name"]), r["state"],
         bytes(r["data"]) if r["data"] is not None else None,
         r["timestamp"], r["ttl"], r["expiration"], r["generation"])
        for r in explode_cells(df).collect()
    }
    want = {
        (r["key"], r["name"], r["state"], r["data"], r["timestamp"],
         r["ttl"], r["expiration"], r["generation"])
        for r in cells_as_records(cell_fixture)
    }
    assert got == want


def test_index_scan(spark, sstable_dir, cell_fixture):
    idx = spark.read.format("sstable").option("kind", "index").load(sstable_dir)
    rows = idx.collect()
    assert len(rows) == len(cell_fixture)  # one index entry per row written
    # offsets are non-negative and keys match the data scan keys
    assert all(r["pos"] >= 0 for r in rows)
    data_keys = {(bytes(r["key"]), r["generation"])
                 for r in spark.read.format("sstable").load(sstable_dir)
                 .select("key", "generation").collect()}
    index_keys = {(bytes(r["key"]), r["generation"]) for r in rows}
    assert index_keys == data_keys


def test_index_projection_s8(spark, sstable_dir):
    """S8: the Pig index loader projects away the offset
    (SSTableIndexLoader.scala:24-26)."""
    idx = spark.read.format("sstable").option("kind", "index").load(sstable_dir)
    keys = idx.select(F.col("key").cast("string").alias("key"))
    assert keys.columns == ["key"]
    assert keys.count() > 0


def test_summary_scan(spark, sstable_dir):
    s = spark.read.format("sstable").option("kind", "summary").load(sstable_dir)
    idx = spark.read.format("sstable").option("kind", "index").load(sstable_dir)
    per_gen_summary = {r["generation"]: r["cnt"] for r in
                       s.groupBy("generation").agg(F.count("*").alias("cnt")).collect()}
    per_gen_index = {r["generation"]: r["cnt"] for r in
                     idx.groupBy("generation").agg(F.count("*").alias("cnt")).collect()}
    for g, n_idx in per_gen_index.items():
        # summary_rate=8 in the fixture → ceil(n/8) samples
        assert per_gen_summary[g] == (n_idx + 7) // 8


def test_manifest_scan(spark, sstable_dir):
    m = spark.read.format("sstable").option("kind", "manifest") \
        .option("max_split_bytes", "4096").load(sstable_dir)
    rows = m.collect()
    assert len(rows) >= 4  # at least one split per generation file
    by_file = {}
    for r in sorted(rows, key=lambda r: (r["filename"], r["split_index"])):
        by_file.setdefault(r["filename"], []).append(r)
    for fname, parts in by_file.items():
        compressed = parts[0]["chunks"] is not None
        for a, b in zip(parts, parts[1:]):
            if compressed:
                # compressed-space ranges: monotone and gap-free, but a
                # row-boundary split may share its edge chunk with the
                # next split → overlap of at most one chunk
                assert b["byte_start"] <= a["byte_start"] + a["byte_length"]
                assert b["byte_start"] >= a["byte_start"]
                assert b["chunks"][0] >= a["chunks"][0]
            else:
                # uncompressed files tile exactly (G2 invariant)
                assert a["byte_start"] + a["byte_length"] == b["byte_start"]
        if compressed:
            import os

            from sstable_hadoop_spark.sources.codec import (
                read_compression_info,
            )

            root = parts[0]["filename"]
            ci = read_compression_info(
                os.path.join(sstable_dir, root + "-CompressionInfo.db"))
            # inner ranges cover the whole uncompressed stream exactly
            assert sum(p["inner_length"] for p in parts) \
                == ci.uncompressed_length
            # byte ranges land inside the compressed file
            fsize = os.path.getsize(
                os.path.join(sstable_dir, root + "-Data.db"))
            for p in parts:
                assert 0 <= p["byte_start"] <= fsize
                assert p["byte_start"] + p["byte_length"] <= fsize
                assert 0 <= p["inner_offset"] < max(
                    p["uncompressed_length"], 1)
                # chunks are the compressed positions the split spans
                assert p["chunks"][0] == p["byte_start"]


def test_manifest_compressed_ranges_consumable_like_reference(
        spark, sstable_dir):
    """A reference-style consumer (SplitSSTableDataRecordReader:
    read compressed [byteStart, byteStart+byteLength), decompress the
    chunk list, seek innerOffset, read innerLength) must recover
    exactly the rows of each split — proves the manifest's
    compressed-space fields are actually consumable, not just shaped
    right."""
    from sstable_hadoop_spark.sources.codec import (
        _decompress,
        read_compression_info,
        read_data_rows,
    )

    m = spark.read.format("sstable").option("kind", "manifest") \
        .option("max_split_bytes", "4096").load(sstable_dir)
    rows = [r for r in m.collect() if r["chunks"] is not None]
    assert rows, "fixture should contain compressed generations"
    checked = 0
    for r in rows:
        data_path = os.path.join(sstable_dir, r["filename"] + "-Data.db")
        ci = read_compression_info(
            os.path.join(sstable_dir,
                         r["filename"] + "-CompressionInfo.db"))
        blob = open(data_path, "rb").read()[
            r["byte_start"]:r["byte_start"] + r["byte_length"]]
        # chunk boundaries relative to the fetched range, as the
        # reference offsets them (SplitSSTableDataRecordReader.scala:66)
        rel = [c - r["byte_start"] for c in r["chunks"]] + [len(blob)]
        out = bytearray()
        first_chunk = ci.chunk_offsets.index(r["chunks"][0])
        for i, (s, e) in enumerate(zip(rel, rel[1:])):
            comp = blob[s:e - 4]  # strip the 4-byte checksum trailer
            idx = first_chunk + i
            remaining = ci.uncompressed_length - idx * ci.chunk_length
            out += _decompress(comp, ci.algo,
                               min(ci.chunk_length, remaining))
        inner = bytes(out[r["inner_offset"]:
                          r["inner_offset"] + r["inner_length"]])
        # parse rows straight off the recovered inner range
        got = list(read_data_rows_from_bytes(inner))
        # engine's own uncompressed-range read of the same split
        u_start = first_chunk * ci.chunk_length + r["inner_offset"]
        want = list(read_data_rows(data_path, u_start,
                                   u_start + r["inner_length"]))
        assert [(x.key, x.cells) for x in got] \
            == [(x.key, x.cells) for x in want]
        assert sum(len(c) for c in [x.cells for x in got]) >= 0
        checked += 1
    assert checked >= 2


def read_data_rows_from_bytes(raw: bytes):
    """Parse native-layout rows from an in-memory uncompressed blob
    (test helper emulating the reference's in-memory split parse)."""
    import io
    import struct

    from sstable_hadoop_spark.sources.codec import Row, _read_cell

    buf = io.BytesIO(raw)
    while True:
        header = buf.read(2)
        if not header:
            return
        (key_len,) = struct.unpack(">H", header)
        key = buf.read(key_len)
        (n_cells,) = struct.unpack(">I", buf.read(4))
        yield Row(key=key, cells=[_read_cell(buf) for _ in range(n_cells)])


def test_cells_kind_matches_exploded_data_scan(spark, sstable_dir):
    """kind=cells (flat, wide-row-safe) must equal
    explode_cells(kind=data) cell-for-cell, with splits, Arrow off/on,
    and key pushdown."""
    from sstable_hadoop_spark.operators import explode_cells

    def snap(df):
        return sorted(
            (bytes(r["key"]), bytes(r["name"]), r["state"],
             None if r["data"] is None else bytes(r["data"]),
             r["timestamp"], r["ttl"], r["expiration"], r["generation"])
            for r in df.collect())

    base = snap(explode_cells(
        spark.read.format("sstable").load(sstable_dir)))
    flat = spark.read.format("sstable").option("kind", "cells") \
        .option("max_split_bytes", "2048").load(sstable_dir)
    assert snap(flat) == base
    no_arrow = spark.read.format("sstable").option("kind", "cells") \
        .option("use_arrow", "false").load(sstable_dir)
    assert snap(no_arrow) == base
    # key filter still correct (partition pruning is correctness-free)
    some_key = base[0][0]
    got = snap(flat.filter(F.col("key") == some_key))
    assert got == [c for c in base if c[0] == some_key]


def test_cells_kind_handles_wide_row(spark, tmp_path):
    """The Cassandra wide-row pathology: one row key holding 200k cells
    streams through kind=cells in bounded batches (the nested shape
    would hold the whole row as a single value)."""
    from sstable_hadoop_spark.sources.codec import (
        Cell,
        Row,
        write_sstable,
    )

    d = str(tmp_path / "wide")
    n = 200_000
    cells = [Cell(f"c{i:06d}".encode(), "NORMAL", b"v", i)
             for i in range(n)]
    write_sstable(d, "wide-cf", [Row(b"widekey", cells)], generation=1)

    flat = spark.read.format("sstable").option("kind", "cells").load(d)
    assert flat.count() == n
    agg = flat.selectExpr("min(timestamp) AS lo", "max(timestamp) AS hi",
                          "count(DISTINCT name) AS names").collect()[0]
    assert (agg["lo"], agg["hi"], agg["names"]) == (0, n - 1, n)


def test_split_scan_matches_whole_scan(spark, sstable_dir):
    whole = spark.read.format("sstable").load(sstable_dir)
    split = spark.read.format("sstable") \
        .option("max_split_bytes", "2048").load(sstable_dir)
    assert split.rdd.getNumPartitions() > whole.rdd.getNumPartitions() or \
        split.count() == whole.count()
    a = {(bytes(r["key"]), r["generation"]) for r in whole.collect()}
    b = {(bytes(r["key"]), r["generation"]) for r in split.collect()}
    assert a == b
    assert split.count() == whole.count()  # no dup rows across splits


def test_write_sink_roundtrip(spark, tmp_path):
    """df.write.format('sstable') → read back → identical cell set
    (distributed writer, 2 generations, one compressed run)."""
    from sstable_hadoop_spark.operators import collect_rows, explode_cells

    cells = spark.createDataFrame(
        [(f"k{i:03d}".encode(), f"c{i % 5}".encode(),
          "NORMAL" if i % 4 else "DELETED",
          None if i % 4 == 0 else f"v{i}".encode(),
          1000 + i, None, None, 1 + (i % 2))
         for i in range(200)],
        "key binary, name binary, state string, data binary, "
        "timestamp bigint, ttl bigint, expiration bigint, generation int")
    nested = collect_rows(cells, by_generation=True)

    out = str(tmp_path / "written")
    (nested.repartition(4, "key").write.format("sstable")
     .option("path", out).mode("append").save())

    back = explode_cells(spark.read.format("sstable").load(out))
    want = {tuple(bytes(v) if isinstance(v, (bytes, bytearray)) else v
                  for v in r) for r in cells.collect()}
    got = {tuple(bytes(v) if isinstance(v, (bytes, bytearray)) else v
                 for v in r)
           for r in back.select(*cells.columns).collect()}
    assert got == want


def test_write_sink_compressed(spark, tmp_path):
    from sstable_hadoop_spark.operators import collect_rows, explode_cells

    cells = spark.createDataFrame(
        [(f"k{i:03d}".encode(), b"c", "NORMAL", b"v" * 100, i, None, None, 1)
         for i in range(300)],
        "key binary, name binary, state string, data binary, "
        "timestamp bigint, ttl bigint, expiration bigint, generation int")
    out = str(tmp_path / "written_c")
    (collect_rows(cells, by_generation=True).coalesce(2)
     .write.format("sstable").option("path", out)
     .option("compressed", "true").option("chunk_length", "1024")
     .mode("append").save())
    import glob
    assert glob.glob(out + "/*-CompressionInfo.db")
    back = explode_cells(spark.read.format("sstable").load(out))
    assert back.count() == 300


def test_corrupt_file_handling(spark, tmp_path):
    """Truncated Data.db: default read fails loudly; with
    ignore_corrupt_files the readable prefix is returned."""
    import pytest as _pytest

    from sstable_hadoop_spark.sources.codec import Cell, Row, write_sstable

    d = str(tmp_path / "corrupt")
    paths = write_sstable(
        d, "ok", [Row(f"k{i}".encode(), [Cell(b"c", "NORMAL", b"v" * 50, i)])
                  for i in range(50)], generation=1)
    # truncate mid-row and drop the index so planning can't see offsets
    import os
    size = os.path.getsize(paths["data"])
    with open(paths["data"], "r+b") as f:
        f.truncate(size - 31)
    os.remove(paths["index"])

    with _pytest.raises(Exception):
        spark.read.format("sstable").load(d).count()

    lenient = (spark.read.format("sstable")
               .option("ignore_corrupt_files", "true").load(d))
    n = lenient.count()
    assert 0 < n < 50  # readable prefix survives, tail dropped


# ---- explicit column projection (columns= / skip_values=) ----------
# The Python DataSource API exposes no Catalyst column pruning; these
# options are the engine's explicit stand-in (the reference's key-only
# jobs read Index.db instead — SSTableIndexRecordReader.scala:47-58 —
# but have no way to prune a Data.db scan).

def test_columns_projection_data_kind(spark, sstable_dir, cell_fixture):
    """columns=key,generation: schema narrows, row set matches the full
    scan's (key, generation) projection exactly, on both the Arrow and
    the row-iterator paths."""
    want = sorted((bytes(r["key"]), r["generation"])
                  for r in spark.read.format("sstable").load(sstable_dir)
                  .select("key", "generation").collect())
    for use_arrow in ("true", "false"):
        df = (spark.read.format("sstable")
              .option("columns", "key,generation")
              .option("use_arrow", use_arrow).load(sstable_dir))
        assert df.columns == ["key", "generation"]
        got = sorted((bytes(r["key"]), r["generation"])
                     for r in df.collect())
        assert got == want


def test_columns_projection_order_is_schema_order(spark, sstable_dir):
    df = (spark.read.format("sstable")
          .option("columns", "generation,key").load(sstable_dir))
    assert df.columns == ["key", "generation"]  # schema-field order


def test_skip_values_nulls_data_keeps_structure(spark, sstable_dir,
                                                cell_fixture):
    """skip_values=true: cell structure (name/state/ts/ttl/expiration)
    is bit-identical to the full scan; every data is NULL."""
    from sstable_hadoop_spark.operators import explode_cells

    full = {(bytes(r["key"]), bytes(r["name"]), r["state"],
             r["timestamp"], r["ttl"], r["expiration"], r["generation"])
            for r in explode_cells(
                spark.read.format("sstable").load(sstable_dir)).collect()}
    for use_arrow in ("true", "false"):
        got = explode_cells(
            spark.read.format("sstable").option("skip_values", "true")
            .option("use_arrow", use_arrow).load(sstable_dir)).collect()
        assert all(r["data"] is None for r in got)
        assert {(bytes(r["key"]), bytes(r["name"]), r["state"],
                 r["timestamp"], r["ttl"], r["expiration"],
                 r["generation"]) for r in got} == full


def test_columns_projection_cells_kind(spark, sstable_dir, cell_fixture):
    from tests.conftest import cells_as_records

    df = (spark.read.format("sstable").option("kind", "cells")
          .option("columns", "key,name,timestamp").load(sstable_dir))
    assert df.columns == ["key", "name", "timestamp"]
    got = sorted((bytes(r["key"]), bytes(r["name"]), r["timestamp"])
                 for r in df.collect())
    want = sorted((r["key"], r["name"], r["timestamp"])
                  for r in cells_as_records(cell_fixture))
    assert got == want


def test_columns_projection_index_manifest_summary(spark, sstable_dir):
    idx = (spark.read.format("sstable").option("kind", "index")
           .option("columns", "key").load(sstable_dir))
    assert idx.columns == ["key"] and idx.count() > 0
    man = (spark.read.format("sstable").option("kind", "manifest")
           .option("columns", "filename,byte_length").load(sstable_dir))
    assert man.columns == ["filename", "byte_length"] and man.count() > 0
    summ = (spark.read.format("sstable").option("kind", "summary")
            .option("columns", "key,index_offset").load(sstable_dir))
    assert summ.columns == ["key", "index_offset"] and summ.count() > 0


def test_columns_projection_composes_with_pushdown(spark, sstable_dir,
                                                   cell_fixture):
    """Projection and key-range partition pruning compose: a key
    equality filter over a key-only scan returns exactly that key."""
    some_key = sorted(bytes(r[1].key) for r in cell_fixture)[0]
    df = (spark.read.format("sstable").option("columns", "key,generation")
          .load(sstable_dir).filter(F.col("key") == some_key))
    got = {bytes(r["key"]) for r in df.collect()}
    assert got == {some_key}


def test_columns_unknown_field_rejected(spark, sstable_dir):
    import pytest

    with pytest.raises(Exception, match="columns"):
        (spark.read.format("sstable").option("columns", "key,banana")
         .load(sstable_dir).collect())


def test_skip_values_cassandra_format(spark, tmp_path):
    """format=cassandra prunes post-parse: values null, structure
    intact."""
    import struct as _struct

    from sstable_hadoop_spark.sources.cassandra1x import (
        encode_cassandra_row,
    )
    from sstable_hadoop_spark.sources.codec import Cell, Row

    d = str(tmp_path / "cass")
    os.makedirs(d)
    rows = [Row(key=f"k{i}".encode(),
                cells=[Cell(name=b"c", state="NORMAL", data=b"v" * 20,
                            timestamp=1000 + i)])
            for i in range(10)]
    data_path = os.path.join(d, "Keyspace1-cf-hc-1-Data.db")
    raw = bytearray()
    with open(data_path.replace("-Data.db", "-Index.db"), "wb") as ix:
        for r in rows:
            ix.write(_struct.pack(">H", len(r.key)) + r.key
                     + _struct.pack(">Q", len(raw)))
            raw += encode_cassandra_row(r)
    with open(data_path, "wb") as f:
        f.write(raw)

    got = (spark.read.format("sstable").option("format", "cassandra")
           .option("kind", "cells").option("skip_values", "true")
           .load(d)).collect()
    assert len(got) == 10
    assert all(r["data"] is None for r in got)
    assert {r["timestamp"] for r in got} == {1000 + i for i in range(10)}

    proj = (spark.read.format("sstable").option("format", "cassandra")
            .option("columns", "key,generation").load(d))
    assert proj.columns == ["key", "generation"]
    assert proj.count() == 10


def test_corrupt_file_handling_cells_kind(spark, tmp_path):
    """Truncation semantics hold on the kind=cells windowed fast path
    too: loud failure by default, readable prefix with
    ignore_corrupt_files."""
    import pytest as _pytest

    from sstable_hadoop_spark.sources.codec import Cell, Row, write_sstable

    d = str(tmp_path / "corrupt_cells")
    paths = write_sstable(
        d, "ok", [Row(f"k{i}".encode(), [Cell(b"c", "NORMAL", b"v" * 50, i)])
                  for i in range(50)], generation=1)
    size = os.path.getsize(paths["data"])
    with open(paths["data"], "r+b") as f:
        f.truncate(size - 31)
    os.remove(paths["index"])

    base = spark.read.format("sstable").option("kind", "cells")
    with _pytest.raises(Exception):
        base.load(d).count()
    n = (base.option("ignore_corrupt_files", "true").load(d)).count()
    assert 0 < n < 50
