"""Leveled compaction (operators/compaction.py LCS half): key-range
probing, planner policy (L0 threshold, level budgets, overlap
selection), in-place task execution, content preservation under full
quiescence, level invariants, and crash-tolerant sidecar semantics."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F


def _write_gen(d, keys, gen, value=b"v", ts=None):
    from sstable_hadoop_spark.sources.codec import Cell, Row, write_sstable

    rows = [Row(k, [Cell(b"c", "NORMAL", value, ts or gen)])
            for k in sorted(keys)]
    write_sstable(str(d), "tbl", rows, generation=gen)


def _datafiles(d):
    return sorted(f for f in os.listdir(d) if f.endswith("-Data.db"))


def test_file_key_range(tmp_path):
    from sstable_hadoop_spark.operators.compaction import file_key_range

    keys = [f"k{i:04d}".encode() for i in range(300)]
    _write_gen(tmp_path, keys, 1)
    path = os.path.join(tmp_path, _datafiles(tmp_path)[0])
    assert file_key_range(path) == (b"k0000", b"k0299")


def test_pick_l0_threshold_and_overlap(tmp_path):
    from sstable_hadoop_spark.operators.compaction import (
        _write_levels,
        pick_leveled,
    )

    # three L0 files: below the threshold of 4 -> nothing due
    for g in (1, 2, 3):
        _write_gen(tmp_path, [b"a", b"m", b"z"], g)
    assert pick_leveled(str(tmp_path)) is None
    # a fourth L0 file trips the threshold; an L1 file overlapping the
    # L0 span joins the task, a disjoint L1 file does not
    _write_gen(tmp_path, [b"b", b"c"], 4)
    _write_gen(tmp_path, [b"m", b"n"], 5)           # overlaps a..z
    _write_gen(tmp_path, [b"zz", b"zzz"], 6)        # disjoint
    files = _datafiles(tmp_path)
    _write_levels(str(tmp_path), {files[4]: 1, files[5]: 1})
    task = pick_leveled(str(tmp_path))
    assert task["level"] == 0 and task["target_level"] == 1
    assert [os.path.basename(f) for f in task["sources"]] == files[:4]
    assert [os.path.basename(f)
            for f in task["overlapping"]] == [files[4]]


def test_pick_level_budget_victim_is_smallest_first_key(tmp_path):
    from sstable_hadoop_spark.operators.compaction import (
        _write_levels,
        pick_leveled,
    )

    _write_gen(tmp_path, [b"a", b"b"], 1)
    _write_gen(tmp_path, [b"x", b"y"], 2)
    _write_gen(tmp_path, [b"b", b"c"], 3)    # L2, overlaps gen1 span
    files = _datafiles(tmp_path)
    _write_levels(str(tmp_path),
                  {files[0]: 1, files[1]: 1, files[2]: 2})
    # tiny budget: L1 is over; victim must be gen1 (first key 'a')
    task = pick_leveled(str(tmp_path), sstable_mb=1e-9)
    assert task["level"] == 1 and task["target_level"] == 2
    assert [os.path.basename(f) for f in task["sources"]] == [files[0]]
    assert [os.path.basename(f)
            for f in task["overlapping"]] == [files[2]]


def test_compact_to_quiescence_preserves_content(spark, tmp_path):
    from sstable_hadoop_spark.operators.compaction import (
        compact_leveled,
        pick_leveled,
        read_levels,
    )
    from sstable_hadoop_spark.operators.lww import explode_cells, lww_cell
    from sstable_hadoop_spark.sources.datasource import register

    register(spark)
    # 5 overlapping L0 generations with conflicting writes: the later
    # generation must win after the tree is reorganized
    for g in range(1, 6):
        _write_gen(tmp_path, [f"k{i:03d}".encode()
                              for i in range(g, 60 + g)], g,
                   value=f"v{g}".encode())
    before = lww_cell(explode_cells(
        spark.read.format("sstable").load(str(tmp_path)))) \
        .select("key", "name", "data", "timestamp").collect()
    n = compact_leveled(spark, str(tmp_path), sstable_mb=0.001,
                        l0_threshold=4, max_rounds=30)
    assert n >= 1
    assert pick_leveled(str(tmp_path), sstable_mb=0.001) is None
    after_df = spark.read.format("sstable").load(str(tmp_path))
    after = lww_cell(explode_cells(after_df)) \
        .select("key", "name", "data", "timestamp").collect()
    assert sorted(map(tuple, after)) == sorted(map(tuple, before))
    # every surviving file is registered at a level >= 1 or is L0
    levels = read_levels(str(tmp_path))
    for f in _datafiles(tmp_path):
        assert levels.get(f, 0) >= 0


def test_levels_are_nonoverlapping_after_quiescence(spark, tmp_path):
    from sstable_hadoop_spark.operators.compaction import (
        compact_leveled,
        file_key_range,
        read_levels,
    )
    from sstable_hadoop_spark.sources.datasource import register

    register(spark)
    for g in range(1, 6):
        _write_gen(tmp_path, [f"k{i:03d}".encode()
                              for i in range(0, 80, g)], g)
    compact_leveled(spark, str(tmp_path), sstable_mb=0.001,
                    l0_threshold=4, max_rounds=30,
                    target_partitions=3)
    levels = read_levels(str(tmp_path))
    by_level: dict[int, list] = {}
    for f in _datafiles(tmp_path):
        lv = levels.get(f, 0)
        rng = file_key_range(os.path.join(tmp_path, f))
        by_level.setdefault(lv, []).append(rng)
    for lv, ranges in by_level.items():
        if lv == 0:
            continue
        ranges.sort()
        for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
            assert hi_a < lo_b, f"level {lv} files overlap"


def test_lost_sidecar_degrades_to_releveling_not_wrong_reads(
        spark, tmp_path):
    from sstable_hadoop_spark.operators.compaction import (
        _LEVELS_SIDECAR,
        compact_leveled,
        read_levels,
    )
    from sstable_hadoop_spark.operators.lww import explode_cells, lww_cell
    from sstable_hadoop_spark.sources.datasource import register

    register(spark)
    for g in range(1, 6):
        _write_gen(tmp_path, [f"k{i:03d}".encode()
                              for i in range(40)], g,
                   value=f"v{g}".encode())
    compact_leveled(spark, str(tmp_path), sstable_mb=0.001,
                    l0_threshold=4)
    truth = sorted(
        tuple(r) for r in lww_cell(explode_cells(
            spark.read.format("sstable").load(str(tmp_path))))
        .select("key", "data").collect())
    os.remove(os.path.join(tmp_path, _LEVELS_SIDECAR))
    assert read_levels(str(tmp_path)) == {}
    # reads are level-blind: identical content with the sidecar gone
    again = sorted(
        tuple(r) for r in lww_cell(explode_cells(
            spark.read.format("sstable").load(str(tmp_path))))
        .select("key", "data").collect())
    assert again == truth


def test_quiesce_bound_raises(spark, tmp_path):
    from sstable_hadoop_spark.operators.compaction import compact_leveled
    from sstable_hadoop_spark.sources.datasource import register

    register(spark)
    for g in range(1, 6):
        _write_gen(tmp_path, [b"a", b"b"], g)
    with pytest.raises(RuntimeError, match="did not quiesce"):
        compact_leveled(spark, str(tmp_path), sstable_mb=0.001,
                        l0_threshold=4, max_rounds=0)


def test_streaming_lsm_flush_leveled(spark, tmp_path):
    """The full LSM write path (streaming/compaction.py
    flush_stream_to_leveled): 4 micro-batches flush L0 generations
    and inline LCS reorganizes the tree mid-stream; the drained
    directory's merge must equal the batch LWW of everything
    ingested, and at least one compaction must actually have run."""
    import os

    from sstable_hadoop_spark.operators.compaction import read_levels
    from sstable_hadoop_spark.operators.lww import explode_cells, lww_cell
    from sstable_hadoop_spark.queries import derived_cells
    from sstable_hadoop_spark.sources.datasource import register
    from sstable_hadoop_spark.streaming.compaction import (
        flush_stream_to_leveled,
    )

    register(spark)
    cells = derived_cells(spark, "/root/testdata/sf0.001")
    src = str(tmp_path / "src")
    for g in (1, 2, 3, 4):
        p = os.path.join(src, f"g{g}")
        cells.filter(F.col("generation") == g).coalesce(1) \
             .write.parquet(p)
        for f in os.listdir(p):
            os.utime(os.path.join(p, f), (g * 1000, g * 1000))
    out = str(tmp_path / "tree")
    os.makedirs(out)
    stream = (spark.readStream.schema(cells.schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(os.path.join(src, "g*")))
    q = flush_stream_to_leveled(stream, out, str(tmp_path / "ckpt"),
                                l0_threshold=3)
    try:
        q.awaitTermination()
    finally:
        q.stop()
    levels = read_levels(out)
    assert levels and max(levels.values()) >= 1  # LCS really ran
    got = sorted(
        tuple(r) for r in
        lww_cell(explode_cells(
            spark.read.format("sstable").load(out)))
        .select("key", "name", "state", "data", "timestamp").collect())
    want = sorted(tuple(r) for r in lww_cell(cells)
                  .select("key", "name", "state", "data",
                          "timestamp").collect())
    assert got == want
