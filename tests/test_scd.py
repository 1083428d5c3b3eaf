"""SCD2 dimension maintenance (operators/scd.py): change detection,
close/open stamping, deletion tracking, idempotence, null-safe
comparisons, as-of reads, and guards."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _snap(spark, rows):
    return spark.createDataFrame(rows, "k long, color string, size long")


def _sorted(df):
    return sorted((tuple(r) for r in df.collect()),
                  key=lambda t: tuple((v is None, v) for v in t))


def test_full_lifecycle(spark):
    from sstable_hadoop_spark.operators.scd import (
        scd2_apply,
        scd2_as_of,
        scd2_init,
    )

    dim = scd2_init(_snap(spark, [(1, "red", 10), (2, "blue", 20),
                                  (3, "green", 30)]), as_of_us=1000)
    # t=2000: 1 changes color, 2 unchanged, 3 deleted, 4 appears
    dim = scd2_apply(dim, _snap(spark, [(1, "pink", 10),
                                        (2, "blue", 20),
                                        (4, "grey", 40)]),
                     ["k"], as_of_us=2000)
    assert _sorted(dim) == [
        (1, "pink", 10, 2000, None),
        (1, "red", 10, 1000, 2000),
        (2, "blue", 20, 1000, None),
        (3, "green", 30, 1000, 2000),
        (4, "grey", 40, 2000, None),
    ]
    # t=3000: 1 changes again — history depth 3
    dim2 = scd2_apply(dim, _snap(spark, [(1, "black", 10),
                                         (2, "blue", 20),
                                         (4, "grey", 40)]),
                      ["k"], as_of_us=3000)
    hist1 = [r for r in _sorted(dim2) if r[0] == 1]
    assert hist1 == [(1, "black", 10, 3000, None),
                     (1, "pink", 10, 2000, 3000),
                     (1, "red", 10, 1000, 2000)]
    # as-of reads pick the version live at each instant
    assert _sorted(scd2_as_of(dim2, 1500)) == [
        (1, "red", 10), (2, "blue", 20), (3, "green", 30)]
    assert _sorted(scd2_as_of(dim2, 2000)) == [
        (1, "pink", 10), (2, "blue", 20), (4, "grey", 40)]
    assert _sorted(scd2_as_of(dim2, 999)) == []


def test_reapply_same_snapshot_is_noop(spark):
    from sstable_hadoop_spark.operators.scd import scd2_apply, scd2_init

    snap = _snap(spark, [(1, "red", 10), (2, None, 20)])
    dim = scd2_init(snap, as_of_us=1000)
    again = scd2_apply(dim, snap, ["k"], as_of_us=2000)
    assert _sorted(again) == _sorted(dim)


def test_null_transitions_are_changes(spark):
    from sstable_hadoop_spark.operators.scd import scd2_apply, scd2_init

    dim = scd2_init(_snap(spark, [(1, None, 10), (2, "blue", 20)]),
                    as_of_us=1000)
    dim = scd2_apply(dim, _snap(spark, [(1, "red", 10), (2, None, 20)]),
                     ["k"], as_of_us=2000)
    got = _sorted(dim)
    assert (1, "red", 10, 2000, None) in got      # NULL -> value
    assert (2, None, 20, 2000, None) in got       # value -> NULL
    assert (1, None, 10, 1000, 2000) in got
    assert (2, "blue", 20, 1000, 2000) in got


def test_close_missing_false_keeps_absent_keys_open(spark):
    from sstable_hadoop_spark.operators.scd import scd2_apply, scd2_init

    dim = scd2_init(_snap(spark, [(1, "red", 10), (2, "blue", 20)]),
                    as_of_us=1000)
    dim = scd2_apply(dim, _snap(spark, [(1, "red", 10)]), ["k"],
                     as_of_us=2000, close_missing=False)
    assert _sorted(dim) == [(1, "red", 10, 1000, None),
                            (2, "blue", 20, 1000, None)]


def test_guards(spark):
    from sstable_hadoop_spark.operators.scd import scd2_apply, scd2_init

    snap = _snap(spark, [(1, "red", 10)])
    dim = scd2_init(snap, as_of_us=1000)
    with pytest.raises(ValueError, match="key columns"):
        scd2_apply(dim, snap, ["nope"], as_of_us=2000)
    with pytest.raises(ValueError, match="lacks dimension columns"):
        scd2_apply(dim, snap.select("k", "color"), ["k"], as_of_us=2000)
    with pytest.raises(ValueError, match="dimension lacks"):
        scd2_apply(dim, snap.withColumn("extra", F.lit(1)), ["k"],
                   as_of_us=2000)
    with pytest.raises(ValueError, match="explicit"):
        scd2_apply(dim, snap, ["k"], as_of_us=None)


def test_temporal_join_picks_version_at_fact_time(spark):
    from sstable_hadoop_spark.operators.scd import (
        scd2_apply,
        scd2_init,
        scd2_temporal_join,
    )

    dim = scd2_init(_snap(spark, [(1, "red", 10), (2, "blue", 20)]),
                    as_of_us=1000)
    dim = scd2_apply(dim, _snap(spark, [(1, "pink", 10)]), ["k"],
                     as_of_us=2000)  # 1 changes, 2 closes
    facts = spark.createDataFrame(
        [(1, 1500, 7), (1, 2000, 8), (1, 2500, 9),
         (2, 1500, 10), (2, 2500, 11),   # 2 dead by 2500
         (9, 1500, 12),                  # unknown key
         (1, 500, 13)],                  # before any version
        "k long, ts long, amount long")
    j = scd2_temporal_join(facts, dim, ["k"], "ts")
    got = {(r["k"], r["ts"], r["amount"]): (r["color"], r["size"])
           for r in j.collect()}
    assert got == {
        (1, 1500, 7): ("red", 10),     # old version live at 1500
        (1, 2000, 8): ("pink", 10),    # boundary: close is half-open
        (1, 2500, 9): ("pink", 10),
        (2, 1500, 10): ("blue", 20),
        (2, 2500, 11): (None, None),   # closed key, left join NULLs
        (9, 1500, 12): (None, None),
        (1, 500, 13): (None, None),
    }
    inner = scd2_temporal_join(facts, dim, ["k"], "ts", how="inner")
    assert inner.count() == 4


def test_temporal_join_guards_and_plan(spark):
    from sstable_hadoop_spark.operators.scd import (
        scd2_init,
        scd2_temporal_join,
    )

    dim = scd2_init(_snap(spark, [(1, "red", 10)]), as_of_us=1000)
    facts = spark.createDataFrame([(1, 1500, "x")],
                                  "k long, ts long, color string")
    with pytest.raises(ValueError, match="collide"):
        scd2_temporal_join(facts, dim, ["k"], "ts")
    with pytest.raises(ValueError, match="left|inner"):
        scd2_temporal_join(facts.drop("color"), dim, ["k"], "ts",
                           how="full")
    with pytest.raises(ValueError, match="missing from facts"):
        scd2_temporal_join(facts.drop("k"), dim, ["k"], "ts")
    # equi hash join, never a nested loop
    plan = scd2_temporal_join(facts.drop("color"), dim, ["k"],
                              "ts")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_temporal_join_works_stream_static(spark, tmp_path):
    """scd2_temporal_join on a STREAMING fact side against the static
    dimension (Structured Streaming's stream-static left join): the
    drained sink must equal the batch join — the live-enrichment
    deployment shape (facts stream in, each picks its own-time
    dimension version)."""
    import os

    from sstable_hadoop_spark.operators.scd import (
        scd2_apply,
        scd2_init,
        scd2_temporal_join,
    )

    dim = scd2_init(_snap(spark, [(1, "red", 10), (2, "blue", 20)]),
                    as_of_us=1000)
    dim = scd2_apply(dim, _snap(spark, [(1, "pink", 10)]), ["k"],
                     as_of_us=2000)
    facts = spark.createDataFrame(
        [(1, 1500, 7), (1, 2500, 8), (2, 1500, 9), (9, 1500, 10)],
        "k long, ts long, amount long")
    batch = sorted(tuple(r) for r in
                   scd2_temporal_join(facts, dim, ["k"], "ts")
                   .collect())
    src = str(tmp_path / "facts")
    facts.filter(F.col("k") == 1).coalesce(1) \
         .write.parquet(os.path.join(src, "p0"))
    facts.filter(F.col("k") != 1).coalesce(1) \
         .write.parquet(os.path.join(src, "p1"))
    stream = (spark.readStream.schema(facts.schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(os.path.join(src, "p*")))
    j = scd2_temporal_join(stream, dim, ["k"], "ts")
    sink = str(tmp_path / "sink")
    q = (j.writeStream.format("parquet").option("path", sink)
          .option("checkpointLocation", str(tmp_path / "ckpt"))
          .trigger(availableNow=True).start())
    try:
        q.awaitTermination()
    finally:
        q.stop()
    got = sorted(tuple(r) for r in spark.read.parquet(sink).collect())
    assert got == batch
