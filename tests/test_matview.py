"""Materialized views with exactly-once incremental refresh
(operators/matview.py): cursor-journaled rollups over logged tables."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _mk(spark, lo, hi, v=1):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("g"),
        (F.col("id") * v).alias("x"))


def _merge(stored, delta):
    return (stored.join(delta, on=["k"], how="left_anti")
            .select(*stored.columns).unionByName(delta))


def _view(spark, vp):
    from sstable_hadoop_spark.operators.matview import matview_read

    return sorted(tuple(r) for r in matview_read(spark, vp).collect())


def _truth(spark, bp):
    from sstable_hadoop_spark.operators import txlog as tx

    return sorted(tuple(r) for r in tx.txlog_rollup(
        spark, bp, ["g"], ["x"]).collect())


def test_matview_full_then_incremental(spark, tmp_path):
    from sstable_hadoop_spark.operators import txlog as tx
    from sstable_hadoop_spark.operators.matview import (
        matview_refresh,
        matview_staleness,
    )

    bp, vp = str(tmp_path / "base"), str(tmp_path / "view")
    tx.txlog_create(spark, bp, _mk(spark, 0, 700), ("k",), 4)
    v, did = matview_refresh(spark, vp, bp, ["g"], ["x"])
    assert did and v == 1
    assert _view(spark, vp) == _truth(spark, bp)
    # no base commits → refresh is a cursor-read no-op
    assert matview_refresh(spark, vp, bp, ["g"], ["x"]) == (1, False)
    assert matview_staleness(vp, bp) == 0
    # base evolves: append, update, DV delete — one incremental fold
    tx.txlog_append(spark, bp, _mk(spark, 700, 800))
    tx.txlog_upsert(spark, bp, _mk(spark, 0, 50, v=3), _merge,
                    ("k",), 4)
    tx.txlog_delete_rows(spark, bp, "g = 6")
    assert matview_staleness(vp, bp) == 3
    v, did = matview_refresh(spark, vp, bp, ["g"], ["x"])
    assert did and v == 4
    assert _view(spark, vp) == _truth(spark, bp)
    # the dropped group vanished from the view (overwrite semantics)
    assert not [r for r in _view(spark, vp) if r[0] == 6]
    # replayed refresh of the same window: duplicate-tag no-op,
    # version count unchanged
    vv = tx.txlog_snapshot(vp)["version"]
    assert matview_refresh(spark, vp, bp, ["g"], ["x"]) == (4, False)
    assert tx.txlog_snapshot(vp)["version"] == vv
    # the view is an ordinary logged table: time travel works
    assert len(tx.txlog_read(spark, vp, version=1).collect()) == 7


def test_matview_guards_foreign_tables(spark, tmp_path):
    from sstable_hadoop_spark.operators import txlog as tx
    from sstable_hadoop_spark.operators.matview import (
        matview_refresh,
        matview_staleness,
    )

    bp, vp = str(tmp_path / "base"), str(tmp_path / "not_a_view")
    tx.txlog_create(spark, bp, _mk(spark, 0, 70), ("k",), 2)
    tx.txlog_create(spark, vp, _mk(spark, 0, 10), ("k",), 2)
    with pytest.raises(ValueError, match="cursor"):
        matview_refresh(spark, vp, bp, ["g"], ["x"])
    with pytest.raises(ValueError, match="cursor"):
        matview_staleness(vp, bp)


def test_overwrite_swaps_content_atomically(spark, tmp_path):
    from sstable_hadoop_spark.operators import txlog as tx

    p = str(tmp_path / "t")
    tx.txlog_create(spark, p, _mk(spark, 0, 100), ("k",), 2)
    new = _mk(spark, 500, 520)
    v = tx.txlog_overwrite(spark, p, new)
    assert v == 2
    assert tx.txlog_count(p) == 20
    assert sorted(r["k"] for r in
                  tx.txlog_read(spark, p).collect()) \
        == list(range(500, 520))
    # pre-overwrite content is a version away
    assert tx.txlog_count(p, version=1) == 100
    with pytest.raises(ValueError, match="schema mismatch"):
        tx.txlog_overwrite(spark, p, new.drop("x"))
    # txn tag dedups a replayed overwrite
    tx.txlog_overwrite(spark, p, new, txn=("job", 9))
    vv = tx.txlog_snapshot(p)["version"]
    assert tx.txlog_overwrite(spark, p, new, txn=("job", 9)) == vv
    assert tx.txlog_snapshot(p)["version"] == vv
