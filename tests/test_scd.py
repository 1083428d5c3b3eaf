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


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# a snapshot: {key: color} over a small key/value alphabet, so
# change/unchanged/delete/reappear sequences are all common
_snapshot = st.dictionaries(st.integers(0, 5),
                            st.sampled_from(["a", "b", "c", None]),
                            min_size=0, max_size=6)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(snaps=st.lists(_snapshot, min_size=1, max_size=4),
       close_missing=st.booleans())
def test_scd2_model_based(spark, snaps, close_missing):
    """Model-based property: folding a random snapshot sequence must
    track a plain dict model exactly — open rows, closed intervals,
    NULL-valued attributes, deletion tracking on/off — and as-of
    reads reproduce every intermediate state."""
    from sstable_hadoop_spark.operators.scd import (
        scd2_apply,
        scd2_as_of,
        scd2_init,
    )

    def df_of(snap):
        return spark.createDataFrame(
            [(k, v) for k, v in snap.items()] or [],
            "k long, color string")

    dim = None
    open_m: dict = {}
    closed_m: list = []
    states = {}
    for i, snap in enumerate(snaps):
        ts = (i + 1) * 1000
        if dim is None:
            dim = scd2_init(df_of(snap), as_of_us=ts)
            open_m = {k: (v, ts) for k, v in snap.items()}
        else:
            dim = scd2_apply(dim, df_of(snap), ["k"], as_of_us=ts,
                             close_missing=close_missing)
            for k, (v, vf) in list(open_m.items()):
                if k in snap:
                    if snap[k] != v:          # change: close + open
                        closed_m.append((k, v, vf, ts))
                        open_m[k] = (snap[k], ts)
                elif close_missing:           # deletion tracking
                    closed_m.append((k, v, vf, ts))
                    del open_m[k]
            for k, v in snap.items():         # brand-new keys
                if k not in open_m:
                    open_m[k] = (v, ts)
        states[ts] = dict(open_m)
        got = sorted((tuple(r) for r in dim.collect()),
                     key=lambda t: tuple((x is None, x) for x in t))
        want = sorted(
            ([(k, v, vf, None) for k, (v, vf) in open_m.items()]
             + closed_m),
            key=lambda t: tuple((x is None, x) for x in t))
        assert got == want, (snaps, close_missing, ts)
    # as-of reads reproduce every recorded state
    for ts, om in states.items():
        got = sorted((tuple(r) for r in
                      scd2_as_of(dim, ts).collect()),
                     key=lambda t: tuple((x is None, x) for x in t))
        want = sorted(((k, v) for k, (v, _) in om.items()),
                      key=lambda t: tuple((x is None, x) for x in t))
        assert got == want, (snaps, close_missing, ts)


def test_apply_over_bucketed_dim_plans_zero_exchanges(spark,
                                                      tmp_path):
    """r11 (VERDICT r10 #8): with the dimension AND the daily
    snapshot stored as txlog tables bucketed by the key (same bucket
    count), scd2_apply's open-rows x snapshot full-outer join
    co-locates — ZERO exchanges anywhere in the apply plan, content
    identical to the unbucketed apply.  The daily-dimension shape at
    100 TB: history depth never re-shuffles, and the apply's network
    cost drops from two table-sized exchanges to none."""
    from sstable_hadoop_spark.operators import txlog as tx
    from sstable_hadoop_spark.operators.scd import scd2_apply, scd2_init

    def mk(lo, hi, status):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"),
            F.lit(status).alias("status"))

    base = scd2_init(mk(0, 120, "A"), as_of_us=1_000_000)
    snap = (mk(0, 150, "A")
            .withColumn("status",
                        F.when(F.col("k") % 5 == 0, F.lit("X"))
                         .otherwise(F.col("status"))))
    # plain (unbucketed) apply = the content oracle
    want = sorted(
        tuple(r) for r in
        scd2_apply(base, snap, ["k"], as_of_us=2_000_000).collect())

    dim_p, snap_p = str(tmp_path / "dim"), str(tmp_path / "snap")
    tx.txlog_create(spark, dim_p, base, ("k",), 4, sort_by=("k",))
    tx.txlog_create(spark, snap_p, snap, ("k",), 4, sort_by=("k",))
    dim_b = tx.txlog_read_bucketed(spark, dim_p, "scd_dim_bkt")
    snap_b = tx.txlog_read_bucketed(spark, snap_p, "scd_snap_bkt")
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = scd2_apply(dim_b, snap_b, ["k"], as_of_us=2_000_000,
                         null_safe_keys=False)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert sorted(tuple(r) for r in out.collect()) == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
        spark.sql("DROP TABLE IF EXISTS scd_dim_bkt")
        spark.sql("DROP TABLE IF EXISTS scd_snap_bkt")
