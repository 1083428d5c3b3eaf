"""Incremental join-view maintenance (operators/ivm.py): signed
delta-join algebra over txlog change feeds == full recompute."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sstable_hadoop_spark.operators.ivm import (
    incremental_join_rollup,
    join_rollup,
)
from sstable_hadoop_spark.operators import txlog as tx


@pytest.fixture()
def paths(tmp_path):
    return str(tmp_path / "fact"), str(tmp_path / "dim")


def _fact(spark, rows):
    return spark.createDataFrame(rows, "k long, cust long, x long")


def _dim(spark, rows):
    return spark.createDataFrame(rows, "cust long, seg string")


def _rollup(spark, fp, dp, **kw):
    return sorted(tuple(r) for r in join_rollup(
        spark, fp, dp, "cust", ["seg"], {"sx": "x"}, **kw).collect())


def test_incremental_equals_recompute_through_lifecycle(spark, paths):
    fp, dp = paths
    tx.txlog_create(spark, fp, _fact(spark, [
        (i, i % 10, 100 + i) for i in range(50)]), ("cust",), 4)
    tx.txlog_create(spark, dp, _dim(spark, [
        (c, "A" if c < 5 else "B") for c in range(10)]), ("cust",), 2)
    stored = join_rollup(spark, fp, dp, "cust", ["seg"], {"sx": "x"})

    def merge_fact(s, d):
        return s.unionByName(d).groupBy("k").agg(
            F.max("cust").alias("cust"), F.max("x").alias("x"))

    def merge_dim(s, d):
        return (s.join(d.select(F.col("cust").alias("c2"),
                                F.col("seg").alias("s2")),
                       F.col("cust") == F.col("c2"), "full")
                .select(F.coalesce("cust", "c2").alias("cust"),
                        F.coalesce("s2", "seg").alias("seg")))

    # 1) fact inserts + updates
    fv1, dv1 = 1, 1
    tx.txlog_upsert(spark, fp, _fact(spark, [
        (i, i % 10, 1000 + i) for i in range(40, 70)]),
        merge_fact, ("cust",), 4)
    got = incremental_join_rollup(
        spark, fp, dp, stored, "cust", ["seg"], {"sx": "x"},
        fact_from=fv1, dim_from=dv1)
    assert sorted(map(tuple, got.collect())) == _rollup(spark, fp, dp)

    # 2) dim reclassification (update = delete+insert in the feed)
    stored = join_rollup(spark, fp, dp, "cust", ["seg"], {"sx": "x"})
    fv2 = tx.txlog_snapshot(fp)["version"]
    dv2 = tx.txlog_snapshot(dp)["version"]
    tx.txlog_upsert(spark, dp, _dim(spark, [(3, "C"), (7, "C")]),
                    merge_dim, ("cust",), 2)
    got = incremental_join_rollup(
        spark, fp, dp, stored, "cust", ["seg"], {"sx": "x"},
        fact_from=fv2, dim_from=dv2)
    assert sorted(map(tuple, got.collect())) == _rollup(spark, fp, dp)

    # 3) both sides move at once; a group empties and must drop
    stored = got
    fv3 = tx.txlog_snapshot(fp)["version"]
    dv3 = tx.txlog_snapshot(dp)["version"]
    tx.txlog_delete(spark, fp,
                    spark.createDataFrame([(c,) for c in (3, 7)],
                                          "cust long"),
                    ("cust",), 4)  # all C-segment facts gone
    tx.txlog_upsert(spark, dp, _dim(spark, [(0, "B")]),
                    merge_dim, ("cust",), 2)
    got = incremental_join_rollup(
        spark, fp, dp, stored, "cust", ["seg"], {"sx": "x"},
        fact_from=fv3, dim_from=dv3)
    want = _rollup(spark, fp, dp)
    assert sorted(map(tuple, got.collect())) == want
    assert not any(r[0] == "C" for r in want)  # emptied group absent

    # 4) nothing moved: stored returned as-is
    fv4 = tx.txlog_snapshot(fp)["version"]
    dv4 = tx.txlog_snapshot(dp)["version"]
    again = incremental_join_rollup(
        spark, fp, dp, got, "cust", ["seg"], {"sx": "x"},
        fact_from=fv4, dim_from=dv4)
    assert again is got


def test_dim_delta_prunes_fact_buckets(spark, paths):
    from sstable_hadoop_spark.operators.ivm import _read_fact_buckets

    fp, dp = paths
    tx.txlog_create(spark, fp, _fact(spark, [
        (i, i % 16, i) for i in range(160)]), ("cust",), 16)
    snap = tx.txlog_snapshot(fp)
    keys = spark.createDataFrame([(3,)], "cust long")
    pruned = _read_fact_buckets(spark, fp, snap["version"], "cust", keys)
    n_files = pruned.select(F.input_file_name()).distinct().count()
    assert n_files < len(snap["files"])
    # pruning never loses the matching rows
    assert pruned.filter(F.col("cust") == 3).count() == 10


# --- model check -------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ivm_op = st.one_of(
    st.tuples(st.just("fact_upsert"), st.integers(0, 59),
              st.integers(0, 19), st.integers(1, 500)),
    st.tuples(st.just("fact_delete"), st.integers(0, 9)),
    st.tuples(st.just("dim_move"), st.integers(0, 9),
              st.sampled_from(["A", "B", "C", "D"])),
    st.tuples(st.just("dim_drop"), st.integers(0, 9)),
)


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=st.lists(_ivm_op, min_size=1, max_size=4))
def test_ivm_model_based(spark, tmp_path, ops):
    """Model-based property: after ANY sequence of fact upserts/
    deletes and dim reclassifications/drops, advancing the stored
    rollup from the pre-sequence versions must equal the full
    recompute at the heads (and a dict model of the view)."""
    import uuid as _uuid

    from sstable_hadoop_spark.operators import txlog as tx

    fp = str(tmp_path / f"f{_uuid.uuid4().hex[:8]}")
    dp = str(tmp_path / f"d{_uuid.uuid4().hex[:8]}")
    facts = {i: (i % 10, 100 + i) for i in range(30)}  # k -> (cust, x)
    dims = {c: "A" if c < 5 else "B" for c in range(10)}
    tx.txlog_create(spark, fp, _fact(
        spark, [(k, c, x) for k, (c, x) in sorted(facts.items())]),
        ("cust",), 4)
    tx.txlog_create(spark, dp, _dim(spark, sorted(dims.items())),
                    ("cust",), 2)
    stored = join_rollup(spark, fp, dp, "cust", ["seg"], {"sx": "x"},
                         fact_version=1, dim_version=1)

    def merge_fact(s, d):
        return s.unionByName(d).groupBy("k").agg(
            F.max("cust").alias("cust"), F.max("x").alias("x"))

    def merge_dim(s, d):
        d2 = d.select(F.col("cust").alias("c2"),
                      F.col("seg").alias("s2"))
        return (s.join(d2, F.col("cust") == F.col("c2"), "full")
                 .select(F.coalesce("cust", "c2").alias("cust"),
                         F.coalesce("s2", "seg").alias("seg")))

    for op in ops:
        if op[0] == "fact_upsert":
            # cust derives from k: the bucket key must be stable under
            # merge (the engine loudly refuses a merge that moves a
            # row between buckets), so op[2] only perturbs x
            k, x = op[1], op[3] + op[2]
            c = k % 10
            if k in facts:
                facts[k] = (c, max(facts[k][1], x))
            else:
                facts[k] = (c, x)
            tx.txlog_upsert(spark, fp, _fact(spark, [(k, c, x)]),
                            merge_fact, ("cust",), 4)
        elif op[0] == "fact_delete":
            c = op[1]
            doomed = [k for k, (fc, _) in facts.items() if fc == c]
            for k in doomed:
                facts.pop(k)
            tx.txlog_delete(
                spark, fp,
                spark.createDataFrame([(c,)], "cust long"),
                ("cust",), 4)
        elif op[0] == "dim_move":
            c, seg = op[1], op[2]
            dims[c] = seg
            tx.txlog_upsert(spark, dp, _dim(spark, [(c, seg)]),
                            merge_dim, ("cust",), 2)
        elif op[0] == "dim_drop":
            c = op[1]
            dims.pop(c, None)
            tx.txlog_delete(
                spark, dp,
                spark.createDataFrame([(c,)], "cust long"),
                ("cust",), 2)

    got = sorted(map(tuple, incremental_join_rollup(
        spark, fp, dp, stored, "cust", ["seg"], {"sx": "x"},
        fact_from=1, dim_from=1).collect()))
    assert got == _rollup(spark, fp, dp)
    # dict model of the final view
    model = {}
    for k, (c, x) in facts.items():
        if c in dims:
            n, sx = model.get(dims[c], (0, 0))
            model[dims[c]] = (n + 1, sx + x)
    want = sorted((seg, n, sx) for seg, (n, sx) in model.items())
    assert got == want
    # the LEFT view over the same sequence (NULL-group maintenance)
    stored_left = join_rollup(spark, fp, dp, "cust", ["seg"],
                              {"sx": "x"}, fact_version=1,
                              dim_version=1, how="left")
    got_left = sorted(
        ((r[0] is None, r[0]), r[1], r[2])
        for r in incremental_join_rollup(
            spark, fp, dp, stored_left, "cust", ["seg"], {"sx": "x"},
            fact_from=1, dim_from=1, how="left").collect())
    model_l = dict(model)
    dangling = [(c, x) for k, (c, x) in facts.items()
                if c not in dims]
    if dangling:
        model_l[None] = (len(dangling), sum(x for _, x in dangling))
    want_l = sorted(((seg is None, seg), n, sx)
                    for seg, (n, sx) in model_l.items())
    assert got_left == want_l


# --- left-join views ---------------------------------------------------------

def _rollup_left(spark, fp, dp, **kw):
    return sorted(
        ((r[0] is None, r[0]), r[1], r[2]) for r in join_rollup(
            spark, fp, dp, "cust", ["seg"], {"sx": "x"},
            how="left", **kw).collect())


def _sorted_left(df):
    return sorted(((r[0] is None, r[0]), r[1], r[2])
                  for r in df.collect())


def test_left_join_view_maintains_null_group(spark, paths):
    fp, dp = paths
    # facts for custs 0..11; dim only knows 0..7 -> 8..11 dangle
    tx.txlog_create(spark, fp, _fact(spark, [
        (i, i % 12, 10 + i) for i in range(60)]), ("cust",), 4)
    tx.txlog_create(spark, dp, _dim(spark, [
        (c, "A" if c < 4 else "B") for c in range(8)]), ("cust",), 2)
    stored = join_rollup(spark, fp, dp, "cust", ["seg"], {"sx": "x"},
                         how="left")
    assert any(r[0] is None for r in stored.collect())  # NULL group

    def merge_fact(s, d):
        return s.unionByName(d).groupBy("k").agg(
            F.max("cust").alias("cust"), F.max("x").alias("x"))

    def merge_dim(s, d):
        d2 = d.select(F.col("cust").alias("c2"),
                      F.col("seg").alias("s2"))
        return (s.join(d2, F.col("cust") == F.col("c2"), "full")
                 .select(F.coalesce("cust", "c2").alias("cust"),
                         F.coalesce("s2", "seg").alias("seg")))

    # 1) fact inserts for BOTH matched and dangling keys
    fv, dv = 1, 1
    tx.txlog_upsert(spark, fp, _fact(spark, [
        (100 + i, i % 12, 1000 + i) for i in range(24)]),
        merge_fact, ("cust",), 4)
    got = incremental_join_rollup(
        spark, fp, dp, stored, "cust", ["seg"], {"sx": "x"},
        fact_from=fv, dim_from=dv, how="left")
    assert _sorted_left(got) == _rollup_left(spark, fp, dp)

    # 2) dim ENTERS keys 8,9 (their facts leave the NULL group) and
    #    DROPS key 0 (its facts join it), plus a reclassification
    stored = join_rollup(spark, fp, dp, "cust", ["seg"], {"sx": "x"},
                         how="left")
    fv = tx.txlog_snapshot(fp)["version"]
    dv = tx.txlog_snapshot(dp)["version"]
    tx.txlog_upsert(spark, dp, _dim(spark, [(8, "C"), (9, "C"),
                                            (3, "B")]),
                    merge_dim, ("cust",), 2)
    tx.txlog_delete(spark, dp,
                    spark.createDataFrame([(0,)], "cust long"),
                    ("cust",), 2)
    got = incremental_join_rollup(
        spark, fp, dp, stored, "cust", ["seg"], {"sx": "x"},
        fact_from=fv, dim_from=dv, how="left")
    want = _rollup_left(spark, fp, dp)
    assert _sorted_left(got) == want
    assert any(k[0] for k, _, _ in want)  # NULL group still present

    # 3) both sides at once from the original base versions
    got_all = incremental_join_rollup(
        spark, fp, dp,
        join_rollup(spark, fp, dp, "cust", ["seg"], {"sx": "x"},
                    fact_version=1, dim_version=1, how="left"),
        "cust", ["seg"], {"sx": "x"},
        fact_from=1, dim_from=1, how="left")
    assert _sorted_left(got_all) == want


def test_left_join_view_rejects_other_hows(spark, paths):
    fp, dp = paths
    tx.txlog_create(spark, fp, _fact(spark, [(1, 1, 1)]), ("cust",), 2)
    tx.txlog_create(spark, dp, _dim(spark, [(1, "A")]), ("cust",), 2)
    stored = join_rollup(spark, fp, dp, "cust", ["seg"], {"sx": "x"})
    with pytest.raises(ValueError, match="inner|left"):
        incremental_join_rollup(
            spark, fp, dp, stored, "cust", ["seg"], {"sx": "x"},
            fact_from=1, dim_from=1, how="full")


# --- incremental distinct (HLL registers, append-only) ----------------------

def test_incremental_distinct_equals_rebuild(spark, paths):
    from sstable_hadoop_spark.operators.ivm import (
        incremental_distinct_registers,
    )
    from sstable_hadoop_spark.operators.sketch import (
        hll_build_grouped,
        hll_estimate_grouped,
    )

    fp, _ = paths
    tx.txlog_create(spark, fp, _fact(spark, [
        (i, i % 4, i % 37) for i in range(80)]), ("cust",), 4)
    stored = hll_build_grouped(
        tx.txlog_read(spark, fp), "x", ["cust"], p=6)

    def merge_insert_only(s, d):
        return s.unionByName(d)  # pure append: no key rewritten

    # two append waves; registers must equal the full rebuild EXACTLY
    for lo, hi in ((100, 160), (200, 230)):
        v_from = tx.txlog_snapshot(fp)["version"]
        tx.txlog_upsert(spark, fp, _fact(spark, [
            (i, i % 4, i % 53) for i in range(lo, hi)]),
            merge_insert_only, ("cust",), 4)
        stored = incremental_distinct_registers(
            spark, fp, stored, "x", ["cust"], fact_from=v_from, p=6)
    want = hll_build_grouped(tx.txlog_read(spark, fp), "x",
                             ["cust"], p=6)
    assert sorted(map(tuple, stored.collect())) \
        == sorted(map(tuple, want.collect()))
    est_inc = sorted(map(tuple, hll_estimate_grouped(
        stored, ["cust"], p=6).collect()))
    est_full = sorted(map(tuple, hll_estimate_grouped(
        want, ["cust"], p=6).collect()))
    assert est_inc == est_full

    # no-op window returns stored untouched
    head = tx.txlog_snapshot(fp)["version"]
    assert incremental_distinct_registers(
        spark, fp, stored, "x", ["cust"], fact_from=head) is stored


def test_incremental_distinct_refuses_deletes(spark, paths):
    from sstable_hadoop_spark.operators.ivm import (
        incremental_distinct_registers,
    )
    from sstable_hadoop_spark.operators.sketch import hll_build_grouped

    fp, _ = paths
    tx.txlog_create(spark, fp, _fact(spark, [
        (i, i % 4, i) for i in range(40)]), ("cust",), 4)
    stored = hll_build_grouped(
        tx.txlog_read(spark, fp), "x", ["cust"], p=6)
    tx.txlog_delete(spark, fp,
                    spark.createDataFrame([(1,)], "cust long"),
                    ("cust",), 4)
    with pytest.raises(ValueError, match="cannot subtract"):
        incremental_distinct_registers(
            spark, fp, stored, "x", ["cust"], fact_from=1, p=6)
