"""Sketch operator tests (operators/sketch.py): count-min (one-sided
error bound, shard mergeability, bounded size, token_col mode) and
portable HyperLogLog (register semantics, merge == union, integer
estimator accuracy) — the properties the driver rows certify at
corpus scale, pinned here on hand-checkable inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sstable_hadoop_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_merge,
    cms_positions,
    cms_topk_report,
    hll_build,
    hll_estimate,
    hll_merge,
    hll_report,
)


def _docs(spark):
    rows = [
        (1, "alpha beta gamma alpha alpha"),
        (2, "beta beta delta epsilon"),
        (3, "zeta eta theta iota kappa lam mu nu xi omicron pi rho"),
        (4, ""),
        (5, None),
    ]
    return spark.createDataFrame(rows, "doc_id int, text string")


def _exact_counts(spark):
    return {
        "alpha": 3, "beta": 3, "gamma": 1, "delta": 1, "epsilon": 1,
        "zeta": 1, "eta": 1, "theta": 1, "iota": 1, "kappa": 1,
        "lam": 1, "mu": 1, "nu": 1, "xi": 1, "omicron": 1, "pi": 1,
        "rho": 1,
    }


def test_cms_never_underestimates_even_at_tiny_width(spark):
    # width 4 over 17 distinct words: every cell collides, the
    # estimate must still upper-bound every true count.
    df = _docs(spark)
    exact = _exact_counts(spark)
    words = spark.createDataFrame([(w,) for w in exact], "word string")
    sk = cms_build(df, depth=3, width=4)
    est = {r["word"]: r["est_c"]
           for r in cms_estimate(sk, words, depth=3, width=4).collect()}
    assert set(est) == set(exact)
    for w, c in exact.items():
        assert est[w] >= c, (w, est[w], c)


def test_cms_exact_at_ample_width(spark):
    # 17 words into 4x4096 cells: collisions are possible but did not
    # occur for this fixed input (pinned — md5 is deterministic), so
    # every estimate is exact.
    df = _docs(spark)
    exact = _exact_counts(spark)
    rep = {r["word"]: r for r in
           cms_topk_report(df, k=30, depth=4, width=4096).collect()}
    assert {w: r["est_c"] for w, r in rep.items()} == exact
    assert all(r["over_bp"] == 0 for r in rep.values())
    assert all(r["exact_c"] == exact[w] for w, r in rep.items())


def test_cms_merge_equals_whole_corpus_sketch(spark):
    df = _docs(spark)
    d, w = 4, 8
    shard1 = cms_build(df.filter("doc_id <= 2"), depth=d, width=w)
    shard2 = cms_build(df.filter("doc_id > 2"), depth=d, width=w)
    merged = {(r["row"], r["pos"]): r["c"]
              for r in cms_merge(shard1, shard2).collect()}
    whole = {(r["row"], r["pos"]): r["c"]
             for r in cms_build(df, depth=d, width=w).collect()}
    assert merged == whole


def test_cms_bounded_size_and_absent_word_zero(spark):
    df = _docs(spark)
    d, w = 5, 4
    sk = cms_build(df, depth=d, width=w)
    assert sk.count() <= d * w
    rows = sk.collect()
    assert all(0 <= r["row"] < d and 0 <= r["pos"] < w for r in rows)
    # absent word against an EMPTY sketch estimates 0 (left-join path)
    empty = cms_build(df.filter("doc_id < 0"), depth=d, width=w)
    words = spark.createDataFrame([("ghost",)], "word string")
    est = cms_estimate(empty, words, depth=d, width=w).collect()
    assert est[0]["est_c"] == 0


def test_cms_token_col_mode(spark):
    df = spark.createDataFrame(
        [(1, "a.com"), (2, "b.com"), (3, "a.com"), (4, None)],
        "id int, domain string")
    sk = cms_build(df, token_col="domain", depth=4, width=64)
    words = spark.createDataFrame([("a.com",), ("b.com",)], "word string")
    est = {r["word"]: r["est_c"]
           for r in cms_estimate(sk, words, depth=4, width=64).collect()}
    assert est["a.com"] >= 2 and est["b.com"] >= 1


def test_cms_positions_shape_and_range(spark):
    df = spark.createDataFrame([("alpha",)], "w string")
    pos = df.select(cms_positions(F.col("w"), 6, 32).alias("p")) \
            .collect()[0]["p"]
    assert len(pos) == 6
    assert all(0 <= p < 32 for p in pos)
    # deterministic across calls
    pos2 = df.select(cms_positions(F.col("w"), 6, 32).alias("p")) \
             .collect()[0]["p"]
    assert pos == pos2


def test_cms_param_guards(spark):
    df = _docs(spark)
    with pytest.raises(ValueError, match="depth"):
        cms_build(df, depth=0, width=16)
    with pytest.raises(ValueError, match="width"):
        cms_build(df, depth=4, width=1 << 27)
    with pytest.raises(ValueError, match="at least one"):
        cms_merge()


def test_hll_registers_bounded_and_valid(spark):
    df = spark.range(5000).select(F.col("id").cast("string").alias("v"))
    p = 6
    regs = hll_build(df, "v", p=p).collect()
    assert len(regs) <= 1 << p
    # rho range: 1 .. (61 - p); buckets in [0, 2^p)
    assert all(0 <= r["bucket"] < (1 << p) for r in regs)
    assert all(1 <= r["rho"] <= 61 - p for r in regs)


def test_hll_merge_equals_union_registers(spark):
    df = spark.range(8000).select(F.col("id").alias("v"))
    a = hll_build(df.filter("v < 5000"), "v", p=7)
    b = hll_build(df.filter("v >= 3000"), "v", p=7)  # overlapping
    merged = {r["bucket"]: r["rho"] for r in hll_merge(a, b).collect()}
    whole = {r["bucket"]: r["rho"]
             for r in hll_build(df, "v", p=7).collect()}
    assert merged == whole
    # estimate from merged shards == estimate from the whole corpus
    em = hll_estimate(hll_merge(a, b), p=7).collect()[0]["est_distinct"]
    ew = hll_estimate(hll_build(df, "v", p=7), p=7).collect()[0][
        "est_distinct"]
    assert em == ew


def test_hll_report_accuracy_raw_regime(spark):
    # n = 10000 >> 2.5 * 256: raw estimator applies; the standard
    # error for p=8 is ~6.5%, assert a loose 3-sigma band (the value
    # is DETERMINISTIC for this input — the bound documents intent).
    df = spark.range(10000).select(F.col("id").alias("v"))
    r = hll_report(df, "v", p=8).collect()[0]
    assert r["exact_distinct"] == 10000
    assert abs(r["err_bp"]) < 2000, r
    assert r["est_distinct"] > 0


def test_hll_ignores_nulls_and_counts_duplicates_once(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), (None,)], "v string")
    regs_dup = {r["bucket"]: r["rho"]
                for r in hll_build(df, "v", p=4).collect()}
    dedup = spark.createDataFrame([("a",), ("b",)], "v string")
    regs_once = {r["bucket"]: r["rho"]
                 for r in hll_build(dedup, "v", p=4).collect()}
    assert regs_dup == regs_once


def test_hll_param_guards(spark):
    df = spark.range(10).select(F.col("id").alias("v"))
    with pytest.raises(ValueError, match="p must be"):
        hll_build(df, "v", p=3)
    with pytest.raises(ValueError, match="p must be"):
        hll_estimate(hll_build(df, "v", p=8), p=17)
    with pytest.raises(ValueError, match="at least one"):
        hll_merge()


def test_hll_low_occupancy_no_long_wrap(spark):
    # n = 2.5m exactly (the raw-regime floor): many registers hold
    # rho=1, whose scaled term is the largest — under the old 2^64
    # scale that term wrapped LONG and inflated the estimate ~7x
    # (est 4633 for 640 truth).  Pin the repaired arithmetic.
    df = spark.range(640).select(F.col("id").alias("v"))
    r = hll_report(df, "v", p=8).collect()[0]
    assert r["exact_distinct"] == 640
    assert 400 < r["est_distinct"] < 900, r  # sane raw-regime band
    regs = hll_build(df, "v", p=8)
    assert regs.filter("rho = 1").count() > 0  # the case is exercised


def test_hll_empty_input_estimates_zero(spark):
    empty = spark.range(0).select(F.col("id").alias("v"))
    r = hll_report(empty, "v", p=8).collect()[0]
    assert tuple(r) == (0, 0, 0)
    # estimate straight from an empty register table too
    est = hll_estimate(hll_build(empty, "v", p=8), p=8).collect()
    assert est[0]["est_distinct"] == 0


def test_hll_grouped_matches_per_slice_build(spark):
    from sstable_hadoop_spark.operators.sketch import (
        hll_build_grouped,
        hll_estimate_grouped,
    )

    df = spark.range(9000).select((F.col("id") % 3).alias("g"),
                                  F.col("id").alias("v"))
    regs = hll_build_grouped(df, "v", ["g"], p=7)
    est = {r["g"]: r["est_distinct"]
           for r in hll_estimate_grouped(regs, ["g"], p=7).collect()}
    assert set(est) == {0, 1, 2}
    for g in (0, 1, 2):
        slice_est = hll_estimate(
            hll_build(df.filter(f"g = {g}"), "v", p=7),
            p=7).collect()[0]["est_distinct"]
        assert est[g] == slice_est, g
    # per-group register count bounded
    from collections import Counter

    c = Counter(r["g"] for r in regs.collect())
    assert all(v <= 1 << 7 for v in c.values())


def test_hll_grouped_shard_rollup(spark):
    # same-group registers from two shards roll up with max(rho) into
    # the whole-corpus grouped sketch — the daily->monthly story
    from sstable_hadoop_spark.operators.sketch import hll_build_grouped

    df = spark.range(6000).select((F.col("id") % 2).alias("g"),
                                  F.col("id").alias("v"))
    a = hll_build_grouped(df.filter("v < 4000"), "v", ["g"], p=6)
    b = hll_build_grouped(df.filter("v >= 2000"), "v", ["g"], p=6)
    merged = {(r["g"], r["bucket"]): r["rho"]
              for r in a.unionByName(b).groupBy("g", "bucket")
                        .agg(F.max("rho").alias("rho")).collect()}
    whole = {(r["g"], r["bucket"]): r["rho"]
             for r in hll_build_grouped(df, "v", ["g"], p=6).collect()}
    assert merged == whole


def test_hll_grouped_guards(spark):
    from sstable_hadoop_spark.operators.sketch import (
        hll_build_grouped,
        hll_estimate_grouped,
    )

    df = spark.range(10).select(F.lit("a").alias("g"),
                                F.col("id").alias("v"))
    with pytest.raises(ValueError, match="group_cols"):
        hll_build_grouped(df, "v", [])
    with pytest.raises(ValueError, match="group_cols"):
        hll_estimate_grouped(hll_build_grouped(df, "v", ["g"]), [])


# --- HDR quantile sketch -------------------------------------------------


def _hdr_idx_py(v: int, s: int) -> int:
    m = 1 << s
    if v < m:
        return v
    e = v.bit_length() - 1
    return (e - s) * m + (v >> (e - s))


def test_hdr_index_bounds_roundtrip(spark):
    # lo <= v <= hi for values across the full magnitude range, and
    # the bucket width honours the 2^-sub_bits relative-error bound
    from sstable_hadoop_spark.operators.sketch import hdr_bounds, hdr_index

    s = 5
    vals = [0, 1, 2, 31, 32, 33, 63, 64, 65, 1000, 12345,
            (1 << 40) + 7, (1 << 62) - 1]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    lo, hi = hdr_bounds(F.col("idx"), s)
    rows = (df.select("v", hdr_index(F.col("v"), s).alias("idx"))
              .select("v", "idx", lo.alias("lo"), hi.alias("hi"))
              .collect())
    for r in rows:
        assert r["idx"] == _hdr_idx_py(r["v"], s), r
        assert r["lo"] <= r["v"] <= r["hi"], r
        width = r["hi"] - r["lo"] + 1
        if r["lo"] >= (1 << s):
            assert width * (1 << s) <= 2 * r["lo"], r  # rel err bound


def test_hdr_small_values_are_exact(spark):
    # every value below 2^sub_bits is its own singleton bucket, so
    # quantiles over a small-valued corpus are EXACT (err_bp == 0)
    from sstable_hadoop_spark.operators.sketch import hdr_report

    df = spark.range(100).select((F.col("id") % 50).alias("v"))
    rows = hdr_report(df, "v", [0, 250, 500, 900, 1000],
                      sub_bits=7).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["est_value"] == r["exact_value"], r
        assert r["err_bp"] == 0, r


def test_hdr_merge_equals_whole(spark):
    from sstable_hadoop_spark.operators.sketch import hdr_build, hdr_merge

    df = spark.range(5000).select(
        (F.col("id") * F.col("id") % 999983).alias("v"))
    a, b = df.filter("v % 2 = 0"), df.filter("v % 2 = 1")
    merged = {r["idx"]: r["c"]
              for r in hdr_merge(hdr_build(a, "v", sub_bits=6),
                                 hdr_build(b, "v", sub_bits=6)).collect()}
    whole = {r["idx"]: r["c"]
             for r in hdr_build(df, "v", sub_bits=6).collect()}
    assert merged == whole


def test_hdr_error_bound_wide_range(spark):
    # magnitudes spanning 2^0 .. 2^45: the signed relative error at
    # every probed quantile stays within 10000 / 2^sub_bits bp
    from sstable_hadoop_spark.operators.sketch import hdr_report

    s = 7
    df = spark.range(4000).select(
        F.expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(id % 46 AS INT)) "
               "+ id AS BIGINT)").alias("v"))
    rows = hdr_report(df, "v", [100, 500, 900, 990, 999],
                      sub_bits=s).collect()
    assert len(rows) == 5
    for r in rows:
        assert abs(r["err_bp"]) <= 10000 // (1 << s), r


def test_hdr_rank_matches_percentile_disc_definition(spark):
    # exact side == value at rank ceil(q*n) — pinned by hand on a
    # corpus where n is divisible by 10 (the regime where a DOUBLE-q
    # percentile_disc would round the rank up one row)
    from sstable_hadoop_spark.operators.sketch import hdr_report

    vals = list(range(1, 21))  # n = 20
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r["q_pm"]: r["exact_value"]
           for r in hdr_report(df, "v", [500, 900, 950], sub_bits=7)
           .collect()}
    # ceil(0.5*20)=10 -> 10; ceil(0.9*20)=18 -> 18; ceil(0.95*20)=19
    assert got == {500: 10, 900: 18, 950: 19}


def test_hdr_excludes_null_and_negative(spark):
    from sstable_hadoop_spark.operators.sketch import hdr_build

    df = spark.createDataFrame(
        [(None,), (-5,), (3,), (3,), (200,)], "v long")
    cells = {r["idx"]: r["c"]
             for r in hdr_build(df, "v", sub_bits=7).collect()}
    assert cells == {3: 2, _hdr_idx_py(200, 7): 1}


def test_hdr_empty_input(spark):
    from sstable_hadoop_spark.operators.sketch import (
        hdr_build,
        hdr_quantiles,
        hdr_report,
    )

    df = spark.createDataFrame([], "v long")
    assert hdr_build(df, "v").count() == 0
    assert hdr_quantiles(hdr_build(df, "v"), [500]).count() == 0
    assert hdr_report(df, "v", [500]).count() == 0


def test_hdr_guards(spark):
    from sstable_hadoop_spark.operators.sketch import (
        hdr_build,
        hdr_merge,
        hdr_quantiles,
    )

    df = spark.range(5).select(F.col("id").alias("v"))
    with pytest.raises(ValueError, match="sub_bits"):
        hdr_build(df, "v", sub_bits=0)
    with pytest.raises(ValueError, match="sub_bits"):
        hdr_build(df, "v", sub_bits=15)
    with pytest.raises(ValueError, match="at least one"):
        hdr_merge()
    sk = hdr_build(df, "v")
    with pytest.raises(ValueError, match="at least one"):
        hdr_quantiles(sk, [])
    with pytest.raises(ValueError, match="permille"):
        hdr_quantiles(sk, [1001])


def test_hdr_grouped_slice_equals_ungrouped(spark):
    # each group's rows of the grouped histogram == hdr_build over
    # just that group's values
    from sstable_hadoop_spark.operators.sketch import (
        hdr_build,
        hdr_build_grouped,
    )

    df = spark.range(3000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") * 17 % 99991).alias("v"))
    grouped = hdr_build_grouped(df, "v", ["g"], sub_bits=6)
    for g in range(3):
        got = {r["idx"]: r["c"]
               for r in grouped.filter(F.col("g") == g).collect()}
        want = {r["idx"]: r["c"]
                for r in hdr_build(df.filter(F.col("g") == g), "v",
                                   sub_bits=6).collect()}
        assert got == want, g


def test_hdr_grouped_shard_rollup(spark):
    from sstable_hadoop_spark.operators.sketch import hdr_build_grouped

    df = spark.range(4000).select(
        (F.col("id") % 2).alias("g"),
        (F.col("id") * 31 % 49999).alias("v"))
    a = hdr_build_grouped(df.filter("id < 2500"), "v", ["g"])
    b = hdr_build_grouped(df.filter("id >= 2500"), "v", ["g"])
    merged = {(r["g"], r["idx"]): r["c"]
              for r in a.unionByName(b).groupBy("g", "idx")
                        .agg(F.sum("c").alias("c")).collect()}
    whole = {(r["g"], r["idx"]): r["c"]
             for r in hdr_build_grouped(df, "v", ["g"]).collect()}
    assert merged == whole


def test_hdr_grouped_quantiles_match_per_group_ungrouped(spark):
    from sstable_hadoop_spark.operators.sketch import (
        hdr_build,
        hdr_build_grouped,
        hdr_quantiles,
        hdr_quantiles_grouped,
    )

    df = spark.range(2000).select(
        (F.col("id") % 2).alias("g"),
        (F.col("id") * F.col("id") % 77777).alias("v"))
    sk = hdr_build_grouped(df, "v", ["g"])
    got = {(r["g"], r["q_pm"]): r["est_value"]
           for r in hdr_quantiles_grouped(sk, ["g"], [500, 990])
           .collect()}
    for g in range(2):
        want = {r["q_pm"]: r["est_value"]
                for r in hdr_quantiles(
                    hdr_build(df.filter(F.col("g") == g), "v"),
                    [500, 990]).collect()}
        for q, v in want.items():
            assert got[(g, q)] == v, (g, q)


def test_hdr_grouped_guards(spark):
    from sstable_hadoop_spark.operators.sketch import (
        hdr_build_grouped,
        hdr_quantiles_grouped,
    )

    df = spark.range(5).select(F.lit("a").alias("g"),
                               F.col("id").alias("v"))
    with pytest.raises(ValueError, match="group_cols"):
        hdr_build_grouped(df, "v", [])
    sk = hdr_build_grouped(df, "v", ["g"])
    with pytest.raises(ValueError, match="group_cols"):
        hdr_quantiles_grouped(sk, [], [500])
    with pytest.raises(ValueError, match="permille"):
        hdr_quantiles_grouped(sk, ["g"], [])


def test_hll_set_report_union_merge_and_inclusion_exclusion(spark):
    from sstable_hadoop_spark.operators.sketch import (
        hll_build,
        hll_estimate,
        hll_merge,
        hll_set_report,
    )

    df = spark.range(4000).select(F.col("id").alias("v"))
    ca, cb = F.col("v") < 3000, F.col("v") >= 1000  # overlap 1000..2999
    row = hll_set_report(df, "v", ca, cb, p=6).collect()[0]
    assert row["exact_intersect"] == 2000
    # internal consistency: est_intersect is exactly the algebra
    assert row["est_intersect"] == (row["est_a"] + row["est_b"]
                                    - row["est_union"])
    # union estimate == estimate of the merged registers (by def)
    eu = hll_estimate(hll_merge(hll_build(df.where(ca), "v", p=6),
                                hll_build(df.where(cb), "v", p=6)),
                      p=6).collect()[0]["est_distinct"]
    assert row["est_union"] == eu
    # p=6 raw estimator: loose sanity bound, not luck-pinned
    assert abs(row["err_bp"]) < 5000


def test_hll_set_report_disjoint_can_go_negative_but_zero_exact(spark):
    from sstable_hadoop_spark.operators.sketch import hll_set_report

    df = spark.range(3000).select(F.col("id").alias("v"))
    row = hll_set_report(df, "v", F.col("v") < 1500,
                         F.col("v") >= 1500, p=6).collect()[0]
    assert row["exact_intersect"] == 0
    assert row["err_bp"] == 0  # defined 0 when exact is 0
