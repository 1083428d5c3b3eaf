"""One-pass exact correlation matrix (operators/stats.py): agreement
with an independent Python Pearson over the quantized values,
pairwise-complete null semantics, constant-column NULLs, partitioning
invariance, and guards."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

ROWS = [
    (1.0, 2.0, 10.0), (2.0, 4.1, 9.0), (3.0, 5.9, 8.5),
    (4.0, 8.2, 7.0), (5.0, 9.8, 9.0), (6.0, 12.1, 4.0),
    (None, 1.0, 2.0), (7.0, None, 1.0), (8.0, 16.0, None),
]


def _py_pearson(pairs, quant=100):
    xs = [round(a * quant) for a, b in pairs]
    ys = [round(b * quant) for a, b in pairs]
    n = len(pairs)
    sa, sb = sum(xs), sum(ys)
    saa = sum(x * x for x in xs)
    sbb = sum(y * y for y in ys)
    sab = sum(x * y for x, y in zip(xs, ys))
    da, db = n * saa - sa * sa, n * sbb - sb * sb
    if da <= 0 or db <= 0:
        return n, None
    r = (n * sab - sa * sb) / (math.sqrt(da) * math.sqrt(db))
    return n, math.floor(r * 10000 + 0.5)


def _got(spark, rows, cols=("x", "y", "z"), parts=1, quant=100):
    from sstable_hadoop_spark.operators.stats import corr_matrix

    df = spark.createDataFrame(rows, "x double, y double, z double") \
              .repartition(parts)
    return {(r["col_a"], r["col_b"]): (r["n"], r["corr_bp"])
            for r in corr_matrix(df, list(cols), quant=quant).collect()}


def test_matches_python_reference_pairwise_complete(spark):
    got = _got(spark, ROWS)
    for a, b, ia, ib in (("x", "y", 0, 1), ("x", "z", 0, 2),
                         ("y", "z", 1, 2)):
        pairs = [(r[ia], r[ib]) for r in ROWS
                 if r[ia] is not None and r[ib] is not None]
        assert got[(a, b)] == _py_pearson(pairs), (a, b)
    # the strongly-linear pair really is near-perfect
    assert got[("x", "y")][1] > 9900


def test_partitioning_invariance(spark):
    assert _got(spark, ROWS, parts=1) == _got(spark, ROWS, parts=7)


def test_constant_column_yields_null(spark):
    rows = [(1.0, 5.0, 1.0), (2.0, 5.0, 2.0), (3.0, 5.0, 3.0)]
    got = _got(spark, rows)
    assert got[("x", "y")] == (3, None)
    assert got[("x", "z")] == (3, 10000)


def test_guards(spark):
    from sstable_hadoop_spark.operators.stats import corr_matrix

    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="at least two"):
        corr_matrix(df, ["x"])
    with pytest.raises(ValueError, match="not in the frame"):
        corr_matrix(df.withColumn("y", F.lit(1.0)), ["x", "nope"])


# --- ols_fit ---------------------------------------------------------------

def _py_ols(rows, micro=1_000_000):
    """Dict model of the integer normal-equation spec."""
    def idiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    by_g = {}
    for g, x, y in rows:
        by_g.setdefault(g, []).append((x, y))
    out = {}
    for g, pts in by_g.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxx = sum(x * x for x, _ in pts)
        sxy = sum(x * y for x, y in pts)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        if den == 0:
            out[g] = (n, None, None)
            continue
        slope = idiv(num * micro, den)
        out[g] = (n, slope, idiv(sy * micro - slope * sx, n))
    return out


def _ols_got(spark, rows, parts=1):
    from sstable_hadoop_spark.operators.stats import ols_fit

    df = spark.createDataFrame(rows, "g string, x long, y long") \
              .repartition(parts)
    return {r.g: (r.n, r.slope_micro, r.intercept_micro)
            for r in ols_fit(df, "g", F.col("x"), F.col("y")).collect()}


OLS_ROWS = (
    [("up", x, 37 * x + 11 + (x % 3)) for x in range(1, 40)]
    + [("down", x, -5 * x + 1000 - (x % 7)) for x in range(1, 40)]
    + [("flat", 4, y) for y in (10, 20, 30)]     # constant x: den = 0
    + [("one", 9, 9)]                            # n = 1: den = 0
)


def test_ols_matches_integer_model(spark):
    assert _ols_got(spark, OLS_ROWS) == _py_ols(OLS_ROWS)


def test_ols_partitioning_invariance(spark):
    assert _ols_got(spark, OLS_ROWS, parts=1) \
        == _ols_got(spark, OLS_ROWS, parts=7)


def test_ols_negative_slope_truncates_toward_zero(spark):
    got = _ols_got(spark, OLS_ROWS)
    assert got["down"][1] < 0
    # cross-engine contract: DuckDB's // on the same integers
    import duckdb

    n, sx = 39, sum(range(1, 40))
    sy = sum(-5 * x + 1000 - (x % 7) for x in range(1, 40))
    sxy = sum(x * (-5 * x + 1000 - (x % 7)) for x in range(1, 40))
    sxx = sum(x * x for x in range(1, 40))
    duck = duckdb.sql(
        f"SELECT CAST({n}*{sxy} - {sx}*{sy} AS HUGEINT) * 1000000"
        f" // ({n}*{sxx} - {sx}*{sx})").fetchone()[0]
    assert got["down"][1] == int(duck)


def test_ols_null_den_groups_report_null(spark):
    got = _ols_got(spark, OLS_ROWS)
    assert got["flat"] == (3, None, None)
    assert got["one"] == (1, None, None)


# --- ewma_smooth -----------------------------------------------------------

def test_ewma_matches_python_model(spark):
    from sstable_hadoop_spark.operators.timeseries import ewma_smooth

    rows = [(k, t * 1000, float(v) / 100.0, k * 1000 + t)
            for k in (1, 2, 3)
            for t, v in enumerate([100, 250, 33, 900, 41, 7, 7, 7])]
    df = spark.createDataFrame(
        rows, "k long, tu long, value double, eid long").repartition(5)
    got = {(r.k, r.rn): (r.value_c, r.ewma_c)
           for r in ewma_smooth(df, "tu", "k", "value", shift=3,
                                tie_cols=("eid",)).collect()}
    for k in (1, 2, 3):
        s = None
        for t, v in enumerate([100, 250, 33, 900, 41, 7, 7, 7]):
            s = v if s is None else (v + 7 * s) // 8
            assert got[(k, t + 1)] == (v, s)


def test_ewma_guards_and_null_rows(spark):
    from sstable_hadoop_spark.operators.timeseries import ewma_smooth

    df = spark.createDataFrame(
        [(1, 1, 1.0), (1, None, 2.0), (None, 3, 3.0), (1, 4, None)],
        "k long, tu long, value double")
    assert ewma_smooth(df, "tu", "k", "value").count() == 1
    with pytest.raises(ValueError, match="shift"):
        ewma_smooth(df, "tu", "k", "value", shift=0)


def test_ols_degenerate_flag_distinguishes_null_modes(spark):
    """flag_degenerate=True appends a boolean ``degenerate`` column
    (den = 0) so a NULL coefficient from constant-x / n<2 groups is
    distinguishable from the documented extreme-magnitude DECIMAL(38)
    overflow-NULL mode (ADVICE r10); the default schema is unchanged."""
    from sstable_hadoop_spark.operators.stats import ols_fit

    df = spark.createDataFrame(
        [("fit", 1, 10), ("fit", 2, 20), ("fit", 3, 30),
         ("flat", 5, 1), ("flat", 5, 2), ("flat", 5, 3),
         ("one", 7, 7)],
        "g string, x int, y int")
    base = ols_fit(df, "g", "x", "y")
    assert base.columns == ["g", "n", "slope_micro",
                            "intercept_micro"]
    got = {r["g"]: r for r in
           ols_fit(df, "g", "x", "y", flag_degenerate=True).collect()}
    assert got["fit"]["degenerate"] is False
    assert got["fit"]["slope_micro"] is not None
    for g in ("flat", "one"):
        assert got[g]["degenerate"] is True
        assert got[g]["slope_micro"] is None


def test_ewma_vectorized_lockstep_matches_reference(spark):
    """r11 cross-key lockstep vectorization: many keys with RAGGED
    lengths, negative values, and timestamp ties must reproduce the
    arbitrary-precision Python recursion bit-for-bit (the int64
    vector path and the fallback share one contract)."""
    import random

    from sstable_hadoop_spark.operators.timeseries import ewma_smooth

    rng = random.Random(11)
    rows = []
    for k in range(40):                      # ragged: 1..25 obs
        for t in range(rng.randint(1, 25)):
            v = rng.randint(-10**6, 10**6)
            rows.append((k, (t // 3) * 1000,  # ties every 3 rows
                         v / 100.0, k * 100 + t))
    df = spark.createDataFrame(
        rows, "k long, tu long, value double, eid long").repartition(7)
    got = {(r.k, r.rn): r.ewma_c
           for r in ewma_smooth(df, "tu", "k", "value", shift=4,
                                tie_cols=("eid",)).collect()}
    # reference: exact Python ints in (tu, eid) order per key
    byk: dict[int, list] = {}
    for k, tu, val, eid in rows:
        byk.setdefault(k, []).append((tu, eid, val))
    n_checked = 0
    for k, obs in byk.items():
        s = None
        for rn, (_, _, val) in enumerate(sorted(obs), start=1):
            v = int((val * 100 + 0.5) // 1)  # floor(v*100 + .5)
            s = v if s is None else (
                (v + 15 * s) // 16 if v + 15 * s >= 0
                else -((-(v + 15 * s)) // 16))
            assert got[(k, rn)] == s, (k, rn)
            n_checked += 1
    assert n_checked == len(rows) == len(got)


def test_ewma_overflow_falls_back_exactly(spark):
    """Magnitudes past the int64 guard (|v| > 2^62/div) take the
    Python-int fallback and still match the exact recursion."""
    from sstable_hadoop_spark.operators.timeseries import ewma_smooth

    big = float(2**55)                       # v_c = 2^55 * 100 > 2^59
    df = spark.createDataFrame(
        [(1, t * 10, big, t) for t in range(5)]
        + [(2, t * 10, -big, t) for t in range(5)],
        "k long, tu long, value double, eid long")
    got = {(r.k, r.rn): r.ewma_c
           for r in ewma_smooth(df, "tu", "k", "value", shift=3,
                                tie_cols=("eid",)).collect()}
    for k, sign in ((1, 1), (2, -1)):
        v = int((sign * big * 100 + 0.5) // 1)
        s = None
        for rn in range(1, 6):
            q = None if s is None else v + 7 * s
            s = v if s is None else (
                q // 8 if q >= 0 else -((-q) // 8))
            assert got[(k, rn)] == s
