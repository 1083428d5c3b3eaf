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
