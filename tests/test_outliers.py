"""Rolling-outlier tests (operators/outliers.py): hand-checked sigma
test, self-exclusion, min_obs gating, lookback slide, Python
cross-check, guards."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sstable_hadoop_spark.operators.outliers import rolling_outliers


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "k string, tu long, v double")
    return (rolling_outliers(df, F.col("tu"), "k", "v", **kw)
            .orderBy("k", "ts_us").collect())


def test_spike_flagged_steady_not(spark):
    rows = [("a", t, 10.0) for t in range(10)] + [("a", 10, 50.0),
                                                  ("a", 11, 10.0)]
    out = _run(spark, rows, lookback=10, min_obs=5, k_milli=3000)
    flags = {r["ts_us"]: r["is_outlier"] for r in out}
    assert flags[10] == 1          # the spike
    assert all(flags[t] == 0 for t in range(10))  # steady history
    # after the spike, history variance is large; 10.0 is not 3 sigma
    assert flags[11] == 0


def test_history_excludes_self(spark):
    # constant history then one spike: with self-INCLUDED the spike
    # would inflate its own sigma; with exclusion variance is 0 and
    # any deviation flags
    rows = [("a", t, 5.0) for t in range(8)] + [("a", 8, 5.01)]
    out = _run(spark, rows, lookback=8, min_obs=8, k_milli=3000)
    assert out[-1]["is_outlier"] == 1  # sigma=0, any deviation flags


def test_min_obs_gates_early_rows(spark):
    rows = [("a", t, float(t * 100)) for t in range(6)]
    out = _run(spark, rows, lookback=10, min_obs=5, k_milli=1000)
    assert all(r["is_outlier"] == 0 for r in out[:5])
    assert all(r["n_prev"] == i for i, r in enumerate(out))


def test_matches_python_sample_sigma(spark):
    vals = [3.0, 4.0, 5.0, 4.5, 3.5, 4.2, 30.0, 4.1, 3.9, 4.4, 100.0]
    rows = [("a", t, v) for t, v in enumerate(vals)]
    out = _run(spark, rows, lookback=5, min_obs=3, k_milli=2500)
    for i, r in enumerate(out):
        hist = [round(v * 100) for v in vals[max(0, i - 5):i]]
        want = 0
        if len(hist) >= 3:
            n = len(hist)
            mu = sum(hist) / n
            var = sum((x - mu) ** 2 for x in hist) / (n - 1)
            want = int(abs(round(vals[i] * 100) - mu)
                       > 2.5 * math.sqrt(var))
        assert r["is_outlier"] == want, (i, vals[i])


def test_lookback_slides(spark):
    # an old spike leaves the window after `lookback` rows
    rows = ([("a", 0, 99.0)] + [("a", t, 5.0) for t in range(1, 12)]
            + [("a", 12, 5.2)])
    out = _run(spark, rows, lookback=4, min_obs=4, k_milli=3000)
    last = out[-1]
    # history for the last row is four 5.0s -> sigma 0 -> 5.2 flags
    assert last["n_prev"] == 4 and last["is_outlier"] == 1


def test_nulls_excluded_and_guards(spark):
    df = spark.createDataFrame(
        [("a", 1, None), (None, 2, 1.0), ("a", None, 1.0),
         ("a", 3, 1.0)],
        "k string, tu long, v double")
    out = rolling_outliers(df, F.col("tu"), "k", "v").collect()
    assert len(out) == 1
    with pytest.raises(ValueError, match="lookback"):
        rolling_outliers(df, F.col("tu"), "k", "v", lookback=1)
    with pytest.raises(ValueError, match="min_obs"):
        rolling_outliers(df, F.col("tu"), "k", "v", min_obs=1)
    with pytest.raises(ValueError, match="exceed"):
        rolling_outliers(df, F.col("tu"), "k", "v", lookback=4,
                         min_obs=5)
    with pytest.raises(ValueError, match="k_milli"):
        rolling_outliers(df, F.col("tu"), "k", "v", k_milli=0)
