"""Cohort-retention tests (operators/cohort.py): hand-built activity
matrix, offset-0 invariant, sparsity, max_offset cap, null exclusion,
guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sstable_hadoop_spark.operators.cohort import cohort_retention


def _acts(spark, rows):
    return spark.createDataFrame(rows, "u long, tu long")


def test_hand_built_matrix(spark):
    # step 10.  cohort 0: users 1,2 (first in [0,10)); cohort 10:
    # user 3.  user 1 returns in periods 10 and 20; user 2 never.
    rows = [(1, 1), (1, 12), (1, 25), (2, 3), (3, 15), (3, 16)]
    out = {(r["cohort_us"], r["offset"]): (r["n_users"],
                                           r["retained_bp"])
           for r in cohort_retention(_acts(spark, rows), F.col("tu"),
                                     "u", step_us=10).collect()}
    assert out == {
        (0, 0): (2, 10000), (0, 1): (1, 5000), (0, 2): (1, 5000),
        (10, 0): (1, 10000),
    }


def test_multiple_events_in_period_count_once(spark):
    rows = [(1, 1), (1, 2), (1, 3), (1, 11), (1, 12)]
    out = {(r["cohort_us"], r["offset"]): r["n_users"]
           for r in cohort_retention(_acts(spark, rows), F.col("tu"),
                                     "u", step_us=10).collect()}
    assert out == {(0, 0): 1, (0, 1): 1}


def test_gap_periods_are_sparse(spark):
    rows = [(1, 1), (1, 35)]  # active in periods 0 and 3 only
    out = {r["offset"] for r in
           cohort_retention(_acts(spark, rows), F.col("tu"), "u",
                            step_us=10).collect()}
    assert out == {0, 3}


def test_max_offset_cap(spark):
    rows = [(1, 1), (1, 15), (1, 95)]
    out = {r["offset"] for r in
           cohort_retention(_acts(spark, rows), F.col("tu"), "u",
                            step_us=10, max_offset=2).collect()}
    assert out == {0, 1}


def test_nulls_excluded(spark):
    df = spark.createDataFrame([(None, 5), (1, None), (1, 7)],
                               "u long, tu long")
    out = cohort_retention(df, F.col("tu"), "u", step_us=10).collect()
    assert len(out) == 1 and out[0]["n_users"] == 1


def test_guards(spark):
    df = _acts(spark, [(1, 1)])
    with pytest.raises(ValueError, match="step_us"):
        cohort_retention(df, F.col("tu"), "u", step_us=0)
    with pytest.raises(ValueError, match="max_offset"):
        cohort_retention(df, F.col("tu"), "u", step_us=10,
                         max_offset=-1)
