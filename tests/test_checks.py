"""Data-quality constraint suite (operators/checks.py): every rule
kind against a hand-built table with known violations, the one-pass
plan shape, and the loud-guard edges."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F  # noqa: F401


def _df(spark):
    rows = [
        (1, "a@x.com", 10.0, "red"),
        (2, "b@y.org", 55.5, "green"),
        (2, None, -3.0, "blue"),          # dup id, null email, below min
        (4, "not-an-email", 120.0, "red"),   # bad regex, above max
        (5, "c@z.net", None, "purple"),      # null score, bad color
    ]
    return spark.createDataFrame(
        rows, "id int, email string, score double, color string")


def test_check_constraints_all_rule_kinds(spark):
    from sstable_hadoop_spark.operators.checks import check_constraints

    rules = [
        {"rule": "not_null", "column": "email"},
        {"rule": "not_null", "column": "id"},
        {"rule": "unique", "columns": ["id"]},
        {"rule": "range", "column": "score", "min": 0.0, "max": 100.0},
        {"rule": "regex", "column": "email",
         "pattern": r"^[^@]+@[^@]+\.[a-z]+$"},
        {"rule": "accepted_values", "column": "color",
         "values": ["red", "green", "blue"]},
        {"rule": "row_count", "min": 5, "max": 5},
        {"rule": "row_count", "min": 6},
    ]
    rep = {r["rule_id"]: r for r in
           check_constraints(_df(spark), rules).collect()}
    assert len(rep) == len(rules)
    assert (rep[0]["metric"], rep[0]["violations"],
            rep[0]["passed"]) == (5, 1, False)
    assert (rep[1]["violations"], rep[1]["passed"]) == (0, True)
    assert (rep[2]["metric"], rep[2]["violations"],
            rep[2]["passed"]) == (5, 1, False)   # id=2 twice
    # range: 4 non-null scores, two outside [0, 100]
    assert (rep[3]["metric"], rep[3]["violations"]) == (4, 2)
    # regex: 4 non-null emails, one bad
    assert (rep[4]["metric"], rep[4]["violations"]) == (4, 1)
    # accepted_values: 5 non-null colors, one bad
    assert (rep[5]["metric"], rep[5]["violations"]) == (5, 1)
    assert rep[6]["passed"] is True and rep[6]["metric"] == 5
    assert rep[7]["passed"] is False and rep[7]["violations"] == 0
    # targets name the checked columns
    assert rep[0]["target"] == "email" and rep[6]["target"] == "*"


def test_check_constraints_null_keyed_duplicates_count(spark):
    """unique wraps keys in a struct, so two rows with NULL keys ARE
    duplicates of each other (plain countDistinct would skip them)."""
    from sstable_hadoop_spark.operators.checks import check_constraints

    df = spark.createDataFrame(
        [(None, 1), (None, 2), (3, 3)], "k int, v int")
    row = check_constraints(
        df, [{"rule": "unique", "columns": ["k"]}]).collect()[0]
    assert (row["metric"], row["violations"]) == (3, 1)


def test_check_constraints_one_pass_plan(spark):
    from sstable_hadoop_spark.operators.checks import check_constraints

    rules = [{"rule": "not_null", "column": "id"},
             {"rule": "range", "column": "score", "min": 0},
             {"rule": "row_count", "min": 1}]
    out = check_constraints(_df(spark), rules)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan            # fused aggs, no rule joins
    assert plan.count("Scan ") <= 1 or plan.count("Scan\n") <= 1


def test_check_constraints_sql_and_freshness(spark):
    """r10 extras: arbitrary SQL predicates (NULL evaluations are
    violations, not passes) and explicit-clock freshness."""
    from sstable_hadoop_spark.operators.checks import check_constraints

    df = spark.createDataFrame(
        [(1, 5, 100), (2, 1, 200), (3, None, 300)],
        "a int, b int, ts long")
    rules = [
        {"rule": "sql", "predicate": "a <= b", "name": "a_le_b"},
        {"rule": "sql", "predicate": "a > 0"},
        {"rule": "freshness", "column": "ts", "now": 350,
         "max_age": 100},
        {"rule": "freshness", "column": "ts", "now": 1000,
         "max_age": 100},
    ]
    rep = {r["rule_id"]: r for r in
           check_constraints(df, rules).collect()}
    # a<=b: row1 passes, row2 fails, row3 NULL -> violation
    assert (rep[0]["violations"], rep[0]["passed"]) == (2, False)
    assert rep[0]["target"] == "a_le_b"
    assert rep[1]["passed"] is True and rep[1]["target"] == "a > 0"
    # max(ts)=300 >= 350-100 -> fresh; >= 1000-100 -> stale
    assert rep[2]["metric"] == 300 and rep[2]["passed"] is True
    assert rep[3]["passed"] is False
    import pytest as _pytest
    with _pytest.raises(ValueError, match="predicate"):
        check_constraints(df, [{"rule": "sql"}])
    with _pytest.raises(ValueError, match="explicit now"):
        check_constraints(df, [{"rule": "freshness", "column": "ts"}])


def test_check_constraints_guards(spark):
    from sstable_hadoop_spark.operators.checks import check_constraints

    df = _df(spark)
    with pytest.raises(ValueError, match="at least one"):
        check_constraints(df, [])
    with pytest.raises(ValueError, match="unknown rule"):
        check_constraints(df, [{"rule": "sorted", "column": "id"}])
    with pytest.raises(ValueError, match="min and/or max"):
        check_constraints(df, [{"rule": "range", "column": "id"}])
    with pytest.raises(ValueError, match="empty"):
        check_constraints(df, [{"rule": "accepted_values",
                                "column": "color", "values": []}])
    with pytest.raises(ValueError, match="min/max"):
        check_constraints(df, [{"rule": "row_count"}])
