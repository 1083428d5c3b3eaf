"""Windowed-funnel tests (operators/funnel.py): hand-built event
chains exercising ordering, the window bound, one-event-one-step,
repeated step types, report rollup, guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sstable_hadoop_spark.operators.funnel import (
    funnel_reach,
    funnel_report,
)

STEPS = ["view", "click", "buy"]


def _events(spark, rows):
    return spark.createDataFrame(rows, "u long, tu long, t string")


def _reach(spark, rows, *, within=100, steps=STEPS):
    df = _events(spark, rows)
    return {r["u"]: r["reached"]
            for r in funnel_reach(df, F.col("tu"), "u", "t", steps,
                                  within_us=within).collect()}


def test_full_chain_and_partial(spark):
    rows = [
        (1, 10, "view"), (1, 20, "click"), (1, 30, "buy"),   # depth 3
        (2, 10, "view"), (2, 20, "click"),                   # depth 2
        (3, 10, "view"),                                     # depth 1
        (4, 10, "click"), (4, 20, "buy"),                    # no view
    ]
    assert _reach(spark, rows) == {1: 3, 2: 2, 3: 1}


def test_order_matters(spark):
    # click before view: only the view counts
    rows = [(1, 10, "click"), (1, 20, "view"), (1, 30, "buy")]
    assert _reach(spark, rows) == {1: 1}


def test_window_bound_is_chain_start_to_hop(spark):
    # view@0 click@50 buy@150: buy is 150 > 100 after the chain START
    # even though only 100 after the click -> depth 2.  A later
    # view@60 restarts a chain: click? none after 60. Still 2.
    rows = [(1, 0, "view"), (1, 50, "click"), (1, 60, "view"),
            (1, 150, "buy")]
    assert _reach(spark, rows) == {1: 2}


def test_later_start_rescues_window(spark):
    # two full chains; only the one starting at 100 fits the window
    rows = [(1, 0, "view"), (1, 100, "view"), (1, 150, "click"),
            (1, 190, "buy")]
    assert _reach(spark, rows) == {1: 3}


def test_one_event_cannot_advance_two_steps(spark):
    # steps with a repeated type: view, view, buy — needs TWO distinct
    # view events
    rows_one = [(1, 10, "view"), (1, 30, "buy")]
    rows_two = [(2, 10, "view"), (2, 20, "view"), (2, 30, "buy")]
    got = _reach(spark, rows_one + rows_two,
                 steps=["view", "view", "buy"])
    assert got == {1: 1, 2: 3}


def test_strictly_before_same_ts_cannot_chain(spark):
    rows = [(1, 10, "view"), (1, 10, "click")]
    # tie order is ambiguous without tie_cols; with ts-only order the
    # click's before-frame max is evaluated on row order — use
    # distinct ts everywhere in real data or pass tie_cols.  Here the
    # chain must NOT form when the click sorts first; with both
    # orders the click row's frame either holds the view (chain) or
    # not.  Pin determinism with a tie column:
    df = spark.createDataFrame(
        [(1, 10, 0, "click"), (1, 10, 1, "view")],
        "u long, tu long, eid int, t string")
    got = {r["u"]: r["reached"]
           for r in funnel_reach(df, F.col("tu"), "u", "t", STEPS,
                                 within_us=100,
                                 tie_cols=["eid"]).collect()}
    assert got == {1: 1}  # click sorts first, no view before it


def test_report_counts_and_conversion(spark):
    rows = [
        (1, 10, "view"), (1, 20, "click"), (1, 30, "buy"),
        (2, 10, "view"), (2, 20, "click"),
        (3, 10, "view"),
        (4, 10, "view"),
    ]
    rep = {r["step"]: (r["step_name"], r["n_users"], r["conv_bp"])
           for r in funnel_report(_events(spark, rows), F.col("tu"),
                                  "u", "t", STEPS,
                                  within_us=100).collect()}
    assert rep == {1: ("view", 4, 10000),
                   2: ("click", 2, 5000),
                   3: ("buy", 1, 2500)}


def test_report_zero_rows_step(spark):
    rows = [(1, 10, "view")]
    rep = {r["step"]: r["n_users"]
           for r in funnel_report(_events(spark, rows), F.col("tu"),
                                  "u", "t", STEPS,
                                  within_us=100).collect()}
    assert rep == {1: 1, 2: 0, 3: 0}


def test_guards(spark):
    df = _events(spark, [(1, 10, "view")])
    with pytest.raises(ValueError, match="at least one"):
        funnel_reach(df, F.col("tu"), "u", "t", [], within_us=10)
    with pytest.raises(ValueError, match="within_us"):
        funnel_reach(df, F.col("tu"), "u", "t", STEPS, within_us=-1)
