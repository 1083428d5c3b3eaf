"""Gap-based event sessionization (extension E4+, SURVEY.md §2.9):
assign every event to a per-user session that closes after an
inactivity gap, then roll sessions up — the standard clickstream /
telemetry primitive (and the batch twin of Structured Streaming's
``session_window``, streaming/windows.py).

Spark-first shape: ONE exchange on the user key.  The lag-compare,
the running session counter, and the per-session rollup all ride the
same hash partitioning — ``lag``/``sum`` window over
``partitionBy(user)`` and the downstream ``groupBy(user, session)``
both have their clustering satisfied by the first shuffle, so
Catalyst inserts no second Exchange (asserted by
tests/test_plan_hygiene.py).  At 100 TB parallelism is per-user and a
hot user bounds a single task at their own event count — the same
bound any per-entity-ordered computation has.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(df: DataFrame, ts_us: Column,
               user_col: str = "user_id",
               gap_us: int = 30 * 60 * 1_000_000) -> DataFrame:
    """Per-event session assignment: a new session starts at the first
    event of a user and whenever the gap since the previous event
    exceeds ``gap_us``.  ``session_seq`` numbers a user's sessions
    from 1 in time order (deterministic tie-break on the raw order of
    equal timestamps is irrelevant to the boundary flag — equal
    timestamps can never open a session).  Adds (ts_us, session_seq);
    keeps all input columns."""
    w = Window.partitionBy(user_col).orderBy("_ts_us")
    run = (Window.partitionBy(user_col).orderBy("_ts_us")
                 .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    gap = F.col("_ts_us") - F.lag("_ts_us").over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_us), 1).otherwise(0)
    return (df.withColumn("_ts_us", ts_us)
              .withColumn("session_seq",
                          F.sum(new_sess).over(run).cast("int"))
              .withColumnRenamed("_ts_us", "ts_us"))


def session_rollup(df: DataFrame, ts_us: Column,
                   user_col: str = "user_id",
                   gap_us: int = 30 * 60 * 1_000_000,
                   value_col: str = "value") -> DataFrame:
    """Sessionize then aggregate: one row per (user, session) with
    event count, span, and value sum — the exchange-count-1 composed
    plan (the groupBy reuses the window's partitioning)."""
    s = sessionize(df, ts_us, user_col=user_col, gap_us=gap_us)
    return (s.groupBy(F.col(user_col), F.col("session_seq"))
             .agg(F.count("*").alias("n_events"),
                  F.min("ts_us").alias("start_us"),
                  F.max("ts_us").alias("end_us"),
                  (F.max("ts_us") - F.min("ts_us")).alias("span_us"),
                  F.round(F.sum(value_col), 4).alias("sum_value")))
