"""Windowed funnel analysis (beyond-reference surface; the event-
analytics companion to operators/sessions.py).

The production ask — "how many users did A then B then C, with the
whole chain inside a time window" (ClickHouse ``windowFunnel``,
Amplitude/Mixpanel funnels) — is a per-user ordered-subsequence match.
Instead of a per-user UDF fold, this module expresses the funnel DP
as CASCADED RUNNING-MAX WINDOWS over one per-user ordered stream:

    m_1(row) = max chain-start ts among step-1 events STRICTLY before
               this row (rows frame, 1 preceding)
    step j matches at a row when its type is steps[j-1] and
               m_{j-1} >= ts - within (window check against the
               chain's FIRST event; ts is increasing, so the last
               hop's check implies every earlier hop's)
    m_j      = running max of starts of chains that reached step j

All k windows share ONE partitioning (user) and ONE sort
(ts, tie-breaks), so the corpus pays a single exchange and a single
sort regardless of funnel depth; everything is codegen window
aggregation — no collect_list, no Python.  The greedy "keep the max
start per depth" is optimal because a later start can only make the
window check easier (monotone), and the strictly-before frame means
one event can never advance two steps of the same chain.

Determinism: the row order is (ts, *tie_cols); pass a unique tie
column (e.g. event_id) if timestamps can collide — the oracle sorts
the same way, so reach counts reproduce exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def funnel_reach(df: DataFrame, ts_us: Column, user_col: str,
                 type_col: str, steps: list[str], *,
                 within_us: int,
                 tie_cols: list[str] = ()) -> DataFrame:
    """Per-user funnel depth: ``(user, reached)`` with ``reached`` in
    ``[1, len(steps)]`` — the deepest step some in-window ordered
    chain of this user's events completes.  Users with no step-1
    event are absent (reached 0 is "not in the funnel").

    ``within_us`` bounds ``ts_last - ts_first`` of the chain; chain
    events must be strictly later rows in the (ts, tie) order, so an
    event can satisfy at most one step of a given chain."""
    if len(steps) < 1:
        raise ValueError("funnel_reach needs at least one step")
    if within_us < 0:
        raise ValueError(f"within_us must be >= 0, got {within_us}")
    from pyspark.sql import Window

    order = [F.col("_tu")] + [F.col(c) for c in tie_cols]
    ev = (df.select(F.col(user_col).alias("_u"),
                    ts_us.cast("long").alias("_tu"),
                    F.col(type_col).alias("_t"),
                    *[F.col(c) for c in tie_cols])
            .where(F.col("_u").isNotNull() & F.col("_tu").isNotNull()
                   & F.col("_t").isNotNull()))
    before = (Window.partitionBy("_u").orderBy(*order)
                    .rowsBetween(Window.unboundedPreceding, -1))
    # _s1: this row starts a depth-1 chain; _r: deepest step this
    # row completes
    ev = ev.withColumn(
        "_s1", F.when(F.col("_t") == steps[0], F.col("_tu")))
    ev = ev.withColumn(
        "_r", F.when(F.col("_s1").isNotNull(), 1).otherwise(0))
    for j in range(2, len(steps) + 1):
        m_prev = F.max(f"_s{j - 1}").over(before)
        hit = ((F.col("_t") == steps[j - 1]) & m_prev.isNotNull()
               & (m_prev >= F.col("_tu") - within_us))
        ev = ev.withColumn(f"_s{j}", F.when(hit, m_prev))
        ev = ev.withColumn(
            "_r", F.when(F.col(f"_s{j}").isNotNull(), j)
                   .otherwise(F.col("_r")))
    return (ev.groupBy(F.col("_u").alias(user_col))
              .agg(F.max("_r").cast("int").alias("reached"))
              .where(F.col("reached") >= 1))


def funnel_report(df: DataFrame, ts_us: Column, user_col: str,
                  type_col: str, steps: list[str], *,
                  within_us: int,
                  tie_cols: list[str] = ()) -> DataFrame:
    """Funnel summary, one row per step: ``(step, step_name, n_users,
    conv_bp)`` — users whose deepest chain reaches at least this step,
    and the conversion from step 1 in integer basis points
    (``n_step * 10000 div n_1``; both engines truncate).  Steps no
    user reaches still report with ``n_users = 0``.

    The rollup explodes each user's reach into (1..reached) —
    equi-aggregation only, at most ``len(steps)`` rows per user — and
    is metadata-sized past :func:`funnel_reach`'s single exchange."""
    reach = funnel_reach(df, ts_us, user_col, type_col, steps,
                         within_us=within_us, tie_cols=tie_cols)
    spark = df.sparkSession
    sdf = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)],
        "step int, step_name string")
    counts = (reach.select(
                  F.explode(F.sequence(F.lit(1), F.col("reached")))
                   .alias("step"))
              .groupBy("step")
              .agg(F.count("*").cast("long").alias("n_users")))
    full = (sdf.join(counts, "step", "left")
               .select("step", "step_name",
                       F.coalesce("n_users", F.lit(0)).cast("long")
                        .alias("n_users")))
    # denominator via a window over the len(steps)-row summary — a
    # self-join here would re-run the whole reach pipeline twice
    from pyspark.sql import Window

    w = Window.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)
    n1 = F.max(F.when(F.col("step") == 1, F.col("n_users"))).over(w)
    return (full.withColumn("_n1", n1)
            .select("step", "step_name", "n_users",
                    F.expr("CASE WHEN _n1 IS NULL OR _n1 = 0 "
                           "THEN CAST(0 AS BIGINT) "
                           "ELSE n_users * 10000 div _n1 END")
                     .cast("long").alias("conv_bp")))
