"""Cohort retention analysis (beyond-reference surface; rounds out
the event-analytics family with operators/sessions.py and funnel.py).

The production ask: bucket users by their FIRST-activity period (the
cohort), then for each cohort and each later period count how many of
its users came back — the retention matrix every growth dashboard is
built on.

Scale shape: two user-keyed exchanges and nothing corpus-sized after
them.  (1) per-user first period — a groupBy(user) min with map-side
partials; (2) distinct (user, period) activity — a groupBy with
map-side partials that downsamples the corpus to at most
users x periods rows.  Both shuffles share the user key, so AQE/
co-partitioning lines them up for the join; the final
(cohort, offset) count-distinct runs on the downsampled table.
Periods are integer µs buckets (``ts - ts mod step``) and offsets are
integer bucket differences — no calendar, no floats — so SQL oracles
reproduce the matrix exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cohort_retention(df: DataFrame, ts_us: Column, user_col: str, *,
                     step_us: int,
                     max_offset: int | None = None) -> DataFrame:
    """Retention matrix ``(cohort_us, offset, n_users, retained_bp)``:
    users whose first activity falls in period ``cohort_us`` and who
    were active again ``offset`` periods later (offset 0 is the
    cohort size itself, so ``retained_bp`` — integer basis points of
    the cohort — is 10000 there by construction).  Periods with no
    returning users simply have no row (sparse matrix); cap the
    columns with ``max_offset`` when only the first N periods matter.

    NULL users/timestamps are excluded."""
    if step_us < 1:
        raise ValueError(f"step_us must be >= 1, got {step_us}")
    if max_offset is not None and max_offset < 0:
        raise ValueError(f"max_offset must be >= 0, got {max_offset}")
    tu = ts_us.cast("long")
    acts = (df.select(F.col(user_col).alias("_u"), tu.alias("_tu"))
              .where(F.col("_u").isNotNull() & F.col("_tu").isNotNull())
              .select("_u", (F.col("_tu") - F.col("_tu") % step_us)
                      .alias("_p"))
              .distinct())  # <= users x periods rows past this point
    first = acts.groupBy("_u").agg(F.min("_p").alias("_cohort"))
    joined = (acts.join(first, "_u")
              .select("_u", "_cohort",
                      F.expr(f"(_p - _cohort) div {step_us}")
                       .cast("long").alias("_k")))
    if max_offset is not None:
        joined = joined.where(F.col("_k") <= max_offset)
    counts = (joined.groupBy("_cohort", "_k")
              .agg(F.countDistinct("_u").cast("long")
                    .alias("n_users")))
    # cohort size via a window over the matrix (cohorts x offsets
    # rows) — a self-join on the k=0 slice would re-run the whole
    # distinct/join pipeline twice.  Offset 0 always exists (the
    # cohort's own first-activity period), so the max is never NULL.
    from pyspark.sql import Window

    w = (Window.partitionBy("_cohort")
               .rowsBetween(Window.unboundedPreceding,
                            Window.unboundedFollowing))
    sz = F.max(F.when(F.col("_k") == 0, F.col("n_users"))).over(w)
    return (counts.withColumn("_sz", sz)
            .select(F.col("_cohort").alias("cohort_us"),
                    F.col("_k").cast("int").alias("offset"),
                    "n_users",
                    F.expr("n_users * 10000 div _sz").cast("long")
                     .alias("retained_bp")))
