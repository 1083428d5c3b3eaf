"""Interval (point-in-range) joins without a nested loop.

Spark plans a plain ``p.ts BETWEEN i.lo AND i.hi`` predicate as
``BroadcastNestedLoopJoin`` — every point row tested against every
interval, O(|points| × |intervals|) work that only survives because
one side is usually broadcast-small.  At 100 TB of points against
thousands-to-millions of intervals (maintenance windows, sessions,
experiment cohorts, outage ranges) that plan is the scale-killer the
plan-hygiene suite exists to catch.

This module implements the standard bucketized overlap join (the
technique behind Databricks' range-join optimization and the
GenomicsDB/Hail interval joins, built from public primitives):

1. pick a fixed ``bucket_width`` (in the point column's own units);
2. each interval EXPLODES to the bucket ids it overlaps
   (``floor(lo/w) .. floor(hi/w)`` — a codegen ``sequence``);
3. each point maps to its ONE bucket id (``floor(ts/w)``);
4. equi-join on (bucket id [+ user keys]) — a plain shuffled hash /
   sort-merge join Catalyst can plan, partition, and AQE-skew-split;
5. re-apply the EXACT range predicate to kill in-bucket misses.

A point has exactly one bucket and an interval emits each overlapped
bucket once, so a matching (point, interval) pair meets exactly once
— no dedup stage.  Cost: the interval side grows by its mean
bucket-span (choose ``bucket_width`` near the median interval length
for a ~2× expansion); the join itself is hash-partitioned, never a
cross product.  The result is row-identical to the BETWEEN join by
construction — which is exactly what the driver oracle asserts.

Reference scope: the reference engine has no join surface at all
(SURVEY.md §2.3 — joins were Pig's job); this is a declared
beyond-reference extension in the engine's join family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(points: DataFrame, intervals: DataFrame,
                  point_col: str, lo_col: str, hi_col: str,
                  bucket_width: int,
                  on: list[str] | None = None,
                  how: str = "inner",
                  max_buckets_per_interval: int = 100_000) -> DataFrame:
    """Join each row of ``points`` to the rows of ``intervals`` whose
    ``[lo_col, hi_col]`` range (inclusive both ends) contains its
    ``point_col`` — as an equi-join on overlap buckets, never a
    nested loop.

    ``on``: optional extra equi-join keys present on BOTH sides
    (e.g. a user/device id) — they ride the same shuffle.
    ``how``: ``inner`` (matches only) or ``left`` (keep pointless
    points with NULL interval columns).
    ``max_buckets_per_interval``: loud executor-side bound on a single
    interval's bucket span (an open-ended or mis-scaled interval would
    otherwise explode to millions of rows silently).

    Column handling: output carries every ``points`` column plus every
    ``intervals`` column; shared names must be disjoint apart from
    ``on`` (raises otherwise — silent ambiguity is the bug class).
    NULL semantics: a NULL point value (or NULL interval bound) never
    matches — such points drop under ``inner`` and survive with NULL
    interval columns under ``left``, exactly like the BETWEEN
    predicate they replace.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join supports inner/left, got {how!r}")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    on = list(on or [])
    clash = (set(points.columns) & set(intervals.columns)) - set(on)
    if clash:
        raise ValueError(
            f"ambiguous columns on both sides: {sorted(clash)}; rename "
            "or add them to on=")
    w = int(bucket_width)
    n_buckets = (F.floor(F.col(hi_col) / w)
                 - F.floor(F.col(lo_col) / w) + 1)
    guard = F.when(
        n_buckets > F.lit(int(max_buckets_per_interval)),
        F.raise_error(F.concat(
            F.lit("interval_join: an interval spans "),
            n_buckets.cast("string"),
            F.lit(f" buckets at bucket_width={w} > "
                  f"max_buckets_per_interval="
                  f"{int(max_buckets_per_interval)}; widen the bucket "
                  "or split the interval"))).cast("long"))
    iv = intervals.withColumn(
        "_b", F.explode(F.sequence(
            F.coalesce(guard, F.floor(F.col(lo_col) / w)),
            F.floor(F.col(hi_col) / w))))
    pt = points.withColumn("_b", F.floor(F.col(point_col) / w))
    cond = [pt["_b"] == iv["_b"]]
    for k in on:
        cond.append(pt[k] == iv[k])
    in_range = ((pt[point_col] >= iv[lo_col])
                & (pt[point_col] <= iv[hi_col]))
    def _inner():
        out = pt.join(iv, [*cond, in_range], "inner") \
                .drop(iv["_b"]).drop(pt["_b"])
        for k in on:          # drop() takes one Column at a time
            out = out.drop(iv[k])
        return out

    if how == "inner":
        return _inner()
    # left: inner-match first, then add never-matched points with NULL
    # interval columns (cheaper than a true left join on the exploded
    # side, and AQE handles both branches independently)
    matched = _inner()
    iv_cols = [c for c in intervals.columns if c not in on]
    misses = (pt.join(iv, [*cond, in_range], "left_anti")
                .drop("_b"))
    for c in iv_cols:
        dt = dict(intervals.dtypes)[c]
        misses = misses.withColumn(c, F.lit(None).cast(dt))
    return matched.unionByName(misses)
