"""Time-series AS-OF join: each left row matched to the single most
recent right row at-or-before its timestamp (pandas ``merge_asof`` /
QuestDB-kdb ``aj`` semantics), per key.

The naive Spark plan is a range join (``r.ts <= l.ts``) + per-left
argmax — a BroadcastNestedLoopJoin followed by a huge dedup.  The
scalable formulation is the classic UNION + LAST-IGNORE-NULLS window:

1. tag both sides and union them on (key, ts) — right rows carry
   their payload in one struct column, left rows carry NULL;
2. ONE exchange partitions by key; within each partition the rows
   sort by (ts, side) — right sorts BEFORE left at equal ts, making
   the match inclusive (``r.ts <= l.ts``), the merge_asof default;
3. ``last(payload, ignorenulls=True)`` over an unbounded-preceding
   frame carries the latest right payload forward;
4. keep the left rows; optionally null the match beyond ``tolerance``.

Cost: one hash exchange of |left| + |right| rows and one in-partition
sort — the same topology as the engine's LWW merge, with zero joins.
At 100 TB this is the difference between a plan that runs and one
that cross-products.

The engine's earlier ``join_asof_latest_order`` row covers the
LWW-shaped as-of (max_by under a filter); this operator is the
general per-left-row version the reference's Pig users would have
hand-written as a COGROUP + reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(left: DataFrame, right: DataFrame, on: list[str] | str,
              left_ts: str, right_ts: str | None = None,
              tolerance: int | None = None,
              suffix: str = "_asof") -> DataFrame:
    """For every ``left`` row, attach the latest ``right`` row with
    ``right.ts <= left.ts`` sharing the ``on`` key(s); right payload
    columns are appended with ``suffix`` (NULL when no prior right row
    exists — a LEFT as-of).  ``tolerance``: maximum allowed
    ``left.ts - right.ts`` (same units as the ts columns); matches
    older than that become NULL, exactly merge_asof's knob.

    Both ts columns must be numeric (epoch micros in this engine's
    conventions); ``right_ts`` defaults to ``left_ts``.  Ties:
    ``right.ts == left.ts`` DOES match (inclusive); among right rows
    with identical (key, ts) the winner is fixed by an xxhash64
    payload tie-break — deterministic across runs and partitionings,
    but arbitrary: pass pre-deduped rights when the choice matters.

    NULL semantics (window-partitioning rules, stated rather than
    hidden): NULL keys group together — a NULL-keyed left row matches
    NULL-keyed rights (pandas merge_asof instead rejects NaN keys;
    filter NULL keys out first for that behavior).  A NULL left ts
    sorts before every right row and therefore never matches."""
    from pyspark.sql.window import Window

    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    payload_cols = [c for c in right.columns
                    if c not in keys and c != right_ts]
    overlap = (set(left.columns)
               & {c + suffix for c in payload_cols + [right_ts]})
    if overlap:
        raise ValueError(
            f"suffixed right columns collide with left: "
            f"{sorted(overlap)}; change suffix=")
    payload = F.struct(
        F.col(right_ts).cast("long").alias("_ts"),
        *[F.col(c) for c in payload_cols])
    r = right.select(
        *keys,
        F.col(right_ts).cast("long").alias("_t"),
        F.lit(0).alias("_side"),          # rights first at equal ts
        payload.alias("_p"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
          for c in left.columns if c not in keys])
    lt = left.select(
        *keys,
        F.col(left_ts).cast("long").alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        *[F.col(c) for c in left.columns if c not in keys])
    w = (Window.partitionBy(*keys)
               .orderBy("_t", "_side", F.xxhash64("_p"))
               .rowsBetween(Window.unboundedPreceding, 0))
    carried = r.unionByName(lt).withColumn(
        "_m", F.last("_p", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1)
    match = F.col("_m")
    if tolerance is not None:
        match = F.when(
            F.col("_t") - F.col("_m._ts") <= int(tolerance),
            F.col("_m"))
    return out.select(
        *keys,
        *[F.col(c) for c in left.columns if c not in keys],
        match["_ts"].alias(right_ts + suffix),
        *[match[c].alias(c + suffix) for c in payload_cols])
