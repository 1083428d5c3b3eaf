"""Type-2 slowly-changing-dimension maintenance (SCD2).

The warehouse pattern for keeping HISTORY of a mutable entity table:
each key holds one OPEN row (``valid_to_us`` NULL) plus zero or more
closed rows, each stamped with the half-open validity interval
``[valid_from_us, valid_to_us)``.  Applying a new full snapshot

* closes the open row and opens a new one when any tracked column
  changed (the old version stays queryable as of its interval);
* inserts an open row for a brand-new key;
* closes the open row of a key missing from the snapshot (entity
  deleted upstream) when ``close_missing=True``;
* leaves unchanged keys untouched — byte-identical rows, so repeated
  applies of the same snapshot are no-ops (idempotent).

Determinism contract: the batch timestamp is an EXPLICIT ``as_of_us``
argument (never ``current_timestamp()`` — the house rule from
operators/lww.py), so a replay stamps identical intervals.  Change
detection is null-safe equality over the tracked columns (a column
going NULL→value or value→NULL is a change; NULL→NULL is not).

Plan shape at scale: historical (closed) rows pass through UNTOUCHED
— only the open slice joins the snapshot (one full-outer join on the
key, null-safe comparison inside the join output), so one apply costs
O(open rows + |snapshot|) regardless of accumulated history depth.
With the dimension stored bucketed by key (operators/layout.py or a
txlog table) the join co-locates and the rewrite touches only
affected buckets.

"As of" queries are plain filters:
``valid_from_us <= t AND (valid_to_us IS NULL OR valid_to_us > t)``
— sargable, pushed to the parquet scan.

Beyond-reference extension (SURVEY.md §2 extensions): the reference
engine reads immutable SSTable snapshots; dimension history is the
batch-warehouse counterpart of its timestamped-cell LWW model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["scd2_init", "scd2_apply", "scd2_as_of",
           "scd2_temporal_join"]

_META = ("valid_from_us", "valid_to_us")


def scd2_init(snapshot: DataFrame, as_of_us: int) -> DataFrame:
    """Bootstrap a dimension from its first full snapshot: every row
    opens at ``as_of_us`` (µs epoch) and has no end."""
    return snapshot.select(
        "*",
        F.lit(as_of_us).cast("long").alias("valid_from_us"),
        F.lit(None).cast("long").alias("valid_to_us"))


def scd2_apply(dim: DataFrame, snapshot: DataFrame,
               key_cols: list[str], as_of_us: int,
               close_missing: bool = True,
               null_safe_keys: bool = True) -> DataFrame:
    """Fold a new full ``snapshot`` into SCD2 dimension ``dim`` at
    ``as_of_us``.  ``snapshot`` must carry exactly the dimension's
    business columns (everything except the validity metadata);
    tracked columns are all non-key business columns.

    ``null_safe_keys``: by default the key join uses ``<=>`` so a
    NULL key is one entity.  Catalyst plans null-safe keys as
    ``hashpartitioning(coalesce(k, 0), isnull(k))`` — a clustering NO
    bucketed layout can pre-satisfy — so with both ``dim`` and
    ``snapshot`` read from key-bucketed tables (layout.bucketed_table
    / txlog_read_bucketed, same bucket count) pass
    ``null_safe_keys=False``: keys join with plain equality, the
    open-rows x snapshot full-outer join CO-LOCATES (zero exchanges,
    plan-asserted in tests/test_scd.py), and the daily apply's
    network cost drops from two table-sized shuffles to none.  Only
    valid under the standard warehouse contract that dimension keys
    are non-null (a NULL-keyed row would never match and would both
    close and re-open every apply)."""
    biz = [c for c in dim.columns if c not in _META]
    missing = [c for c in key_cols if c not in biz]
    if missing:
        raise ValueError(f"key columns missing from dim: {missing}")
    snap_missing = [c for c in biz if c not in snapshot.columns]
    if snap_missing:
        raise ValueError(
            f"snapshot lacks dimension columns: {snap_missing}")
    extra = [c for c in snapshot.columns if c not in biz]
    if extra:
        raise ValueError(
            f"snapshot carries columns the dimension lacks: {extra} "
            "(SCD2 schema evolution is a separate migration)")
    tracked = [c for c in biz if c not in key_cols]
    if as_of_us is None:
        raise ValueError("as_of_us must be an explicit µs timestamp")

    closed = dim.filter(F.col("valid_to_us").isNotNull())
    open_rows = dim.filter(F.col("valid_to_us").isNull())
    # presence must not rely on key values being non-null: tag sides
    t = open_rows.withColumn("__t", F.lit(True)).alias("t")
    s = (snapshot.select(*biz).withColumn("__s", F.lit(True))
                 .alias("s"))
    j = t.join(s, [(F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}"))
                    if null_safe_keys
                    else F.col(f"t.{k}") == F.col(f"s.{k}"))
                   for k in key_cols], "full_outer")
    t_here = F.col("t.__t").isNotNull()
    s_here = F.col("s.__s").isNotNull()
    same = F.lit(True)
    for c in tracked:
        same = same & F.col(f"t.{c}").eqNullSafe(F.col(f"s.{c}"))
    changed = t_here & s_here & ~same
    ts = F.lit(as_of_us).cast("long")

    # ONE pass over the join: each joined row emits up to two output
    # rows (a close and/or an open) via an explode of optional
    # structs — three filtered union branches would re-execute the
    # full-outer join three times
    null_vt = F.lit(None).cast("long")

    def t_row(vt):
        return F.struct(*[F.col(f"t.{c}").alias(c) for c in biz],
                        F.col("t.valid_from_us")
                         .alias("valid_from_us"),
                        vt.alias("valid_to_us"))

    s_row = F.struct(*[F.col(f"s.{c}").alias(c) for c in biz],
                     ts.alias("valid_from_us"),
                     null_vt.alias("valid_to_us"))
    to_close = changed | ((t_here & ~s_here) if close_missing
                          else F.lit(False))
    keep_open = (t_here & s_here & same) | \
        ((t_here & ~s_here) if not close_missing else F.lit(False))
    close_el = F.when(to_close, t_row(ts))
    open_el = (F.when(keep_open, t_row(null_vt))
                .when(changed | (s_here & ~t_here), s_row))
    emitted = j.select(
        F.explode(F.filter(F.array(close_el, open_el),
                           lambda x: x.isNotNull())).alias("r")
    ).select("r.*")
    return closed.unionByName(emitted)


def scd2_temporal_join(facts: DataFrame, dim: DataFrame,
                       key_cols: list[str], fact_ts_us,
                       how: str = "left") -> DataFrame:
    """Enrich ``facts`` with the dimension version that was valid at
    each fact's own time (``fact_ts_us``: a µs-epoch Column or column
    name) — the point-in-time lookup every fact/dimension warehouse
    join needs (joining the CURRENT version back-dates history).

    Each fact matches at most ONE dimension row (a key's validity
    intervals are disjoint by :func:`scd2_apply`'s construction), so
    the join never fans out.  ``how``: ``left`` keeps facts whose key
    (or instant) has no dimension version, with NULL attributes;
    ``inner`` drops them.

    Plan shape: an EQUI hash join on the key columns with the
    interval predicate as a residual filter — Catalyst broadcasts the
    dimension when it is small, else both sides exchange once on the
    key; never a nested loop.  Dimension attribute columns that
    collide with fact column names are refused (pre-rename)."""
    if how not in ("left", "inner"):
        raise ValueError(f"how must be left|inner, got {how!r}")
    biz = [c for c in dim.columns if c not in _META]
    missing = [c for c in key_cols if c not in biz]
    if missing:
        raise ValueError(f"key columns missing from dim: {missing}")
    fmissing = [c for c in key_cols if c not in facts.columns]
    if fmissing:
        raise ValueError(f"key columns missing from facts: {fmissing}")
    attrs = [c for c in biz if c not in key_cols]
    clash = sorted(set(attrs) & set(facts.columns))
    if clash:
        raise ValueError(
            f"dimension attributes collide with fact columns: {clash}"
            " — rename before joining")
    ts = (F.col(fact_ts_us) if isinstance(fact_ts_us, str)
          else fact_ts_us)
    f = facts.withColumn("__ts_us", ts.cast("long")).alias("f")
    d = dim.alias("d")
    cond = [F.col(f"f.{k}").eqNullSafe(F.col(f"d.{k}"))
            for k in key_cols]
    cond.append(F.col("d.valid_from_us") <= F.col("__ts_us"))
    cond.append(F.col("d.valid_to_us").isNull()
                | (F.col("d.valid_to_us") > F.col("__ts_us")))
    j = f.join(d, cond, how)
    return j.select(*[F.col(f"f.{c}").alias(c) for c in facts.columns],
                    *[F.col(f"d.{c}").alias(c) for c in attrs])


def scd2_as_of(dim: DataFrame, t_us: int) -> DataFrame:
    """The dimension as it was at ``t_us`` (half-open intervals:
    a row closed AT ``t_us`` is already superseded)."""
    return dim.filter(
        (F.col("valid_from_us") <= F.lit(t_us))
        & (F.col("valid_to_us").isNull()
           | (F.col("valid_to_us") > F.lit(t_us)))
    ).drop("valid_from_us", "valid_to_us")
