"""Incremental view maintenance for JOIN-AGGREGATE views over logged
tables — the delta-join algebra (Blakeley et al., "Efficiently
Updating Materialized Views", SIGMOD 1986; the same maintenance rule
Materialize/DBSP implement) on top of the transaction log's change
feed.

The view shape is the ubiquitous enriched rollup

    V = SELECT d.g..., count(*), sum(f.x)...
        FROM fact f JOIN dim d ON f.k = d.k GROUP BY d.g...

and the maintenance identity, exact for MULTISET joins under signed
deltas (insert = +1, delete = −1; an update is its delete+insert
pair, which is exactly what ``txlog_diff`` emits):

    ΔV  =  ΔF ⋈ D_old   +   F_new ⋈ ΔD

(proof: F'⋈D' − F⋈D = (F+ΔF)⋈D + F'⋈ΔD − F⋈D).  count/sum are
self-inverting under signs, so folding the signed contribution rows
into the stored rollup reproduces the full recompute EXACTLY —
asserted in tests and by the driver oracle.

Scale shape (the reason to maintain instead of recompute):

* term 1 reads ONLY the fact commits' touched buckets
  (``txlog_diff`` cost) and joins them against the dim — the daily
  "facts arrived" refresh never rescans the fact table.
* term 2 reads the fact table only when the DIM changed, and when the
  fact table is bucketed by the join key the read PRUNES to the
  buckets the changed dim keys hash into (explicit-file-list scan, no
  other bucket is opened).  ΔD is collected key-wise for the pruning
  decision (metadata-sized: changed dim keys) and the join is
  broadcast-sized by construction.
* the fold is O(|stored rollup| + |ΔV groups|) — never a base rescan.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .txlog import txlog_diff, txlog_read, txlog_snapshot
from .layout import bucket_id

__all__ = ["join_rollup", "incremental_join_rollup",
           "incremental_distinct_registers"]


def _contrib(df: DataFrame, sign, group_by: list[str],
             sum_cols: dict[str, str]) -> DataFrame:
    aggs = [F.sum(sign).alias("_dn")]
    for out, src in sorted(sum_cols.items()):
        aggs.append(F.sum(sign * F.col(src)).alias(f"_d_{out}"))
    return df.groupBy(*group_by).agg(*aggs)


def join_rollup(spark, fact_path: str, dim_path: str, on: str,
                group_by: list[str], sum_cols: dict[str, str],
                fact_version: int | None = None,
                dim_version: int | None = None,
                how: str = "inner") -> DataFrame:
    """The view recomputed from scratch at the given versions —
    initialization and the equality twin of the incremental path.
    Output: ``(*group_by, n, <sum_cols keys>)``; with ``how="left"``
    the facts with no dim match roll up under NULL group columns."""
    f = txlog_read(spark, fact_path, fact_version)
    d = txlog_read(spark, dim_path, dim_version)
    j = f.join(d, on, how)
    aggs = [F.count("*").cast("long").alias("n")]
    for out, src in sorted(sum_cols.items()):
        aggs.append(F.sum(src).cast("long").alias(out))
    return j.groupBy(*group_by).agg(*aggs)


def _read_fact_buckets(spark, fact_path: str, version: int,
                       on: str, keys: DataFrame) -> DataFrame:
    """The fact table at ``version``, pruned to the buckets the
    ``keys`` rows hash into when the journaled layout allows it
    (bucket_by == [on]); otherwise the plain full read."""
    from pyspark.sql.types import StructType

    snap = txlog_snapshot(fact_path, version)
    if list(snap.get("bucket_by") or ()) != [on]:
        return txlog_read(spark, fact_path, version)
    n_buckets = int(snap["n_buckets"])
    hit = {r[0] for r in keys.select(
        bucket_id(n_buckets, on).alias("b")).distinct().collect()}
    names = sorted(n for n, b in snap["files"].items() if b in hit)
    schema = StructType.fromJson(json.loads(snap["schema"]))
    if not names:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(
        *[os.path.join(fact_path, n) for n in names])


def incremental_join_rollup(spark, fact_path: str, dim_path: str,
                            stored: DataFrame, on: str,
                            group_by: list[str],
                            sum_cols: dict[str, str],
                            fact_from: int, dim_from: int,
                            fact_to: int | None = None,
                            dim_to: int | None = None,
                            how: str = "inner") -> DataFrame:
    """Advance ``stored`` (the rollup as of ``(fact_from, dim_from)``)
    to ``(fact_to, dim_to)`` (default: each table's head) — equal to
    :func:`join_rollup` at the target versions, at change-feed cost.

    ``sum_cols`` maps output column → fact column (integer-typed;
    count/sum are the self-inverting aggregates the signed algebra
    supports — min/max are NOT maintainable this way and are
    refused by omission).  Groups whose count reaches zero drop out,
    so emptied groups never linger as zero rows.

    ``how="left"`` also maintains the NULL-group rollup of DANGLING
    facts (no dim match): its deltas are (a) fact deltas whose key is
    absent from the OLD dim and (b) facts of keys whose dim PRESENCE
    flipped (a key entering the dim moves its facts out of the NULL
    group with sign -1; a key leaving moves them in with +1) —
    presence flips derive from the dim feed's net per-key sign, which
    is exact when the dim holds AT MOST ONE ROW PER KEY per version
    (the dimension contract; a multiset dim would need count-crossing
    tracking this operator does not do)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    fact_to = fact_to if fact_to is not None \
        else txlog_snapshot(fact_path)["version"]
    dim_to = dim_to if dim_to is not None \
        else txlog_snapshot(dim_path)["version"]
    sign = F.when(F.col("_change") == "insert", F.lit(1)) \
            .otherwise(F.lit(-1)).cast("long")
    null_group = [F.lit(None).alias(c) for c in group_by]

    parts = []
    dd = (txlog_diff(spark, dim_path, dim_from, dim_to)
          if dim_to > dim_from else None)
    if fact_to > fact_from:
        df_fact = txlog_diff(spark, fact_path, fact_from, fact_to)
        d_old = txlog_read(spark, dim_path, dim_from)
        parts.append(_contrib(df_fact.join(d_old, on, "inner"),
                              sign, group_by, sum_cols))
        if how == "left":
            # fact deltas with NO key in the old dim: NULL group
            dangling = (df_fact
                        .join(d_old.select(on), on, "anti")
                        .select(*null_group, "_change",
                                *[F.col(c) for c in
                                  set(sum_cols.values())]))
            parts.append(_contrib(dangling, sign, group_by, sum_cols))
    if dd is not None:
        f_new = _read_fact_buckets(spark, fact_path, fact_to, on,
                                   dd.select(on))
        # the dim delta carries the group columns and the sign; fact
        # rows contribute their measures under the dim row's sign
        parts.append(_contrib(
            f_new.join(F.broadcast(dd), on, "inner"),
            sign, group_by, sum_cols))
        if how == "left":
            # presence flips: net per-key sign of the dim feed; facts
            # of an ENTERING key leave the NULL group (-1), of a
            # LEAVING key join it (+1)
            pres = (dd.select(on, sign.alias("_s"))
                      .groupBy(on).agg(F.sum("_s").alias("_net"))
                      .filter(F.col("_net") != 0)
                      .select(on, (-F.col("_net")).cast("long")
                              .alias("_bar")))
            flipped = (f_new.join(F.broadcast(pres), on, "inner")
                       .select(*null_group, F.col("_bar"),
                               *[F.col(c) for c in
                                 set(sum_cols.values())]))
            parts.append(_contrib(flipped, F.col("_bar"),
                                  group_by, sum_cols))
    if not parts:
        return stored
    delta = parts[0]
    for p in parts[1:]:
        delta = delta.unionByName(p, allowMissingColumns=True)
    dn_aggs = [F.sum("_dn").alias("_dn")]
    for out in sorted(sum_cols):
        dn_aggs.append(F.sum(f"_d_{out}").alias(f"_d_{out}"))
    delta = delta.groupBy(*group_by).agg(*dn_aggs)

    # null-safe fold: a left view's NULL group must merge, so the
    # full join matches keys with <=> (a USING join would leave two
    # separate NULL-group rows)
    st, dl = stored.alias("_st"), delta.alias("_dl")
    cond = None
    for c in group_by:
        eq = F.col(f"_st.{c}").eqNullSafe(F.col(f"_dl.{c}"))
        cond = eq if cond is None else cond & eq
    j = st.join(dl, cond, "full")
    n = (F.coalesce(F.col("_st.n"), F.lit(0))
         + F.coalesce(F.col("_dl._dn"), F.lit(0))).cast("long")
    sel = [*[F.coalesce(F.col(f"_st.{c}"), F.col(f"_dl.{c}"))
             .alias(c) for c in group_by], n.alias("n")]
    for out in sorted(sum_cols):
        sel.append((F.coalesce(F.col(f"_st.{out}"), F.lit(0))
                    + F.coalesce(F.col(f"_dl._d_{out}"), F.lit(0)))
                   .cast("long").alias(out))
    return j.select(*sel).filter(F.col("n") > 0)


def incremental_distinct_registers(spark, fact_path: str,
                                   stored_registers: DataFrame,
                                   col: str, group_by: list[str],
                                   fact_from: int,
                                   fact_to: int | None = None,
                                   p: int = 8) -> DataFrame:
    """Maintain per-group HLL register tables (the "distinct users per
    segment" dashboard state) from an APPEND-ONLY logged fact stream:
    the change feed's insert rows build their own registers and
    max-merge into the stored table — register-table EQUALITY with the
    full rebuild, because registers form a max-semilattice and an
    insert-only feed is set union.

    ANY delete row in the feed raises loudly: registers cannot
    subtract, and silently ignoring deletes would overcount forever —
    a deletion-bearing table needs the full
    ``sketch.hll_build_grouped`` rebuild (updates count: the txlog
    feed renders them as delete+insert pairs).

    Cost: O(feed) + a (group, bucket)-keyed merge bounded by
    |groups| x 2^p rows — the raw history is never rescanned."""
    from .sketch import hll_build_grouped

    fact_to = fact_to if fact_to is not None \
        else txlog_snapshot(fact_path)["version"]
    if fact_to <= fact_from:
        return stored_registers
    feed = txlog_diff(spark, fact_path, fact_from, fact_to)
    deletes = feed.filter(F.col("_change") == "delete")
    if deletes.limit(1).count():
        raise ValueError(
            f"change feed {fact_from}->{fact_to} of {fact_path} "
            "contains deletes (or updates, which feed as "
            "delete+insert): HLL registers cannot subtract — rebuild "
            "with sketch.hll_build_grouped instead of maintaining")
    inserts = feed.filter(F.col("_change") == "insert") \
                  .drop("_change")
    delta = hll_build_grouped(inserts, col, group_by, p=p)
    return (stored_registers.unionByName(delta)
            .groupBy(*group_by, "bucket")
            .agg(F.max("rho").cast("int").alias("rho")))
