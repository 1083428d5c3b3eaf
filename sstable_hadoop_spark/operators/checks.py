"""Declarative data-quality constraint suite — the "is this table
sane before I train on it" gate (the design of AWS Deequ / Great
Expectations, re-expressed as ONE Spark aggregation).

Every rule compiles to an aggregate EXPRESSION; all rules fuse into a
single ``df.agg(...)`` pass, so checking 50 constraints over 100 TB
costs one scan + one partial→final aggregation — never one job per
rule.  The single agg row then explodes declaratively into the
one-row-per-rule report (no driver collect anywhere).

Supported rules (``rules`` is a list of dicts):

* ``{"rule": "not_null", "column": c}`` — violations = NULL count.
* ``{"rule": "unique", "columns": [c, ...]}`` — violations =
  ``count(*) − count(DISTINCT struct(cols))`` (struct wraps NULLs, so
  null-keyed duplicates count too).
* ``{"rule": "range", "column": c, "min": lo, "max": hi}`` —
  violations = non-NULL values outside ``[lo, hi]`` (either bound
  optional; NULLs are not_null's job).
* ``{"rule": "regex", "column": c, "pattern": p}`` — violations =
  non-NULL values NOT fully matching ``p`` (Java/RE2 common subset
  recommended so oracles can replay it).
* ``{"rule": "accepted_values", "column": c, "values": [...]}`` —
  violations = non-NULL values outside the set.
* ``{"rule": "row_count", "min": lo, "max": hi}`` — metric = total
  rows; passes iff within bounds (either optional).
* ``{"rule": "sql", "predicate": expr, "name": label}`` — violations
  = rows where the boolean SQL expression is not TRUE (FALSE *or*
  NULL — a predicate that cannot evaluate is a violation, not a
  pass); the escape hatch for cross-column invariants
  (``"l_shipdate <= l_receiptdate"``).
* ``{"rule": "freshness", "column": ts, "now": t, "max_age": d}`` —
  metric = ``max(ts)``; passes iff ``max(ts) >= now − max_age``.
  ``now`` is EXPLICIT (same units as the column) so results are
  reproducible — never wall-clock.

Report schema: ``(rule, target, metric bigint, violations bigint,
passed boolean)`` where ``metric`` is the rule's denominator (rows
checked) and ``target`` names the column(s).

Reference scope: no counterpart (the reference trusts its SSTable
inputs); declared extension — the profiling sibling of
``profile.profile_table``, but pass/fail contractual instead of
descriptive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["check_constraints"]


def _compile(rule: dict, idx: int):
    """rule → (target label, metric expr, violations expr,
    passed-from-(metric, violations) fn)."""
    kind = rule.get("rule")
    if kind == "not_null":
        c = rule["column"]
        return (c,
                F.count(F.lit(1)),
                F.count_if(F.col(c).isNull()),
                None)
    if kind == "unique":
        cols = rule.get("columns") or [rule["column"]]
        return (",".join(cols),
                F.count(F.lit(1)),
                F.count(F.lit(1))
                - F.countDistinct(F.struct(*[F.col(c) for c in cols])),
                None)
    if kind == "range":
        c = rule["column"]
        lo, hi = rule.get("min"), rule.get("max")
        if lo is None and hi is None:
            raise ValueError(f"range rule #{idx} needs min and/or max")
        bad = F.lit(False)
        if lo is not None:
            bad = bad | (F.col(c) < F.lit(lo))
        if hi is not None:
            bad = bad | (F.col(c) > F.lit(hi))
        return (c,
                F.count(F.col(c)),
                F.count_if(F.col(c).isNotNull() & bad),
                None)
    if kind == "regex":
        c, p = rule["column"], rule["pattern"]
        return (c,
                F.count(F.col(c)),
                F.count_if(F.col(c).isNotNull()
                           & ~F.col(c).rlike(p)),
                None)
    if kind == "accepted_values":
        c = rule["column"]
        vals = list(rule["values"])
        if not vals:
            raise ValueError(f"accepted_values rule #{idx} is empty")
        return (c,
                F.count(F.col(c)),
                F.count_if(F.col(c).isNotNull()
                           & ~F.col(c).isin(vals)),
                None)
    if kind == "row_count":
        lo, hi = rule.get("min"), rule.get("max")
        if lo is None and hi is None:
            raise ValueError(f"row_count rule #{idx} needs min/max")

        def passed(metric, violations):
            ok = F.lit(True)
            if lo is not None:
                ok = ok & (metric >= F.lit(int(lo)))
            if hi is not None:
                ok = ok & (metric <= F.lit(int(hi)))
            return ok

        return ("*", F.count(F.lit(1)), F.lit(0), passed)
    if kind == "sql":
        pred = rule.get("predicate")
        if not pred:
            raise ValueError(f"sql rule #{idx} needs a predicate")
        return (rule.get("name", pred),
                F.count(F.lit(1)),
                F.count_if(~F.coalesce(F.expr(pred), F.lit(False))),
                None)
    if kind == "freshness":
        c = rule["column"]
        if "now" not in rule or "max_age" not in rule:
            raise ValueError(
                f"freshness rule #{idx} needs explicit now= and "
                "max_age= (wall-clock would be irreproducible)")
        floor_ts = rule["now"] - rule["max_age"]

        def fresh(metric, violations):
            return metric >= F.lit(floor_ts)

        return (c, F.max(F.col(c)), F.lit(0), fresh)
    raise ValueError(f"unknown rule kind {kind!r} (rule #{idx})")


def check_constraints(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate ``rules`` over ``df`` in ONE fused aggregation pass;
    returns the ``(rule, target, metric, violations, passed)`` report
    with one row per rule, in the given order (``target`` carries the
    column name(s), ``metric`` the rows the rule examined)."""
    if not rules:
        raise ValueError("check_constraints needs at least one rule")
    compiled = [(r.get("rule", "?"), *_compile(r, i))
                for i, r in enumerate(rules)]
    aggs = []
    for i, (_, _, metric, violations, _) in enumerate(compiled):
        aggs.append(metric.cast("long").alias(f"_m{i}"))
        aggs.append(violations.cast("long").alias(f"_v{i}"))
    one = df.agg(*aggs)
    entries = []
    for i, (kind, target, _, _, passed_fn) in enumerate(compiled):
        m, v = F.col(f"_m{i}"), F.col(f"_v{i}")
        passed = (v == 0) if passed_fn is None else passed_fn(m, v)
        entries.append(F.struct(
            F.lit(i).alias("rule_id"),
            F.lit(kind).alias("rule"),
            F.lit(target).alias("target"),
            m.alias("metric"),
            v.alias("violations"),
            passed.alias("passed")))
    return (one.select(F.explode(F.array(*entries)).alias("r"))
               .select("r.*"))
