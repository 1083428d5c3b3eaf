"""ANALYZE-style table profiling — per-column statistics in one scan.

The first question against any 100 TB table is "what's in it": row
count, null fractions, cardinalities, value ranges, width.  The
reference delegates this to ad-hoc Pig scripts over its loaders
(SURVEY.md §2.6); here it is one declarative aggregation any table can
run.

Shape: ONE pass over the data computing every column's statistics as
one wide aggregation row (each stat is an independent agg expression,
so Catalyst fuses them into a single partial-agg → final-agg pair —
map-side combine, one 1-row shuffle), then an executor-trivial unpivot
(stack) into the (one row per column) report.  No joins, no
per-column scans, no driver loop.

Cardinality modes:
- ``exact=False`` (default, the 100 TB path): HyperLogLog++
  ``approx_count_distinct`` — single-pass, constant memory per column.
- ``exact=True``: ``count(distinct col)``.  Spark plans multi-column
  exact distincts via Expand (one data replica per distinct column) —
  fine for validation runs, documented as the expensive mode; this is
  what the cross-engine oracle checks, since HLL estimates are
  implementation-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: numeric types rendered through a fixed-point decimal so min/max
#: strings are engine-portable (no float shortest-roundtrip formatting)
_DEC = "decimal(28,6)"


def _render(col: F.Column, dt: str) -> F.Column:
    """Portable string rendering for min/max: decimals for numerics
    (exact, no scientific notation), raw for strings; other types
    (timestamps, binary, nested) profile as NULL range — their
    renderings are engine-specific."""
    if dt in ("bigint", "int", "smallint", "tinyint", "double",
              "float") or dt.startswith("decimal"):
        return col.cast(_DEC).cast("string")
    if dt == "string":
        return col
    return F.lit(None).cast("string")


def profile_table(df: DataFrame, columns: list[str] | None = None, *,
                  exact: bool = False) -> DataFrame:
    """Per-column profile of ``df``: one output row per column with

    ``col_name, data_type, n_rows, n_nulls, n_distinct, min_val,
    max_val, total_len``

    where ``total_len`` is the summed length of the PORTABLE rendering
    (decimal for numerics, raw for strings — an exact integer; callers
    divide by ``n_rows - n_nulls`` for average width; emitting the
    quotient would bake in engine-specific float division).
    ``n_distinct`` ignores NULLs (both modes).  min/max aggregate in
    the column's own type (numeric order, not lexicographic) and only
    the final scalar is rendered."""
    cols = columns or df.columns
    types = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        col, dt = F.col(c), types[c]
        if dt.startswith("map"):  # Spark forbids distinct/hash on maps
            nd = F.lit(None).cast("bigint")
        elif exact:
            nd = F.count_distinct(col)
        else:
            nd = F.approx_count_distinct(col)
        aggs.append(F.struct(
            F.sum(col.isNull().cast("long")).alias("n_nulls"),
            nd.alias("n_distinct"),
            _render(F.min(col), dt).alias("min_val"),
            _render(F.max(col), dt).alias("max_val"),
            F.sum(F.length(_render(col, dt))).alias("total_len"),
        ).alias(f"_s_{c}"))
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', '{types[c]}', _s_{c}.n_nulls, _s_{c}.n_distinct, "
        f"_s_{c}.min_val, _s_{c}.max_val, _s_{c}.total_len"
        for c in cols)
    return wide.selectExpr(
        f"stack({len(cols)}, {stack}) AS (col_name, data_type, "
        "n_nulls, n_distinct, min_val, max_val, total_len)",
        "n_rows",
    ).select("col_name", "data_type", "n_rows", "n_nulls",
             "n_distinct", "min_val", "max_val",
             F.coalesce("total_len", F.lit(0)).alias("total_len"))
