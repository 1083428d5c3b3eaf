"""Exact-arithmetic column statistics: the pairwise Pearson
correlation matrix in ONE aggregation pass.

`df.stat.corr` computes one pair per job with float accumulation
whose result depends on partitioning; this operator computes EVERY
pair in a single scan + single partial→final aggregation, and is
bit-deterministic: values quantize ONCE to integer units (half-up
floor, the house pattern from operators/timeseries.py), all sums and
counts are exact integers (DECIMAL(38,0) — order-independent under
any partitioning), and the final Pearson ratio is a short IEEE chain
over those exact integers (cast, multiply, sqrt, divide — identical
bit patterns in any engine that computes the same exact sums, which
is what lets DuckDB replay it).  Correlations are reported in signed
basis points.

Pairs use PAIRWISE-COMPLETE observations (a row enters pair (a, b)'s
sums iff both columns are non-null — the statistics convention), so
every pair carries its own n.  A constant column (zero variance on
the pair's complete rows) yields NULL, not a division error.

Scale shape: one scan; the single aggregation moves C(p,2)×6 + p
integer cells per partition — metadata-sized for any row count.  The
per-rule one-pass fusion story of operators/checks.py, applied to
statistics.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["corr_matrix", "ols_fit"]


def corr_matrix(df: DataFrame, cols: list[str],
                quant: int = 100) -> DataFrame:
    """Pearson correlation for every unordered pair of ``cols``
    (numeric), as ``(col_a, col_b, n, corr_bp)`` with ``corr_bp`` the
    coefficient in signed basis points (NULL when a side is constant).
    ``quant``: units per 1.0 for the one-time integer quantization
    (100 = centi-units)."""
    if len(cols) < 2:
        raise ValueError("corr_matrix needs at least two columns")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in the frame: {missing}")

    def q(c):
        return F.floor(F.col(c).cast("double") * quant + 0.5) \
                .cast("decimal(38,0)")

    qd = df.select(*[q(c).alias(c) for c in cols])
    aggs = []
    pairs = list(combinations(cols, 2))
    for i, (a, b) in enumerate(pairs):
        both = F.col(a).isNotNull() & F.col(b).isNotNull()

        def s(expr, tag, i=i, both=both):
            return F.sum(F.when(both, expr)).cast("decimal(38,0)") \
                    .alias(f"_{tag}_{i}")

        aggs += [
            F.count(F.when(both, F.lit(1))).cast("decimal(38,0)")
             .alias(f"_n_{i}"),
            s(F.col(a), "sa"), s(F.col(b), "sb"),
            s(F.col(a) * F.col(a), "saa"),
            s(F.col(b) * F.col(b), "sbb"),
            s(F.col(a) * F.col(b), "sab"),
        ]
    one = qd.agg(*aggs)
    rows = []
    for i, (a, b) in enumerate(pairs):
        n = F.col(f"_n_{i}")
        sa, sb = F.col(f"_sa_{i}"), F.col(f"_sb_{i}")
        saa, sbb = F.col(f"_saa_{i}"), F.col(f"_sbb_{i}")
        sab = F.col(f"_sab_{i}")
        # exact-integer moments, then ONE short IEEE chain: any engine
        # with the same integer sums reproduces the same double bits
        num = (n * sab - sa * sb).cast("double")
        da = (n * saa - sa * sa).cast("double")
        db = (n * sbb - sb * sb).cast("double")
        r = num / (F.sqrt(da) * F.sqrt(db))
        corr_bp = F.when((da > 0) & (db > 0),
                         F.floor(r * 10000 + 0.5).cast("long"))
        rows.append(F.struct(
            F.lit(a).alias("col_a"), F.lit(b).alias("col_b"),
            n.cast("long").alias("n"), corr_bp.alias("corr_bp")))
    return (one.select(F.explode(F.array(*rows)).alias("p"))
               .select("p.col_a", "p.col_b", "p.n", "p.corr_bp"))


def ols_fit(df: DataFrame, group_col: str, x_col, y_col,
            micro: int = 1_000_000,
            flag_degenerate: bool = False) -> DataFrame:
    """Per-group simple linear regression (y = a + b*x) by EXACT
    integer normal equations — ``(group, n, slope_micro,
    intercept_micro)`` with both coefficients in truncated
    micro-units.

    ``x_col``/``y_col`` must already be INTEGER columns (quantize at
    the call site — cents, counts; the house one-time-quantization
    rule).  The contract is a deterministic integer spec shared with
    any engine:

        num = n*Sxy - Sx*Sy          den = n*Sxx - Sx*Sx
        slope_micro     = (num * micro)  idiv  den
        intercept_micro = (Sy * micro - slope_micro * Sx)  idiv  n

    (``idiv`` = truncation toward zero: Spark's DIV, DuckDB's ``//``.
    intercept reuses the TRUNCATED slope so both engines propagate the
    identical rounding.)  Groups with den = 0 (constant x, or n < 2)
    report NULL coefficients.

    Scale shape: ONE scan, one partial→final aggregation of five
    integer sums per group — the corr_matrix topology.  Sums ride
    DECIMAL(38,0): at 6B rows of cent-scale y and 2-digit x, n*Sxy
    stays under 1e28, thirty orders inside the type.

    NULL modes (ADVICE r10): coefficients are NULL either because the
    group is DEGENERATE (den = 0: constant x, or n < 2) or — for
    extreme-magnitude inputs only — because a DECIMAL(38,0) product
    (``num * micro``, ``slope * Sx``) exceeded precision 38 and
    overflowed to NULL under non-ANSI Spark.  The two are different
    facts (no fit exists vs. the fit exists but this integer spec
    cannot express it); pass ``flag_degenerate=True`` to append a
    boolean ``degenerate`` column (den = 0), so ``slope_micro IS NULL
    AND NOT degenerate`` identifies overflow.  The flag is opt-in to
    keep the default four-column schema stable.
    """
    x = x_col.cast("decimal(19,0)") if hasattr(x_col, "cast") \
        else F.col(x_col).cast("decimal(19,0)")
    y = y_col.cast("decimal(19,0)") if hasattr(y_col, "cast") \
        else F.col(y_col).cast("decimal(19,0)")
    d38 = "decimal(38,0)"
    src = df.select(F.col(group_col).alias("_g"),
                    x.alias("_x"), y.alias("_y")) \
            .filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    agg = src.groupBy("_g").agg(
        F.count("*").cast(d38).alias("_n"),
        F.sum("_x").cast(d38).alias("_sx"),
        F.sum("_y").cast(d38).alias("_sy"),
        F.sum((F.col("_x") * F.col("_x")).cast(d38)).cast(d38)
         .alias("_sxx"),
        F.sum((F.col("_x") * F.col("_y")).cast(d38)).cast(d38)
         .alias("_sxy"))
    num = (F.col("_n") * F.col("_sxy")
           - F.col("_sx") * F.col("_sy")).cast(d38)
    den = (F.col("_n") * F.col("_sxx")
           - F.col("_sx") * F.col("_sx")).cast(d38)
    w = agg.withColumn("_num", num).withColumn("_den", den)
    slope = F.when(F.col("_den") != 0,
                   F.expr("CAST((_num * CAST({m} AS {t})) DIV _den "
                          "AS LONG)".format(m=int(micro), t=d38)))
    w = w.withColumn("_slope", slope)
    intercept = F.when(
        F.col("_slope").isNotNull(),
        F.expr("CAST((_sy * CAST({m} AS {t}) "
               "- CAST(_slope AS {t}) * _sx) DIV _n AS LONG)"
               .format(m=int(micro), t=d38)))
    out = [F.col("_g").alias(group_col),
           F.col("_n").cast("long").alias("n"),
           F.col("_slope").alias("slope_micro"),
           intercept.alias("intercept_micro")]
    if flag_degenerate:
        out.append((F.col("_den") == 0).alias("degenerate"))
    return w.select(*out)
