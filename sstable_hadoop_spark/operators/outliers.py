"""Rolling outlier detection (beyond-reference surface; completes the
event-analytics family with sessions.py, funnel.py, cohort.py).

The production ask — "flag readings k sigma away from this key's
recent history" — is a rolling z-score test.  Doing it with float
stddev would tie the result to summation order; instead the test is
evaluated on INTEGERS by comparing squares (no sqrt, no division):

    |x - mean| > k * sigma_sample
      <=>  (n-1) * (n*x - S)^2 * 1e6  >  k_milli^2 * n * (n*SS - S^2)

with x quantized once to centi-units (half-up, the house pattern from
timeseries.py), S/SS plain integer window sums, and the final
comparison in DECIMAL(38,0) so nothing wraps.  Identical truncation-
free arithmetic in Spark and DuckDB — SQL oracles reproduce every
flag bit-for-bit.

The history window is the PREVIOUS ``lookback`` observations
(rows frame ending at -1): a reading is judged against history that
excludes itself, so a genuine spike cannot dilute its own baseline.
ONE corpus exchange (key-partitioned window); everything is codegen
window aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rolling_outliers(df: DataFrame, ts_us: Column, key_col: str,
                     value_col: str, *, lookback: int = 24,
                     k_milli: int = 3000, min_obs: int = 8,
                     tie_cols: list[str] = (),
                     keep: tuple[str, ...] = ()) -> DataFrame:
    """Per-row outlier flags: ``(key, ts_us, value_c, n_prev,
    is_outlier)`` (+ ``keep`` columns passed through) where
    ``value_c`` is the reading in centi-units, ``n_prev`` counts the
    previous-``lookback`` history rows, and ``is_outlier`` = 1 when
    ``n_prev >= min_obs`` and the reading fails the k-sigma test
    against that history (sample variance, Bessel's n-1).

    Rows with NULL key/ts/value are excluded.  ``k_milli`` is k in
    milli-units (3000 = the classic 3 sigma)."""
    if lookback < 2:
        raise ValueError(f"lookback must be >= 2, got {lookback}")
    if min_obs < 2:
        raise ValueError(f"min_obs must be >= 2, got {min_obs}")
    if min_obs > lookback:
        raise ValueError("min_obs cannot exceed lookback")
    if k_milli < 1:
        raise ValueError(f"k_milli must be >= 1, got {k_milli}")
    from pyspark.sql import Window

    order = [F.col("_tu")] + [F.col(c) for c in tie_cols]
    ev = (df.select(F.col(key_col).alias("_k"),
                    ts_us.cast("long").alias("_tu"),
                    F.floor(F.col(value_col) * 100 + F.lit(0.5))
                     .cast("long").alias("_c"),
                    *[F.col(c) for c in tie_cols],
                    *[F.col(c) for c in keep])
            .where(F.col("_k").isNotNull() & F.col("_tu").isNotNull()
                   & F.col("_c").isNotNull()))
    hist = (Window.partitionBy("_k").orderBy(*order)
                  .rowsBetween(-lookback, -1))
    ev = (ev.withColumn("_n", F.count("_c").over(hist))
            .withColumn("_s", F.sum("_c").over(hist))
            .withColumn("_ss", F.sum(F.col("_c")
                                     .cast("decimal(38,0)")
                                     * F.col("_c")).over(hist)))
    k2 = int(k_milli) * int(k_milli)
    # every product in DECIMAL(38,0) — n*c, s*s, n*ss can wrap a LONG
    # for large metric magnitudes; worst case here is ~1e30 << 1e38
    test = F.expr(
        "CAST((_n - 1) AS DECIMAL(38,0)) "
        "* (CAST(_n AS DECIMAL(38,0)) * _c - _s) "
        "* (CAST(_n AS DECIMAL(38,0)) * _c - _s) * 1000000 "
        f"> CAST({k2} AS DECIMAL(38,0)) * _n "
        "* (CAST(_n AS DECIMAL(38,0)) * _ss "
        "   - CAST(_s AS DECIMAL(38,0)) * _s)")
    return ev.select(
        F.col("_k").alias(key_col),
        F.col("_tu").alias("ts_us"),
        F.col("_c").alias("value_c"),
        *keep,
        F.col("_n").cast("int").alias("n_prev"),
        F.when((F.col("_n") >= min_obs) & test, 1).otherwise(0)
         .cast("int").alias("is_outlier"))
