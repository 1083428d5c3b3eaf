"""Time-series resampling: bucket aggregation + dense gap fill +
forward fill, the telemetry-downsampling operator (TimescaleDB's
``time_bucket_gapfill``/``locf``, InfluxDB's ``GROUP BY time() fill
(previous)``) as one declarative Spark plan.

The reference engine has no time-series surface (SURVEY.md §2
extensions); a 100 TB event store needs exactly this to turn raw
events into fixed-step series for dashboards and model features.

Exactness design: all value math is INTEGER — observations quantize
to centi-units once (half-up floor, engine-stable), per-bucket state
is (sum_cents, n), and the forward-filled average is integer-divided
milli-units — so results are bit-identical under any partitioning and
any engine (the same trick as text.ngram_lm_scores' micro-nats).

Topology: one (key, bucket) aggregation exchange with map-side
partials over the raw events (the only corpus-sized stage), then
everything else — per-key range, dense grid explode, grid⋈agg join,
forward-fill window — works on the bucket-grid, whose size is
O(keys × buckets): at 100 TB of events with daily buckets over a
year, the grid is ~365 rows per key regardless of event volume.

Grid-size safety (VERDICT r9 #2): the dense grid is materialized in
CHUNKS of ``_GRID_CHUNK`` buckets — a coarse chunk explode, then a
fine explode within each chunk — so no single row ever holds a
key-span-sized sequence array (one key with two observations a year
apart at a 1-second step is 31.5M buckets ≈ 250 MB as ONE array
under a naive ``sequence(lo, hi, step)``; chunked, the largest array
is ``max(_GRID_CHUNK, ceil(span/_GRID_CHUNK))`` elements).  On top
of that, ``max_buckets_per_key`` bounds the grid a key may REQUEST:
a key whose span/step exceeds it fails loudly executor-side (the
input-shape hazard — a mis-specified step against sparse keys —
surfaces as an error naming the key, never as an executor OOM).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Buckets materialized per sequence array in the dense-grid explode.
_GRID_CHUNK = 4096


def resample_gapfill(df: DataFrame, ts_us_col, key_col: str,
                     value_col: str, step_us: int,
                     fill: str = "locf",
                     max_buckets_per_key: int | None = 10_000_000
                     ) -> DataFrame:
    """Fixed-step series per key: ``(key, bucket_us, n_obs,
    avg_milli, filled)``.

    * ``bucket_us`` — ``ts − ts mod step`` (exact long arithmetic),
      densified per key from its first to its last observed bucket.
    * ``n_obs`` — observations in the bucket (0 for gap rows).
    * ``avg_milli`` — bucket average in integer milli-units; gap rows
      are filled per ``fill``:
        - ``"locf"``: carry the LAST observed bucket's average
          forward;
        - ``"linear"``: integer lerp between the surrounding observed
          buckets, ``prev + (next−prev)·(b−b_prev) DIV (b_next −
          b_prev)`` (truncating DIV, identical in Spark and DuckDB);
          trailing gaps (no next) fall back to locf.
    * ``filled`` — true on gap rows.

    ``ts_us_col`` may be a column name or an expression (pass
    ``queries.ts_us(df, "ts")`` for the heterogeneous testdata).

    ``max_buckets_per_key`` — loud per-key grid bound (None disables):
    a key spanning more than this many buckets raises executor-side
    with the key and its bucket count in the message."""
    if fill not in ("locf", "linear"):
        raise ValueError(f"unknown fill mode {fill!r}")
    ts = F.col(ts_us_col) if isinstance(ts_us_col, str) else ts_us_col
    key, step = F.col(key_col), F.lit(int(step_us))
    step_i = int(step_us)
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    bucket = (ts - F.pmod(ts, step)).cast("long")

    agg = (df.select(key.alias("_k"), bucket.alias("_b"),
                     cents.alias("_c"))
             .groupBy("_k", "_b")
             .agg(F.count("*").alias("_n"), F.sum("_c").alias("_sc")))
    rng = agg.groupBy("_k").agg(F.min("_b").alias("_lo"),
                                F.max("_b").alias("_hi"))
    if max_buckets_per_key is not None:
        # _lo and _hi are multiples of step, so DIV is exact; the
        # guard rides coalesce(raise-or-NULL, _lo) so Catalyst cannot
        # prune it away
        n_buckets = F.expr(f"(_hi - _lo) DIV {step_i} + 1")
        guard = F.when(
            n_buckets > F.lit(int(max_buckets_per_key)),
            F.raise_error(F.concat(
                F.lit("resample_gapfill: key "),
                F.col("_k").cast("string"),
                F.lit(" spans "), n_buckets.cast("string"),
                F.lit(" buckets at step_us="), F.lit(str(step_i)),
                F.lit(f" > max_buckets_per_key="
                      f"{int(max_buckets_per_key)}; coarsen the step "
                      "or raise/disable the bound"))).cast("long"))
        rng = rng.withColumn(
            "_lo", F.coalesce(guard, F.col("_lo")))
    # two-stage chunked explode: coarse chunk index, then buckets
    # within the chunk — bounds every materialized sequence array
    chunk_span = _GRID_CHUNK * step_i
    coarse = rng.select(
        "_k", "_lo", "_hi",
        F.explode(F.sequence(
            F.lit(0).cast("long"),
            F.expr(f"(_hi - _lo) DIV {chunk_span}"))).alias("_ci"))
    c_start = (F.col("_lo")
               + F.col("_ci") * F.lit(chunk_span)).cast("long")
    c_end = F.least(F.col("_hi"),
                    c_start + F.lit(chunk_span - step_i)).cast("long")
    grid = coarse.select(
        "_k", F.explode(F.sequence(c_start, c_end, step)).alias("_b"))
    j = (grid.join(agg, ["_k", "_b"], "left")
             .select("_k", "_b",
                     F.coalesce("_n", F.lit(0)).cast("int")
                      .alias("n_obs"),
                     # observed-bucket average in milli-units (NULL on
                     # gap rows) — the single state the fills carry
                     F.expr("_sc * 10 DIV _n").cast("long")
                      .alias("_oa")))
    from pyspark.sql.window import Window

    back = (Window.partitionBy("_k").orderBy("_b")
                  .rowsBetween(Window.unboundedPreceding, 0))
    pa = F.last("_oa", ignorenulls=True).over(back)
    if fill == "locf":
        filled_avg = pa
    else:
        fwd = (Window.partitionBy("_k").orderBy("_b")
                     .rowsBetween(0, Window.unboundedFollowing))
        obs_b = F.when(F.col("n_obs") > 0, F.col("_b"))
        pb = F.last(obs_b, ignorenulls=True).over(back)
        na = F.first("_oa", ignorenulls=True).over(fwd)
        nb = F.first(obs_b, ignorenulls=True).over(fwd)
        j = (j.withColumn("_pa", pa).withColumn("_pb", pb)
              .withColumn("_na", na).withColumn("_nb", nb))
        filled_avg = F.when(F.col("_na").isNull(), F.col("_pa")) \
            .otherwise(F.expr(
                "_pa + (_na - _pa) * (_b - _pb) DIV (_nb - _pb)"))
        return (j.select(F.col("_k").alias(key_col),
                         F.col("_b").alias("bucket_us"),
                         "n_obs",
                         F.when(F.col("n_obs") > 0, F.col("_oa"))
                          .otherwise(filled_avg).cast("long")
                          .alias("avg_milli"),
                         (F.col("n_obs") == 0).alias("filled")))
    return (j.withColumn("_fa", filled_avg)
             .select(F.col("_k").alias(key_col),
                     F.col("_b").alias("bucket_us"),
                     "n_obs",
                     F.col("_fa").cast("long").alias("avg_milli"),
                     (F.col("n_obs") == 0).alias("filled")))


# ---------------------------------------------------------------------------
# Exponentially-weighted moving average — exact stateful recursion
# ---------------------------------------------------------------------------

#: applyInPandas output schema for ewma_smooth (key column prepended
#: dynamically with the caller's name/type).
_EWMA_VALUE_FIELDS = [
    ("ts_us", "long"), ("rn", "long"),
    ("value_c", "long"), ("ewma_c", "long"),
]


def ewma_smooth(df: DataFrame, ts_us_col, key_col: str,
                value_col: str, *, shift: int = 3,
                tie_cols: tuple[str, ...] = ()) -> DataFrame:
    """Per-key EWMA with EXACT integer state: observations quantize to
    centi-units once (half-up, the house pattern), then

        s_1 = v_1
        s_t = (v_t + (2^shift - 1) * s_{t-1})  idiv  2^shift

    i.e. alpha = 1/2^shift, with ``idiv`` truncating toward zero — the
    semantics Spark's DIV and DuckDB's ``//`` share, so a recursive-CTE
    oracle replays the identical trajectory bit-for-bit.  Output:
    ``(key, ts_us, rn, value_c, ewma_c)`` ordered per key by
    ``(ts_us, *tie_cols)`` (pass a unique tiebreaker for deterministic
    ordering under timestamp collisions).

    Why ``applyInPandas``: the truncating division makes each step
    non-affine, so the recursion cannot be linearized into a window
    sum — this is the documented custom-stateful extension point
    (SURVEY.md §2.9), not a missed built-in.  Topology: ONE shuffle,
    keyed by a HASH BUCKET of the key (not the key itself) so each
    task receives MANY keys and the per-key time recursions advance
    in LOCKSTEP as int64 numpy vector ops — the t-th step updates
    every key with >= t observations in one contiguous-slice
    operation (groups sorted by length descending, so the active set
    is always a prefix), turning per-ROW Python arithmetic into
    per-TIME-STEP vector arithmetic.  The recursion itself is
    unchanged bit-for-bit; batches whose magnitudes could overflow
    the int64 intermediate (|v| > 2^62/div — the state never exceeds
    the running max |v|, so v's bound is the whole guard) fall back
    to the exact Python-int loop.  At 100 TB the bucket count
    (spark.sql.shuffle.partitions) sets task granularity exactly
    like any keyed aggregation.

    Rows with NULL key/ts/value are excluded (they have no place on a
    per-key timeline)."""
    if shift < 1 or shift > 20:
        raise ValueError(f"shift must be in [1, 20], got {shift}")
    import pandas as pd
    from pyspark.sql.types import _parse_datatype_string

    mul, div = (1 << shift) - 1, 1 << shift
    ts = F.col(ts_us_col) if isinstance(ts_us_col, str) else ts_us_col
    key_type = next(f.dataType.simpleString() for f in df.schema.fields
                    if f.name == key_col)
    out_schema = _parse_datatype_string(
        ", ".join([f"`{key_col}` {key_type}"]
                  + [f"{n} {t}" for n, t in _EWMA_VALUE_FIELDS]))
    order = ["_tu", *tie_cols]

    src = (df.filter(F.col(key_col).isNotNull() & ts.isNotNull()
                     & F.col(value_col).isNotNull())
             .select(F.col(key_col),
                     ts.cast("long").alias("_tu"),
                     F.floor(F.col(value_col) * 100 + F.lit(0.5))
                      .cast("long").alias("_c"),
                     *[F.col(c) for c in tie_cols]))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values([key_col, *order], kind="mergesort")
        keys = pdf[key_col].to_numpy()
        n = len(keys)
        starts = np.flatnonzero(
            np.r_[True, keys[1:] != keys[:-1]]) if n else \
            np.empty(0, dtype=np.int64)
        lens = np.diff(np.r_[starts, n])
        rn = np.arange(1, n + 1) - np.repeat(starts, lens)
        v64 = pdf["_c"].to_numpy(np.int64, copy=False)
        out = np.empty(n, dtype=np.int64)
        if n and int(np.abs(v64).max()) <= (1 << 62) // div:
            # groups sorted by length DESC: at time step t the
            # groups still active are exactly the first k(t) — every
            # update is a contiguous-prefix vector op
            by_len = np.argsort(-lens, kind="stable")
            starts_d = starts[by_len]
            neg_lens_d = -lens[by_len]
            s = v64[starts_d].copy()          # t = 1: s_1 = v_1
            out[starts_d] = s
            for t in range(2, int(lens.max()) + 1):
                k = np.searchsorted(neg_lens_d, -t, side="right")
                rows = starts_d[:k] + (t - 1)
                q = v64[rows] + mul * s[:k]
                r = q >> shift                # floor division
                # truncate toward zero: floor differs by +1 on
                # negative non-exact quotients
                r[(q < 0) & ((q & (div - 1)) != 0)] += 1
                s[:k] = r
                out[rows] = r
        else:
            # exact fallback: arbitrary-precision Python ints
            vals = pdf["_c"].to_list()
            for g, L in zip(starts.tolist(), lens.tolist()):
                s1 = int(vals[g])
                out[g] = s1
                for i in range(g + 1, g + L):
                    q = int(vals[i]) + mul * s1
                    s1 = q // div if q >= 0 else -((-q) // div)
                    out[i] = s1
        return pd.DataFrame({
            key_col: keys,
            "ts_us": pdf["_tu"].to_numpy(np.int64, copy=False),
            "rn": rn,
            "value_c": v64,
            "ewma_c": out,
        })

    n_buckets = int(df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "200"))
    return (src.withColumn("_b", F.pmod(F.hash(F.col(key_col)),
                                        F.lit(n_buckets)))
               .groupBy("_b")
               .applyInPandas(lambda pdf: fold(pdf.drop(columns="_b")),
                              schema=out_schema))
