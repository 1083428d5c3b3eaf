"""Mergeable sketches over corpus data (beyond-reference surface;
SURVEY.md §2.9 training-pipeline extensions).

The reference engine has no sketch machinery — its aggregation surface
is exact (SSTableDataRecordReader feeds Pig GROUP BYs).  At 100 TB,
"what are the frequent tokens / domains" and "how many distinct X"
cannot afford a full-cardinality exact answer per ad-hoc probe, so
this module adds the two standard bounded-memory answers:

  * a count-min sketch (Cormode & Muthukrishnan 2005) — ``depth x
    width`` counters NO MATTER the corpus size, built in ONE corpus
    exchange whose map-side partial aggregation caps every task's
    shuffle state at ``depth x width`` cells;
  * a portable HyperLogLog (Flajolet et al. 2007) whose ``2^p``
    registers are a first-class TABLE — persistable, shippable across
    sessions/engines, cell-wise mergeable — unlike the opaque
    internal sketch behind ``approx_count_distinct``.

Determinism / oracle contract: positions/buckets come from the same
md5-BIGINT arithmetic the bloom decontaminator and Filter.db v2 use
(count-min: Kirsch-Mitzenmacher ``(h1 + i*h2) % width`` over two
60-bit md5 halves; HLL: low ``p`` bits bucket + ``bin()``-length
leading-zero rank), identical in Spark and DuckDB, so SQL oracles
rebuild both sketches cell-for-cell and certify the ESTIMATES —
including every collision — exactly.  Counter updates are integer
sums / maxes and the HLL estimator is evaluated in pure
integer/decimal arithmetic (alpha quantized once to micro-units):
partition-order independent end-to-end.

Properties (certified in tests and driver rows, not assumed):
  * count-min never underestimates: est(w) >= true(w) always;
  * shard sketches merge into the union's sketch (sum / max
    cell-wise) — the 1000-executor / multi-day-ingest shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import clean_tokens as _clean_tokens


def cms_positions(word: Column, depth: int, width: int) -> Column:
    """``depth`` probe positions for one token: ``(h1 + i*h2) % width``
    with h1/h2 the two 60-bit md5 halves pre-reduced mod ``width``
    (so the multiply can't overflow a signed 64-bit long: width is
    capped well under 2^31 and depth under 2^8)."""
    hexd = F.md5(word)
    h1 = F.conv(F.substring(hexd, 1, 15), 16, 10).cast("long") % width
    h2 = F.conv(F.substring(hexd, 17, 15), 16, 10).cast("long") % width
    return F.transform(
        F.sequence(F.lit(0), F.lit(depth - 1)),
        lambda i: (h1 + i.cast("long") * h2) % width)


def _check_params(depth: int, width: int) -> None:
    if not (1 <= depth <= 64):
        raise ValueError(f"depth must be in [1, 64], got {depth}")
    if not (1 <= width <= (1 << 26)):
        raise ValueError(
            f"width must be in [1, 2^26], got {width} "
            "(the sketch is supposed to be metadata-sized)")


def cms_build(df: DataFrame, text_col: str = "text", *,
              token_col: str | None = None,
              depth: int = 4, width: int = 1 << 12) -> DataFrame:
    """Build the sketch table ``(row int, pos long, c long)`` —
    at most ``depth x width`` rows regardless of corpus size.

    ONE corpus-sized exchange keyed ``(row, pos)``; map-side partial
    aggregation collapses each task's contribution to <= depth x width
    cells before anything shuffles, so exchange volume is
    O(tasks x depth x width) — independent of corpus bytes.  Zero-count
    cells are omitted (they read back as 0 via the left join in
    :func:`cms_estimate`).

    Pass ``token_col`` to sketch an already-tokenized column (e.g. a
    domain or key column) instead of splitting ``text_col``.
    """
    _check_params(depth, width)
    from ._util import ensure_parallelism

    df = ensure_parallelism(df)
    if token_col is not None:
        toks = df.select(F.col(token_col).cast("string").alias("tok")) \
                 .where(F.col("tok").isNotNull())
    else:
        toks = df.select(
            F.explode(_clean_tokens(F.col(text_col))).alias("tok"))
    probes = toks.select(
        F.posexplode(cms_positions(F.col("tok"), depth, width))
         .alias("row", "pos"))
    return probes.groupBy("row", "pos").agg(F.count("*").alias("c"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of shard sketches == the union corpus's sketch
    (counters are plain sums).  Input sketches must share (depth,
    width); cost is O(n_shards x depth x width) — metadata-sized."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("row", "pos").agg(F.sum("c").alias("c"))


def cms_estimate(sketch: DataFrame, words: DataFrame,
                 word_col: str = "word", *,
                 depth: int = 4, width: int = 1 << 12) -> DataFrame:
    """Point estimates for a candidate-word table: est = min over the
    ``depth`` probed cells (absent cell = 0).  Returns
    ``(word, est_c)``.  The probe table is |candidates| x depth rows
    joined against the <= depth x width sketch — metadata-sized on
    both sides; Spark broadcasts whichever is smaller under AQE."""
    _check_params(depth, width)
    cand = words.select(F.col(word_col).cast("string").alias("word"))
    probes = cand.select(
        "word",
        F.posexplode(cms_positions(F.col("word"), depth, width))
         .alias("row", "pos"))
    return (probes
            .join(sketch, ["row", "pos"], "left")
            .groupBy("word")
            .agg(F.min(F.coalesce(F.col("c"), F.lit(0)))
                  .cast("long").alias("est_c")))


_TWO62 = 1 << 62


def hll_alpha_micro(m: int) -> int:
    """The HLL bias constant alpha_m quantized once to integer
    micro-units (Flajolet et al. 2007 §4 for m >= 128; the small-m
    constants below per the paper).  Both the Spark estimator and the
    SQL oracle consume this exact integer, so the estimate is pure
    integer arithmetic end-to-end."""
    if m == 16:
        a = 0.673
    elif m == 32:
        a = 0.697
    elif m == 64:
        a = 0.709
    else:
        a = 0.7213 / (1.0 + 1.079 / m)
    import math

    return math.floor(a * 1000000.0)


def _check_hll_p(p: int) -> None:
    if not (4 <= p <= 16):
        raise ValueError(f"p must be in [4, 16], got {p}")


def hll_build(df: DataFrame, col: str, *, p: int = 8) -> DataFrame:
    """Portable HyperLogLog register table ``(bucket int, rho int)``
    — at most ``2^p`` rows regardless of input size; zero-registers
    are omitted (the estimator reconstructs them from the count).

    Contrast with Spark's built-in ``approx_count_distinct``: the
    registers here are a first-class TABLE you can persist, ship
    across sessions/engines, and merge cell-wise (:func:`hll_merge`)
    — the sketch-per-shard / union-later shape a 100 TB ingest needs.

    Determinism: bucket = low ``p`` bits and rho = leading-zeros+1 of
    the remaining ``60-p`` bits of the 60-bit md5 half, all BIGINT +
    ``bin()``-length arithmetic identical in Spark and DuckDB.  One
    corpus exchange keyed by bucket; map-side partial max caps every
    task's shuffle contribution at ``2^p`` rows.
    """
    # No ensure_parallelism: the per-row work is ONE md5 (cheap) and
    # the bucket groupBy's map-side partial max already caps shuffle
    # volume at 2^p rows per task — a repartition ahead would add a
    # full-corpus exchange for no parallelism the agg needs
    _check_hll_p(p)
    m = 1 << p
    rmax = 61 - p  # rho when the remaining 60-p bits are all zero
    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15),
               16, 10).cast("long")
    probes = (df.where(F.col(col).isNotNull())
                .select(h.alias("_h"))
                .select((F.col("_h") % m).cast("int").alias("bucket"),
                        F.expr(f"_h div {m}").alias("_rem")))
    rho = F.when(F.col("_rem") == 0, F.lit(rmax)) \
           .otherwise(F.lit(rmax) - F.length(F.bin(F.col("_rem"))))
    return (probes.select("bucket", rho.alias("_rho"))
                  .groupBy("bucket")
                  .agg(F.max("_rho").cast("int").alias("rho")))


def hll_merge(*registers: DataFrame) -> DataFrame:
    """Cell-wise max of shard register tables == the union's register
    table; cost O(n_shards x 2^p) — metadata-sized."""
    if not registers:
        raise ValueError("hll_merge needs at least one register table")
    merged = registers[0]
    for r in registers[1:]:
        merged = merged.unionByName(r)
    return merged.groupBy("bucket").agg(
        F.max("rho").cast("int").alias("rho"))


def hll_estimate(registers: DataFrame, *, p: int = 8) -> DataFrame:
    """Raw HLL estimate from a register table, as ONE row
    ``(est_distinct long)`` of pure integer arithmetic:

        est = alpha_m * m^2 / sum_j 2^(-rho_j)

    evaluated as ``A div (S * 1e6)`` with ``A = alpha_micro * m^2 *
    2^62`` (a Python-int literal) and ``S = sum 2^(62-rho_j)`` summed
    in DECIMAL(38,0).  The 2^62 scale keeps every per-register term a
    plain ``shiftleft`` LONG — rho ranges 1..(61-p), so exponents stay
    in [p+1, 61] and the rho=1 term is 2^61, NOT the 2^63 long-wrap a
    2^64 scale would hit — while 2^rho still divides the scale
    exactly, so nothing is lost to truncation and a SQL oracle
    reproduces the estimate bit-for-bit.

    Raw-regime estimator only (n >~ 2.5m); an EMPTY register table
    (e.g. a shard that saw no rows) estimates 0, not alpha*m.  The
    register table itself is the durable artifact — callers needing
    small-range linear counting can apply it downstream from the same
    registers.
    """
    _check_hll_p(p)
    m = 1 << p
    a_num = hll_alpha_micro(m) * m * m * _TWO62
    return (registers
            .agg(F.sum(F.expr(
                    # term = 2^(62-rho): exponent <= 61 so each term
                    # fits LONG; the SUM still needs DECIMAL
                    "CAST(shiftleft(CAST(1 AS BIGINT), 62 - rho) "
                    "AS DECIMAL(38,0))"))
                  .alias("_sp"),
                 F.count("*").alias("_cnt"))
            .select(F.expr(
                f"CASE WHEN _cnt = 0 THEN CAST(0 AS BIGINT) ELSE "
                f"CAST(CAST('{a_num}' AS DECIMAL(38,0)) div "
                f"((coalesce(_sp, 0) + ({m} - _cnt) * "
                f"CAST('{_TWO62}' AS DECIMAL(38,0))) * 1000000) "
                f"AS BIGINT) END")
                .cast("long").alias("est_distinct")))


def hll_build_grouped(df: DataFrame, col: str,
                      group_cols: list[str], *,
                      p: int = 8) -> DataFrame:
    """Per-group register tables ``(group..., bucket, rho)`` — the
    production HLL shape ("distinct users per segment/day"): at most
    ``2^p`` rows PER GROUP, one exchange keyed (group, bucket) with
    map-side partial max.  Register tables for the same group from
    different shards/days merge with a plain
    ``groupBy(group, bucket).max(rho)`` — the rollup that turns daily
    sketches into weekly/monthly distincts without touching raw data.
    """
    _check_hll_p(p)
    if not group_cols:
        raise ValueError("hll_build_grouped needs group_cols; use "
                         "hll_build for the ungrouped sketch")
    m = 1 << p
    rmax = 61 - p
    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15),
               16, 10).cast("long")
    probes = (df.where(F.col(col).isNotNull())
                .select(*[F.col(g) for g in group_cols],
                        h.alias("_h"))
                .select(*group_cols,
                        (F.col("_h") % m).cast("int").alias("bucket"),
                        F.expr(f"_h div {m}").alias("_rem")))
    rho = F.when(F.col("_rem") == 0, F.lit(rmax))            .otherwise(F.lit(rmax) - F.length(F.bin(F.col("_rem"))))
    return (probes.select(*group_cols, "bucket", rho.alias("_rho"))
                  .groupBy(*group_cols, "bucket")
                  .agg(F.max("_rho").cast("int").alias("rho")))


def hll_estimate_grouped(registers: DataFrame,
                         group_cols: list[str], *,
                         p: int = 8) -> DataFrame:
    """Per-group estimates ``(group..., est_distinct)`` from grouped
    registers — the same exact integer/decimal arithmetic as
    :func:`hll_estimate`, one metadata-sized agg keyed by group."""
    _check_hll_p(p)
    if not group_cols:
        raise ValueError("hll_estimate_grouped needs group_cols")
    m = 1 << p
    a_num = hll_alpha_micro(m) * m * m * _TWO62
    return (registers
            .groupBy(*group_cols)
            .agg(F.sum(F.expr(
                    "CAST(shiftleft(CAST(1 AS BIGINT), 62 - rho) "
                    "AS DECIMAL(38,0))"))
                  .alias("_sp"),
                 F.count("*").alias("_cnt"))
            .select(*group_cols, F.expr(
                f"CASE WHEN _cnt = 0 THEN CAST(0 AS BIGINT) ELSE "
                f"CAST(CAST('{a_num}' AS DECIMAL(38,0)) div "
                f"((coalesce(_sp, 0) + ({m} - _cnt) * "
                f"CAST('{_TWO62}' AS DECIMAL(38,0))) * 1000000) "
                f"AS BIGINT) END")
                .cast("long").alias("est_distinct")))


def hll_report(df: DataFrame, col: str, *, p: int = 8) -> DataFrame:
    """Certification report, one row: exact distinct count vs the HLL
    estimate and the signed error in basis points
    (``(est - exact) * 10000 div exact`` — Spark ``div`` and DuckDB
    ``//`` both truncate toward zero, so the signed value is
    engine-portable).  The exact side is the certification harness;
    production callers persist :func:`hll_build` registers and never
    pay it."""
    exact = df.where(F.col(col).isNotNull()).agg(
        F.countDistinct(col).cast("long").alias("exact_distinct"))
    est = hll_estimate(hll_build(df, col, p=p), p=p)
    return (exact.crossJoin(est)
            .select("exact_distinct", "est_distinct",
                    F.expr("CASE WHEN exact_distinct = 0 "
                           "THEN CAST(0 AS BIGINT) ELSE "
                           "(est_distinct - exact_distinct) * 10000 "
                           "div exact_distinct END")
                     .cast("long").alias("err_bp")))


def _check_hdr_sub_bits(sub_bits: int) -> None:
    if not (1 <= sub_bits <= 14):
        raise ValueError(
            f"sub_bits must be in [1, 14], got {sub_bits} "
            "(the sketch is supposed to be metadata-sized)")


def hdr_index(v: Column, sub_bits: int) -> Column:
    """HDR-histogram bucket index for a non-negative BIGINT value:
    values below ``m = 2^sub_bits`` are their own singleton bucket
    (``idx = v``, exact); above, the value keeps its top ``sub_bits``
    mantissa bits — ``idx = (e - s) * m + (v >> (e - s))`` with
    ``e = bitlen(v) - 1`` — so every bucket's width is ``2^(e-s)``
    and the RELATIVE error is bounded by ``2^-sub_bits`` regardless
    of magnitude.  bitlen comes from ``length(bin(v))``, the same
    BIGINT trick the HLL rank uses: pure integer ops, identical in
    Spark and DuckDB, no ln() in sight."""
    m = 1 << sub_bits
    e = (F.length(F.bin(v)) - 1).cast("long")
    shift = (e - sub_bits).cast("int")
    top = F.call_function("shiftrightunsigned", v, shift)
    return F.when(v < m, v).otherwise((e - sub_bits) * m + top)


def hdr_bounds(idx: Column, sub_bits: int):
    """Inclusive (lo, hi) value bounds of bucket ``idx`` — the inverse
    of :func:`hdr_index`.  For ``idx < m`` the bucket is the singleton
    ``[idx, idx]``; otherwise ``k = idx div m`` recovers the shift
    ``k - 1`` and ``lo = (idx - (k-1)*m) << (k-1)``.  ``idx / m`` is
    exact in doubles (idx is metadata-small and m a power of two), so
    the long cast is true floor division."""
    m = 1 << sub_bits
    k = (idx / m).cast("long")
    shift = (k - 1).cast("int")
    width = F.call_function("shiftleft", F.lit(1).cast("long"), shift)
    lo = F.call_function("shiftleft",
                         (idx - (k - 1) * m).cast("long"), shift)
    singleton = idx < m
    lo_c = F.when(singleton, idx).otherwise(lo)
    hi_c = F.when(singleton, idx).otherwise(lo + width - 1)
    return lo_c, hi_c


def hdr_build(df: DataFrame, col: str, *,
              sub_bits: int = 7) -> DataFrame:
    """Mergeable quantile sketch (HDR-histogram style): the histogram
    table ``(idx long, c long)`` over non-negative BIGINT values —
    at most ``(63 - sub_bits + 2) * 2^sub_bits`` rows (~7.4k at the
    default sub_bits=7) NO MATTER the corpus size, with relative
    error <= ``2^-sub_bits`` per value (<= 2^-(sub_bits+1) at the
    reported bucket midpoint).

    Completes the mergeable-sketch trio: counts (count-min), distincts
    (HLL), and now quantiles — the "p99 latency / doc-length
    distribution at 100 TB" answer, where an exact percentile is a
    full sort-based aggregate but this is ONE exchange keyed by bucket
    whose map-side partial sum caps every task's shuffle contribution
    at the bucket count.

    Unlike DDSketch's ``ceil(log_gamma(x))`` this index uses NO
    transcendentals — bitlen + shift only — so the sketch is
    bit-reproducible across engines and the DuckDB oracle rebuilds it
    cell-for-cell.  NULLs and negative values are excluded (quantize
    signed/fractional data to non-negative integer units first, e.g.
    cents)."""
    _check_hdr_sub_bits(sub_bits)
    v = F.col(col).cast("long")
    vals = df.where(v.isNotNull() & (v >= 0)).select(v.alias("_v"))
    return (vals.select(hdr_index(F.col("_v"), sub_bits).alias("idx"))
                .groupBy("idx").agg(F.count("*").alias("c")))


def hdr_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of shard histograms == the union corpus's
    histogram (counters are plain sums, same algebra as count-min).
    Inputs must share ``sub_bits``; cost O(n_shards x n_buckets) —
    metadata-sized."""
    if not sketches:
        raise ValueError("hdr_merge needs at least one sketch")
    merged = sketches[0]
    for s in sketches[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy("idx").agg(F.sum("c").alias("c"))


def hdr_quantiles(sketch: DataFrame, qs_permille: list[int], *,
                  sub_bits: int = 7) -> DataFrame:
    """Quantile estimates from the histogram, ``(q_pm int, est_value
    long)`` — one row per requested permille.  percentile_disc
    semantics in pure integers: rank ``ceil(q * n)`` computed as
    ``(n * q_pm + 999) div 1000`` (exact — n*q_pm is an integer),
    answered by the first bucket whose cumulative count reaches it;
    the estimate is the bucket midpoint ``lo + (hi - lo) div 2``.

    The cumulative walk is a window over the HISTOGRAM (metadata-
    sized by construction — <= ~7.4k rows at sub_bits=7), not the
    corpus, so the single-partition window is free; the corpus never
    pays a sort."""
    _check_hdr_sub_bits(sub_bits)
    if not qs_permille:
        raise ValueError("hdr_quantiles needs at least one permille")
    for q in qs_permille:
        if not (0 <= q <= 1000):
            raise ValueError(f"permille out of [0, 1000]: {q}")
    from pyspark.sql import Window

    spark = sketch.sparkSession
    w = Window.orderBy("idx").rowsBetween(Window.unboundedPreceding, 0)
    walk = sketch.select(
        "idx",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(
            Window.orderBy("idx").rowsBetween(
                Window.unboundedPreceding,
                Window.unboundedFollowing)).alias("n"))
    qdf = spark.createDataFrame(
        [(int(q),) for q in sorted(set(qs_permille))], "q_pm int")
    rank = F.greatest(
        F.lit(1).cast("long"),
        F.expr("(n * q_pm + 999) div 1000"))
    hits = (qdf.join(F.broadcast(walk.where(F.col("n") > 0)),
                     F.col("cum") >= rank, "inner")
               .groupBy("q_pm").agg(F.min("idx").alias("idx")))
    lo, hi = hdr_bounds(F.col("idx"), sub_bits)
    # midpoint via >> 1 — stays integer (a double (hi-lo)/2 would
    # round above 2^53)
    est = lo + F.call_function("shiftright", hi - lo,
                               F.lit(1).cast("int"))
    return hits.select("q_pm", est.cast("long").alias("est_value"))


def hll_set_report(df: DataFrame, col: str, cond_a: Column,
                   cond_b: Column, *, p: int = 8) -> DataFrame:
    """HLL set algebra certification, one row: the union estimate
    comes from merging the two register TABLES (max(rho) — the
    operation an opaque approx_count_distinct can't offer across
    stored sketches), and the intersection estimate is
    inclusion-exclusion ``est_a + est_b - est_union`` — signed, NOT
    clamped: its error is relative to the UNION size, so small true
    intersections can legitimately estimate negative, and hiding that
    would misstate the sketch's contract.

    Columns: ``exact_intersect, est_a, est_b, est_union,
    est_intersect, err_bp`` (signed bp of est_intersect vs the exact
    intersection; 0 when exact is 0).  The exact side — and the two
    extra scans it takes — is the certification harness; production
    callers persist per-set registers and do the algebra on
    metadata."""
    _check_hll_p(p)
    a = hll_build(df.where(cond_a), col, p=p)
    b = hll_build(df.where(cond_b), col, p=p)
    ea = hll_estimate(a, p=p).select(
        F.col("est_distinct").alias("est_a"))
    eb = hll_estimate(b, p=p).select(
        F.col("est_distinct").alias("est_b"))
    eu = hll_estimate(hll_merge(a, b), p=p).select(
        F.col("est_distinct").alias("est_union"))
    ids = df.where(F.col(col).isNotNull())
    exact = (ids.where(cond_a).select(col).distinct()
             .intersect(ids.where(cond_b).select(col).distinct())
             .agg(F.count("*").cast("long").alias("exact_intersect")))
    return (exact.crossJoin(ea).crossJoin(eb).crossJoin(eu)
            .select("exact_intersect", "est_a", "est_b", "est_union",
                    (F.col("est_a") + F.col("est_b")
                     - F.col("est_union")).cast("long")
                     .alias("est_intersect"))
            .select("exact_intersect", "est_a", "est_b", "est_union",
                    "est_intersect",
                    F.expr("CASE WHEN exact_intersect = 0 "
                           "THEN CAST(0 AS BIGINT) ELSE "
                           "(est_intersect - exact_intersect) * 10000 "
                           "div exact_intersect END")
                     .cast("long").alias("err_bp")))


def hdr_build_grouped(df: DataFrame, col: str,
                      group_cols: list[str], *,
                      sub_bits: int = 7) -> DataFrame:
    """Per-group quantile histograms ``(group..., idx, c)`` — the
    production shape ("p99 latency per endpoint/day"): at most
    ``~(65 - sub_bits) * 2^sub_bits`` rows PER GROUP, one exchange
    keyed (group, idx) with map-side partial sums.  Same-group
    histograms from different shards/days merge with a plain
    ``groupBy(group, idx).sum(c)`` — daily sketches roll up into
    monthly percentiles without touching raw data."""
    _check_hdr_sub_bits(sub_bits)
    if not group_cols:
        raise ValueError("hdr_build_grouped needs group_cols; use "
                         "hdr_build for the ungrouped sketch")
    v = F.col(col).cast("long")
    vals = (df.where(v.isNotNull() & (v >= 0))
              .select(*[F.col(g) for g in group_cols], v.alias("_v")))
    return (vals.select(*group_cols,
                        hdr_index(F.col("_v"), sub_bits).alias("idx"))
                .groupBy(*group_cols, "idx")
                .agg(F.count("*").alias("c")))


def hdr_quantiles_grouped(sketch: DataFrame, group_cols: list[str],
                          qs_permille: list[int], *,
                          sub_bits: int = 7) -> DataFrame:
    """Per-group quantile estimates ``(group..., q_pm, est_value)``
    from grouped histograms — the same integer rank and midpoint as
    :func:`hdr_quantiles`, with the cumulative walk partitioned by
    group (each partition is one group's metadata-sized histogram, so
    the window parallelizes across groups instead of serializing on
    one)."""
    _check_hdr_sub_bits(sub_bits)
    if not group_cols:
        raise ValueError("hdr_quantiles_grouped needs group_cols")
    if not qs_permille:
        raise ValueError("hdr_quantiles_grouped needs at least one "
                         "permille")
    for q in qs_permille:
        if not (0 <= q <= 1000):
            raise ValueError(f"permille out of [0, 1000]: {q}")
    from pyspark.sql import Window

    spark = sketch.sparkSession
    w = (Window.partitionBy(*group_cols).orderBy("idx")
               .rowsBetween(Window.unboundedPreceding, 0))
    wn = (Window.partitionBy(*group_cols)
                .rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing))
    walk = sketch.select(
        *group_cols, "idx",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(wn).alias("n"))
    qdf = spark.createDataFrame(
        [(int(q),) for q in sorted(set(qs_permille))], "q_pm int")
    rank = F.greatest(
        F.lit(1).cast("long"),
        F.expr("(n * q_pm + 999) div 1000"))
    hits = (walk.where(F.col("n") > 0)
                .join(F.broadcast(qdf), F.col("cum") >= rank, "inner")
                .groupBy(*group_cols, "q_pm")
                .agg(F.min("idx").alias("idx")))
    lo, hi = hdr_bounds(F.col("idx"), sub_bits)
    est = lo + F.call_function("shiftright", hi - lo,
                               F.lit(1).cast("int"))
    return hits.select(*group_cols, "q_pm",
                       est.cast("long").alias("est_value"))


def hdr_report(df: DataFrame, col: str,
               qs_permille: list[int], *,
               sub_bits: int = 7) -> DataFrame:
    """Certification report, one row per permille: exact
    percentile_disc vs the sketch estimate and the signed relative
    error in basis points (``(est - exact) * 10000 div exact``; 0
    when exact is 0).  ``|err_bp| <= 10000 / 2^sub_bits`` by the
    bucket-width bound — the driver row pins that inequality, not a
    lucky value.  The exact side is the certification harness;
    production callers persist :func:`hdr_build` histograms and merge
    them instead."""
    _check_hdr_sub_bits(sub_bits)
    from pyspark.sql import Window

    v = F.col(col).cast("long")
    clean = df.where(v.isNotNull() & (v >= 0)).select(v.alias("_v"))
    spark = df.sparkSession
    # Exact side: percentile_disc's definition evaluated in pure
    # integers — value at rank ceil(q*n) = (n*q_pm + 999) div 1000.
    # Spark's percentile_disc(0.9) computes the rank from the DOUBLE
    # 0.9 (> 9/10), which rounds the ceil UP one row whenever 10 | n;
    # the integer rank can't.  row_number is dense, so the lookup is
    # an equi broadcast join, and the global sort is the price of the
    # certification harness, not of the sketch.
    ranked = clean.select(
        "_v", F.row_number().over(Window.orderBy("_v")).alias("_rn"))
    qdf = spark.createDataFrame(
        [(int(q),) for q in sorted(set(qs_permille))], "q_pm int")
    ranks = (clean.agg(F.count("*").alias("n")).crossJoin(qdf)
             .select("q_pm",
                     F.greatest(F.lit(1).cast("long"),
                                F.expr("(n * q_pm + 999) div 1000"))
                      .alias("_rn")))
    exact_rows = (ranked.join(F.broadcast(ranks), "_rn")
                  .select("q_pm", F.col("_v").alias("exact_value")))
    est = hdr_quantiles(hdr_build(df, col, sub_bits=sub_bits),
                        qs_permille, sub_bits=sub_bits)
    return (exact_rows.join(est, "q_pm")
            .select(F.col("q_pm").cast("int").alias("q_pm"),
                    F.col("exact_value").cast("long")
                     .alias("exact_value"),
                    F.col("est_value").cast("long").alias("est_value"),
                    F.expr("CASE WHEN exact_value = 0 "
                           "THEN CAST(0 AS BIGINT) ELSE "
                           "(est_value - exact_value) * 10000 "
                           "div exact_value END")
                     .cast("long").alias("err_bp"))
            .orderBy("q_pm"))


def cms_topk_report(df: DataFrame, text_col: str = "text", *,
                    k: int = 20, depth: int = 4,
                    width: int = 1 << 12) -> DataFrame:
    """Certification report: the corpus's exact top-``k`` tokens
    (count desc, token asc — deterministic tie-break) side-by-side
    with their count-min estimates.

    Columns: ``word, exact_c, est_c, over_bp`` where ``over_bp`` is
    the overestimate in integer basis points
    (``(est_c - exact_c) * 10000 // exact_c``); ``est_c >= exact_c``
    by the sketch's one-sided error.

    This is the TEST harness for the sketch: the exact side is a
    full-vocabulary aggregate, affordable because the vocabulary (not
    the corpus) bounds it, with a distributed TakeOrdered top-k — no
    single-partition window.  Production callers at 100 TB use
    :func:`cms_build` + :func:`cms_estimate` alone and never pay the
    exact pass per probe.
    """
    from ._util import ensure_parallelism

    toks = ensure_parallelism(df).select(
        F.explode(_clean_tokens(F.col(text_col))).alias("word"))
    exact = toks.groupBy("word").agg(F.count("*").alias("exact_c"))
    topk = exact.orderBy(F.col("exact_c").desc(), F.col("word")) \
                .limit(k)
    est = cms_estimate(cms_build(df, text_col, depth=depth, width=width),
                       topk, depth=depth, width=width)
    return (topk.join(est, "word")
            .select("word",
                    F.col("exact_c").cast("long").alias("exact_c"),
                    "est_c",
                    F.expr("(est_c - exact_c) * 10000 div exact_c")
                     .cast("long").alias("over_bp")))
