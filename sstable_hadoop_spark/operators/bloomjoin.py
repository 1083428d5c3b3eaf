"""Bloom-prefiltered joins (beyond-reference surface; the join-side
application of the Filter.db-v2 / decontaminate_bloom double-hash
bitmap).

At 100 TB the dominant join cost is shuffling fact rows that the join
will discard anyway.  Spark's AQE can inject runtime bloom filters,
but only within one plan; this module makes the trick EXPLICIT and
durable: compress the small side's join keys into an ``m_bits``
bitmap once (a ``list[int]`` you can keep, ship across jobs, or
rebuild per batch), prefilter the big side with a SCAN-LOCAL codegen
predicate — zero joins, zero shuffles, one Filter over the FileScan —
and only then run the exact join.

Correctness is unconditional: blooms have no false negatives, so the
prefilter never drops a matching row, and the exact join removes the
false positives — ``bloom_filtered_join`` returns EXACTLY the plain
join's rows (the oracle is literally the plain join).  The bitmap
only decides how much of the big side survives to the exchange
(FP rate ≈ (set_bits/m)^k).

Same md5 double-hash arithmetic as the bloom decontaminator, so the
bitmap and every probe are engine-reproducible, false positives
included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .corpus import _BLOOM_LITERAL_MAX_BITS, _bloom_positions


def _key_hex(col):
    return F.md5(col.cast("string"))


def build_key_bloom(df: DataFrame, key_col: str, *,
                    m_bits: int = 1 << 17, k: int = 5) -> list[int]:
    """Bloom bitmap of a key column's distinct values, as signed
    64-bit words (len = m_bits/64).  Distributed position fan-out;
    only the distinct SET positions reach the driver — at most the
    bitmap itself, metadata-sized by construction."""
    if m_bits % 64 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    if m_bits > _BLOOM_LITERAL_MAX_BITS:
        raise ValueError(
            f"m_bits={m_bits} exceeds the literal-bitmap bound "
            f"{_BLOOM_LITERAL_MAX_BITS}; shard the dimension or rely "
            "on a plain broadcast join")
    if not (1 <= k <= 16):
        raise ValueError(f"k must be in [1, 16], got {k}")
    pos = (df.where(F.col(key_col).isNotNull())
             .select(F.explode(_bloom_positions(
                 _key_hex(F.col(key_col)), m_bits, k)).alias("p"))
             .distinct().collect())
    words = [0] * (m_bits // 64)
    for r in pos:
        p = r["p"]
        words[p >> 6] |= 1 << (p & 63)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_prefilter(df: DataFrame, key_col: str,
                    bloom_words: list[int], *,
                    m_bits: int = 1 << 17, k: int = 5) -> DataFrame:
    """Rows whose key MIGHT be in the bloomed set — a pure codegen
    Filter over the scan (``.explain`` shows no exchange).  NULL keys
    are dropped (they cannot match an equi-join anyway)."""
    if len(bloom_words) * 64 != m_bits:
        raise ValueError(
            f"bloom_words has {len(bloom_words)} words "
            f"({len(bloom_words) * 64} bits) but m_bits={m_bits}")
    # ONE ArrayType Literal — an F.array(*2048 lits) is a per-row
    # CreateArray and costs ~0.5s per million rows; measured 30s vs
    # ~4s on the sf10 prefilter
    words_lit = F.lit(list(bloom_words)).cast("array<bigint>")
    member = F.forall(
        _bloom_positions(_key_hex(F.col(key_col)), m_bits, k),
        lambda p: F.getbit(
            F.element_at(words_lit, (p / 64).cast("int") + 1),
            p % 64) == 1)
    return df.where(F.col(key_col).isNotNull() & member)


def bloom_filtered_join(big: DataFrame, small: DataFrame,
                        on: str, *, how: str = "inner",
                        m_bits: int = 1 << 17, k: int = 5) -> DataFrame:
    """``big.join(small, on, how)`` with the big side bloom-prefiltered
    first.  Row-identical to the plain join (no false negatives; the
    exact join kills false positives) — only the shuffle volume
    changes.  ``how`` is restricted to the shapes where dropping
    non-matching BIG rows early is semantics-preserving: ``inner``,
    ``semi``, and ``right`` (the preserved side is ``small``)."""
    if how not in ("inner", "semi", "left_semi", "right"):
        raise ValueError(
            f"how={how!r} would change results under a big-side "
            "prefilter; use inner/semi/right")
    words = build_key_bloom(small, on, m_bits=m_bits, k=k)
    pre = bloom_prefilter(big, on, words, m_bits=m_bits, k=k)
    return pre.join(small, on, how)
