"""Rank fusion for hybrid retrieval (beyond-reference surface; the
retrieval layer over operators/inverted.py and similarity.py).

Production search rarely trusts one ranker: lexical (BM25) and
semantic/fuzzy rankers fail differently, and Reciprocal Rank Fusion
(Cormack, Clarke & Buettcher, SIGIR 2009) is the standard way to
combine them WITHOUT score calibration — only ranks enter the fused
score, so a ranker's score scale (BM25 micro-units vs cosine
milli-units vs Jaccard basis points) cannot dominate by accident:

    rrf(d) = sum over systems s of 1 / (k + rank_s(d))

evaluated here in exact integer micro-units (``1_000_000 div
(k + rank)``, truncation identical in Spark ``div`` and DuckDB
``//``), so a SQL oracle reproduces fused scores AND the fused order
bit-for-bit.

Scale shape: each input ranking is already a top-N result (N is a
query-time constant), so everything this module touches is
result-sized metadata — the unions, aggregations, and row_number
windows run over <= n_systems * N rows no matter the corpus size.
The corpus-sized work happened inside the rankers (partition-pruned
postings probes, pruned IVF cells), never here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rank_from_scores(scored: DataFrame, *, score_col: str,
                     id_col: str = "doc_id",
                     limit: int = 20) -> DataFrame:
    """Turn a scored candidate table into a dense top-``limit``
    ranking ``(id, rank)`` with the deterministic tie-break every
    ranker in this engine uses: score desc, id asc.  The orderBy +
    limit is a distributed TakeOrdered; the row_number window runs
    over the <= ``limit`` surviving rows only."""
    if limit < 1:
        raise ValueError(f"limit must be >= 1, got {limit}")
    from pyspark.sql import Window

    top = (scored.select(F.col(id_col), F.col(score_col))
                 .orderBy(F.col(score_col).desc(), F.col(id_col))
                 .limit(limit))
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col))
    return top.select(F.col(id_col),
                      F.row_number().over(w).cast("int").alias("rank"))


def rrf_fuse(rankings: list[DataFrame], *, id_col: str = "doc_id",
             rank_col: str = "rank", k: int = 60,
             limit: int | None = None) -> DataFrame:
    """Fuse per-system rankings into ``(id, rrf_micro, fused_rank)``:
    ``rrf_micro = sum(1_000_000 div (k + rank))`` over the systems
    that returned the document, ``fused_rank`` dense over
    (rrf_micro desc, id asc).  ``k`` (default 60, the value the RRF
    paper found robust) damps the head: rank 1 contributes
    1e6/(k+1), rank 100 still 1e6/(k+100) — absent documents simply
    contribute nothing, so no imputation is needed.

    Every input must already be a bounded top-N table (the output of
    :func:`rank_from_scores` or an equivalent); the fold is
    metadata-sized by construction.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    parts = [r.select(F.col(id_col),
                      F.col(rank_col).cast("long").alias("_r"))
             for r in rankings]
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    fused = (union
             .where(F.col("_r") >= 1)
             .select(id_col,
                     F.expr(f"CAST(1000000 div ({k} + _r) AS BIGINT)")
                      .alias("_c"))
             .groupBy(id_col)
             .agg(F.sum("_c").cast("long").alias("rrf_micro")))
    w = Window.orderBy(F.col("rrf_micro").desc(), F.col(id_col))
    out = fused.select(id_col, "rrf_micro",
                       F.row_number().over(w).cast("int")
                        .alias("fused_rank"))
    return out.where(F.col("fused_rank") <= limit) if limit else out
