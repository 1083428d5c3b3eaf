"""Inverted token index: exact-term retrieval over a document corpus
(beyond-reference surface; the exact-search sibling of the ANN stack
in operators/similarity.py).

The reference pipeline's query story ends at Pig scans of SSTable
rows; a training-data platform also needs "which documents contain
these terms" WITHOUT a corpus scan per probe.  This module builds the
classic search-engine answer as a Spark-native layout:

  * :func:`write_inverted_index` — one corpus exchange keyed
    ``(term, doc_id)`` producing per-term postings rows, written
    hive-partitioned by ``_b = md5-hash(term) % n_buckets``;
  * :func:`search_terms` — a probe reads ONLY the query terms'
    ``_b=N`` partition directories (plan-time partition pruning, the
    same mechanism as the stored-IVF probe), so per-query I/O is
    ``n_terms / n_buckets`` of the index regardless of corpus size.

Determinism / oracle contract: the bucket hash is the same
60-bit-md5 BIGINT arithmetic as the bloom/count-min operators —
reproducible in DuckDB — and the scoring output (per-doc summed term
frequency) is integer, so a SQL oracle re-derives search results from
the raw corpus exactly.

At 100 TB: the index is ~(distinct (term, doc) pairs) rows — typically
a small multiple of the corpus token count — but each probe touches
only the probed buckets' files; hot production deployments raise
``n_buckets`` with the corpus so bucket size stays bounded.  Postings
rows (not giant per-term arrays) keep the layout skew-proof: a
stopword's postings spread over many parquet row groups instead of
one unsplittable array cell.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .text import clean_tokens as _clean_tokens

_META = "_inverted_meta.json"


def index_bucket(term: Column, n_buckets: int) -> Column:
    """``md5(term)``'s 60-bit half mod ``n_buckets`` — the partition
    key; identical BIGINT arithmetic in Spark and DuckDB."""
    return (F.conv(F.substring(F.md5(term), 1, 15), 16, 10)
             .cast("long") % n_buckets).cast("int")


def write_inverted_index(df: DataFrame, path: str,
                         text_col: str = "text",
                         id_col: str = "doc_id", *,
                         n_buckets: int = 64,
                         positions: bool = False) -> None:
    """Build the postings table ``(term, doc_id, tf, dl)`` partitioned
    by ``_b`` and record ``{n_buckets, n_docs, total_tokens}`` in an
    atomic sidecar so probes never guess the layout.

    ``dl`` (the document's token count) is DENORMALIZED into every
    posting — one extra integer per row at build time buys join-free
    BM25 at probe time (:func:`bm25_search` needs no doc-length side
    table, the Lucene-norms trade made Spark-shaped).  Build cost: the
    corpus-sized ``(term, doc_id)`` tf aggregation (map-side partials)
    — the per-doc length rides the same fan-out as a window-free
    grouped sum re-joined bucket-locally by AQE.

    ``positions=True`` additionally stores each posting's sorted
    0-based token positions (``pos array<int>``) — required by
    :func:`phrase_search`, ~doubles index bytes (Lucene's
    freqs-vs-positions trade); the flag is recorded in the sidecar so
    probes fail loudly instead of mis-reading."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    from ..sources import fs

    # NULL text coalesces to an empty token array so size() (the dl
    # column) is 0, not Spark's size(NULL) = -1
    base = df.select(F.col(id_col).cast("long").alias("doc_id"),
                     F.coalesce(_clean_tokens(F.col(text_col)),
                                F.array().cast("array<string>"))
                      .alias("_toks"))
    toks = base.select("doc_id", F.size("_toks").alias("dl"),
                       F.posexplode("_toks").alias("p", "term"))
    aggs = [F.count("*").cast("long").alias("tf"),
            F.first("dl").cast("long").alias("dl")]
    if positions:
        aggs.append(F.sort_array(F.collect_list("p")).alias("pos"))
    postings = (toks.groupBy("term", "doc_id").agg(*aggs)
                    .withColumn("_b", index_bucket(F.col("term"),
                                                   n_buckets)))
    (postings.repartition("_b")
             .write.partitionBy("_b").mode("overwrite").parquet(path))
    # Totals WITHOUT re-tokenizing the corpus (the regex split is the
    # dominant build cost): n_docs is a plain row count of the input,
    # and total_tokens = sum(tf) over the postings just written.
    n_docs = df.count()
    from pyspark.errors import AnalysisException

    try:
        total_tokens = (df.sparkSession.read.parquet(path)
                        .agg(F.coalesce(F.sum("tf"), F.lit(0)))
                        .collect()[0][0])
    except AnalysisException:  # token-free corpus: zero part files
        total_tokens = 0
    fs.write_bytes_atomic(
        path.rstrip("/") + "/" + _META,
        json.dumps({"n_buckets": n_buckets,
                    "n_docs": int(n_docs),
                    "total_tokens": int(total_tokens),
                    "positions": bool(positions)}).encode())


def search_terms(spark: SparkSession, path: str, terms: list[str], *,
                 mode: str = "and") -> DataFrame:
    """Exact term search against a stored index: returns
    ``(doc_id, n_terms_hit, total_tf)`` for documents matching ALL
    (``mode="and"``) or ANY (``mode="or"``) of ``terms``.

    The scan filters ``_b IN (buckets of the query terms)`` — a
    plan-time PartitionFilter (pytest-asserted), so I/O is the probed
    buckets only — then ``term IN (terms)`` prunes within them.  The
    per-doc rollup is one exchange over the matched postings
    (result-sized, not corpus-sized).
    """
    if mode not in ("and", "or"):
        raise ValueError(f"mode must be 'and' or 'or', got {mode!r}")
    if not terms:
        raise ValueError("search_terms needs at least one term")
    want = sorted({t for t in terms})
    idx = _probe_postings(spark, path, want, _read_meta(path))
    hits = idx.groupBy("doc_id").agg(
        F.countDistinct("term").cast("long").alias("n_terms_hit"),
        F.sum("tf").cast("long").alias("total_tf"))
    if mode == "and":
        hits = hits.filter(F.col("n_terms_hit") == len(want))
    return hits


_POSTINGS_SCHEMA = "term string, doc_id long, tf long, dl long, _b int"
_POSTINGS_SCHEMA_POS = ("term string, doc_id long, tf long, dl long, "
                        "pos array<int>, _b int")


def _read_meta(path: str) -> dict:
    from ..sources import fs

    return json.loads(fs.read_bytes(path.rstrip("/") + "/" + _META))


def _probe_postings(spark: SparkSession, path: str, terms: list[str],
                    meta: dict) -> DataFrame:
    """The partition-pruned postings scan for the (deduplicated)
    query terms.  Buckets are computed driver-side with the same md5
    arithmetic the writer used (hashlib mirrors Spark's md5 over
    utf-8 bytes).  An index built from a token-free corpus has no
    parquet part files at all — that reads as an empty postings
    table, not a schema-inference error."""
    n_buckets = int(meta["n_buckets"])
    import hashlib

    want = sorted({t for t in terms})
    buckets = sorted({int(hashlib.md5(t.encode("utf-8"))
                          .hexdigest()[:15], 16) % n_buckets
                      for t in want})
    from pyspark.errors import AnalysisException

    try:
        idx = spark.read.parquet(path)
    except AnalysisException:  # zero part files -> no inferable schema
        schema = (_POSTINGS_SCHEMA_POS if meta.get("positions")
                  else _POSTINGS_SCHEMA)
        return spark.createDataFrame([], schema)
    return (idx.filter(F.col("_b").isin(buckets))
               .filter(F.col("term").isin(want)))


def bm25_search(spark: SparkSession, path: str, terms: list[str], *,
                k1_milli: int = 1200, b_milli: int = 750,
                limit: int = 10) -> DataFrame:
    """BM25-ranked retrieval over the stored index, in EXACT integer
    arithmetic: returns the top ``limit`` documents as
    ``(doc_id, n_terms_hit, score_micro)`` ordered by
    (score desc, doc_id asc — deterministic tie-break).

    Scoring (Robertson/Sparck-Jones BM25, k1/b in milli-units):

        idf_micro(t) = floor(ln((2N - 2df + 1) / (2df + 1)) * 1e6)
        inner_milli  = (1000 - b) + (b * dl * N) div total_tokens
        denom_milli  = tf * 1000 + (k1 * inner_milli) div 1000
        contrib      = (idf_micro * tf * (k1 + 1000)) div denom_milli
        score_micro  = sum(contrib over matched terms)

    Every step is integer multiply/``div`` (truncate toward zero in
    BOTH Spark and DuckDB) except the single ``floor(ln(ratio))``
    quantization, the same trusted pattern as ngram_lm_scores — so a
    SQL oracle reproduces scores bit-for-bit.  Negative idf for terms
    in more than half the corpus is kept as classic BM25 defines it
    (deterministic either way).

    Cost: the partition-pruned postings scan (df and tf both come
    from the probed rows — ``dl`` is denormalized in them, so there
    is NO doc-length join), one result-sized doc rollup, and a
    distributed TakeOrdered top-k.
    """
    if not terms:
        raise ValueError("bm25_search needs at least one term")
    if limit < 1:
        raise ValueError(f"limit must be >= 1, got {limit}")
    meta = _read_meta(path)
    n_docs = int(meta["n_docs"])
    total_tokens = int(meta["total_tokens"])
    if total_tokens <= 0:
        raise ValueError(
            f"index at {path} has no tokens; BM25 is undefined")
    idx = _probe_postings(spark, path, terms, meta)
    dfed = idx.groupBy("term").agg(F.count("*").alias("_df"))
    idf = dfed.select(
        "term",
        F.floor(F.log(
            (F.lit(2 * n_docs) - 2 * F.col("_df") + F.lit(1))
            .cast("double")
            / (2 * F.col("_df") + F.lit(1)).cast("double"))
            * F.lit(1000000.0)).alias("_idf"))
    # b*dl*N is widened to DECIMAL before the divide: at the corpus
    # scale this module targets (n_docs ~1e11, dl ~1e5) the LONG
    # product would wrap negative and silently sign-flip the score;
    # the quotient itself (≈ b * dl/avgdl) is small again
    scored = (idx.join(F.broadcast(idf), "term")
                 .select("doc_id", "term", F.expr(
                     f"(_idf * tf * ({k1_milli} + 1000)) div "
                     f"(tf * 1000 + ({k1_milli} * "
                     f"((1000 - {b_milli}) + "
                     f"CAST(({b_milli} * CAST(dl AS DECIMAL(38,0)) "
                     f"* {n_docs}) div {total_tokens} AS BIGINT)"
                     f")) div 1000)").alias("_contrib")))
    return (scored.groupBy("doc_id")
                  .agg(F.countDistinct("term").cast("long")
                        .alias("n_terms_hit"),
                       F.sum("_contrib").cast("long")
                        .alias("score_micro"))
                  .orderBy(F.desc("score_micro"), F.asc("doc_id"))
                  .limit(limit))


def phrase_search(spark: SparkSession, path: str,
                  terms: list[str]) -> DataFrame:
    """Exact-phrase search against a positions-enabled index: returns
    ``(doc_id, n_occurrences)`` for documents containing ``terms`` as
    CONSECUTIVE tokens, with the number of occurrences — the verbatim
    -quote / contamination primitive the per-term operators can't
    express (AND-search finds co-occurrence, not adjacency).

    Plan: the partition-pruned postings probe for the phrase's
    distinct terms, ONE result-sized per-doc rollup collecting each
    term's position array into a map, then a pure-codegen fold —
    ``starts = filter(pos[t0], s -> pos[t1] contains s+1 AND ...)`` —
    so adjacency is checked entirely inside whole-stage codegen with
    no further shuffle.  Repeated terms in the phrase reuse the same
    map entry at different offsets ("the the" works).
    """
    if not terms:
        raise ValueError("phrase_search needs at least one term")
    meta = _read_meta(path)
    if not meta.get("positions"):
        raise ValueError(
            f"index at {path} was written without positions=True; "
            "phrase_search needs positional postings")
    idx = _probe_postings(spark, path, terms, meta)
    distinct = sorted({t for t in terms})
    by_doc = (idx.groupBy("doc_id")
                 .agg(F.map_from_entries(
                     F.collect_list(F.struct("term", "pos")))
                      .alias("_m"),
                      F.countDistinct("term").alias("_nt"))
                 .filter(F.col("_nt") == len(distinct)))

    def _match_from(s: Column) -> Column:
        cond = F.lit(True)
        for i, t in enumerate(terms[1:], start=1):
            cond = cond & F.array_contains(
                F.element_at(F.col("_m"), F.lit(t)), s + i)
        return cond

    starts = F.filter(
        F.element_at(F.col("_m"), F.lit(terms[0])), _match_from)
    return (by_doc.select("doc_id",
                          F.size(starts).cast("long")
                           .alias("n_occurrences"))
                  .filter(F.col("n_occurrences") > 0))
