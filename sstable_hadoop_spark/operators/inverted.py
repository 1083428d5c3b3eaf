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

from .text import _tokens

_META = "_inverted_meta.json"


def _clean_tokens(text: Column) -> Column:
    return F.filter(_tokens(text), lambda t: t != "")


def index_bucket(term: Column, n_buckets: int) -> Column:
    """``md5(term)``'s 60-bit half mod ``n_buckets`` — the partition
    key; identical BIGINT arithmetic in Spark and DuckDB."""
    return (F.conv(F.substring(F.md5(term), 1, 15), 16, 10)
             .cast("long") % n_buckets).cast("int")


def write_inverted_index(df: DataFrame, path: str,
                         text_col: str = "text",
                         id_col: str = "doc_id", *,
                         n_buckets: int = 64) -> None:
    """Build the postings table ``(term, doc_id, tf)`` partitioned by
    ``_b`` and record ``n_buckets`` in an atomic sidecar so probes
    never guess the layout.  ONE corpus-sized exchange (the
    ``(term, doc_id)`` tf aggregation, map-side partials); the
    ``repartition("_b")`` rides the same AQE-planned shuffle count and
    keeps one writer task per bucket."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    from ..sources import fs

    toks = df.select(F.col(id_col).cast("long").alias("doc_id"),
                     F.explode(_clean_tokens(F.col(text_col)))
                      .alias("term"))
    postings = (toks.groupBy("term", "doc_id")
                    .agg(F.count("*").cast("long").alias("tf"))
                    .withColumn("_b", index_bucket(F.col("term"),
                                                   n_buckets)))
    (postings.repartition("_b")
             .write.partitionBy("_b").mode("overwrite").parquet(path))
    fs.write_bytes_atomic(path.rstrip("/") + "/" + _META,
                          json.dumps({"n_buckets": n_buckets}).encode())


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
    from ..sources import fs

    meta = json.loads(fs.read_bytes(path.rstrip("/") + "/" + _META))
    n_buckets = int(meta["n_buckets"])
    # buckets computed driver-side with the same md5 arithmetic the
    # writer used (hashlib mirrors Spark's md5 for ascii/utf-8 bytes)
    import hashlib

    want = sorted({t for t in terms})
    buckets = sorted({int(hashlib.md5(t.encode("utf-8"))
                          .hexdigest()[:15], 16) % n_buckets
                      for t in want})
    idx = (spark.read.parquet(path)
                .filter(F.col("_b").isin(buckets))
                .filter(F.col("term").isin(want)))
    hits = idx.groupBy("doc_id").agg(
        F.countDistinct("term").cast("long").alias("n_terms_hit"),
        F.sum("tf").cast("long").alias("total_tf"))
    if mode == "and":
        hits = hits.filter(F.col("n_terms_hit") == len(want))
    return hits
