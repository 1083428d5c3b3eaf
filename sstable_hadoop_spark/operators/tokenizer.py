"""Byte-pair-encoding tokenizer training and application, Spark-first.

Classic BPE (Sennrich et al. 2016, arXiv:1508.07909): start from the
character vocabulary, repeatedly merge the most frequent adjacent
symbol pair.  Training a tokenizer over the pretraining corpus is a
standard large-pipeline job the reference engine has no counterpart
for (its surface stops at SSTable scans — SURVEY.md §2 extensions);
this module is the 100 TB-shaped version:

* **One corpus-sized exchange, total.**  The corpus collapses to a
  ``(word, freq)`` table first (map-side partial count, one shuffle);
  every merge iteration thereafter runs on that vocab-sized table —
  at 100 TB the distinct-word table is millions of rows, not
  billions, so the O(n_merges) loop touches ~0.001% of the data.
* **Symbols ride a single spaced STRING column**, each symbol wrapped
  in its OWN pair of spaces (``" l  o  w  </w> "`` — two spaces
  between symbols), so the merge step is one JVM ``replace`` per
  iteration — codegen, no Python, no arrays rebuilt per row.  Pair
  counting splits on the double space and zips adjacent symbols
  (again codegen).  The self-padding is load-bearing: with a SHARED
  single-space delimiter (``" a a a a "``), a non-overlapping
  replace of ``" a a "`` consumes the boundary space and misses the
  very next adjacent occurrence (``[aa, a, a]`` instead of greedy
  left-to-right's ``[aa, aa]``).  With per-symbol wrapping the
  pattern ``" a  a "`` consumes only its own symbols' padding, so a
  single left-to-right non-overlapping pass is EXACTLY classic BPE's
  greedy merge pass — pinned against an independent fold
  implementation in tests.
* **Per-iteration ``localCheckpoint``** truncates lineage so the
  plan doesn't grow with n_merges (same pattern as
  dedup.connected-components, dedup.py:324).
* The learned merge table is collected to the driver — it is the
  metadata-sized ARTIFACT (ranks × ~3 short strings), same precedent
  as k-means centroids in similarity.py.

End-of-word marker: ``</w>`` is appended per word (the Sennrich
convention).  Merged symbols containing ``</w>`` are always
word-final, therefore never the LEFT element of a learned pair — so
replaying merges over a whole-document spaced string cannot merge
across word boundaries, and ``bpe_tokenize``'s document-level replay
is exactly per-word application.  (Assumes the literal substring
``</w>`` does not occur inside corpus words, like every
marker-based BPE implementation.)

``n_merges`` here is exact classic BPE — one global argmax per merge.
Two trainers share the semantics:

* ``train_bpe`` — every merge is a Spark job over the vocab-sized
  table.  This is the ORACLE HARNESS: each step is declarative SQL
  that DuckDB replays exactly (the driver row's unrolled CTEs), so
  the full trajectory is cross-engine certified.  Right for the
  certification merge counts (tens); a 32k-merge production vocab
  through it would be 32k sequential Spark jobs — days of pure
  scheduler overhead at any cluster size.
* ``train_bpe_local`` — the PRODUCTION path (VERDICT r9 #4): the
  corpus still collapses to (word, freq) with ONE Spark job (the
  only corpus-sized stage — what a 100 TB corpus actually costs),
  then the merge loop folds driver-local over that vocab-sized
  table with an indexed lazy-max heap, the same design as
  subword-nmt's learn_bpe and HuggingFace's trainer.  1k+ merges
  train in seconds; output is row-identical to ``train_bpe``
  (pytest-pinned on the oracle trajectory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: End-of-word marker (Sennrich et al. 2016 convention).
EOW = "</w>"


def _spaced_word(col):
    """``'low'`` → ``' l  o  w  </w> '`` — every symbol wrapped in its
    own spaces (see module docstring for why the wrapping is
    load-bearing); identical arithmetic in the DuckDB oracles
    (``regexp_replace(word, '(.)', ' \\1 ', 'g') || ' </w> '``)."""
    return F.concat(F.regexp_replace(col, "(.)", " $1 "),
                    F.lit(" " + EOW + " "))


def _words(text_col):
    return F.filter(
        F.split(F.trim(F.lower(text_col)), r"\s+"), lambda w: w != "")


def train_bpe(df: DataFrame, text_col: str = "text",
              n_merges: int = 100, min_freq: int = 2) -> DataFrame:
    """Learn ``n_merges`` BPE merges from a text corpus.

    Returns a DataFrame ``(rank int, lhs string, rhs string,
    merged string, pair_count bigint)`` ordered by rank — the merge
    table ``bpe_tokenize`` consumes.  Stops early when no pair
    reaches ``min_freq``.  Ties break deterministically on
    (count DESC, lhs ASC, rhs ASC), binary string order in both
    engines.

    Topology: one corpus exchange (word-frequency agg with map-side
    partials), then per merge: one vocab-sized pair-count agg + a
    1-row collect (the argmax is metadata) + one codegen ``replace``
    over the vocab, checkpointed.  Nothing corpus-sized ever moves
    again."""
    spark = df.sparkSession
    from ._util import ensure_parallelism

    df = ensure_parallelism(df)
    words = (df.select(F.explode(_words(F.col(text_col))).alias("word"))
               .groupBy("word")
               .agg(F.count("*").alias("freq")))
    vocab = words.select(
        _spaced_word(F.col("word")).alias("syms"),
        "freq").localCheckpoint()
    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        best = (vocab
                .selectExpr("freq", "split(trim(syms), '  ') AS t")
                .selectExpr(
                    "freq",
                    "explode(arrays_zip(slice(t, 1, size(t)-1), "
                    "slice(t, 2, size(t)-1))) AS p")
                .selectExpr("p['0'] AS lhs", "p['1'] AS rhs", "freq")
                .groupBy("lhs", "rhs")
                .agg(F.sum("freq").alias("cnt"))
                .filter(F.col("cnt") >= min_freq)
                .orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
                .limit(1)
                .collect())
        if not best:
            break
        lhs, rhs, cnt = best[0]["lhs"], best[0]["rhs"], best[0]["cnt"]
        merges.append((rank, lhs, rhs, lhs + rhs, cnt))
        vocab = vocab.withColumn(
            "syms",
            F.replace(F.col("syms"),
                      F.lit(f" {lhs}  {rhs} "),
                      F.lit(f" {lhs}{rhs} "))).localCheckpoint()
    return spark.createDataFrame(
        merges,
        schema="rank int, lhs string, rhs string, merged string, "
               "pair_count bigint")


def train_bpe_local(df: DataFrame, text_col: str = "text",
                    n_merges: int = 100, min_freq: int = 2,
                    max_words: int = 50_000_000) -> DataFrame:
    """``train_bpe`` at production merge counts: ONE Spark job (the
    corpus → (word, freq) collapse — the only corpus-sized stage),
    then the merge loop folds driver-local.  Row-identical output to
    ``train_bpe`` (same greedy pass, same (count DESC, lhs, rhs)
    tie-break — UTF-8 byte order and code-point order agree, so
    Python string comparison matches Spark's binary collation);
    pytest pins the two trajectories equal.

    The driver holds the (word, freq) table — vocab-sized metadata,
    the same precedent every real BPE trainer (subword-nmt,
    HuggingFace tokenizers) sets.  ``max_words`` bounds that collect
    loudly: a corpus with more distinct words than the bound raises
    instead of silently materializing gigabytes on the driver (prune
    with ``min_freq`` upstream or raise the bound deliberately).

    Per merge the work is O(words containing the merged pair), found
    through a pair→words inverted index, with the global argmax kept
    in a lazy max-heap (every count change pushes a fresh entry;
    stale entries are skipped on pop) — ~32k merges over a
    millions-of-words vocab run in seconds, vs one Spark job per
    merge on the oracle path."""
    import heapq

    from ._util import ensure_parallelism

    spark = df.sparkSession
    src = ensure_parallelism(df)
    wf = (src.select(F.explode(_words(F.col(text_col))).alias("word"))
             .groupBy("word")
             .agg(F.count("*").alias("freq")))
    n_distinct = wf.count()
    if n_distinct > max_words:
        raise ValueError(
            f"train_bpe_local: corpus has {n_distinct} distinct words "
            f"> max_words={max_words}; raise the bound or pre-prune "
            "rare words before training")
    rows = wf.collect()

    words: list[list[str]] = []
    freqs: list[int] = []
    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for r in rows:
        syms = list(r["word"]) + [EOW]
        idx = len(words)
        words.append(syms)
        freqs.append(int(r["freq"]))
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            pair_counts[p] = pair_counts.get(p, 0) + freqs[idx]
            pair_words.setdefault(p, set()).add(idx)

    heap = [(-c, p[0], p[1]) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    def _push(p):
        heapq.heappush(heap,
                       (-pair_counts.get(p, 0), p[0], p[1]))

    merges: list[tuple] = []
    for rank in range(1, n_merges + 1):
        best = None
        while heap:
            negc, lhs, rhs = heap[0]
            cur = pair_counts.get((lhs, rhs), 0)
            if -negc != cur or cur == 0:
                heapq.heappop(heap)  # stale entry
                continue
            best = (lhs, rhs, cur)
            break
        if best is None or best[2] < min_freq:
            break
        lhs, rhs, cnt = best
        merges.append((rank, lhs, rhs, lhs + rhs, cnt))
        changed: set[tuple[str, str]] = set()
        for w in sorted(pair_words.get((lhs, rhs), ())):
            syms, f = words[w], freqs[w]
            # one greedy left-to-right non-overlapping pass — the
            # exact pass the spaced-string replace performs
            out, i, n = [], 0, len(syms)
            while i < n:
                if (i + 1 < n and syms[i] == lhs
                        and syms[i + 1] == rhs):
                    out.append(lhs + rhs)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            old_pairs = [(syms[i], syms[i + 1])
                         for i in range(len(syms) - 1)]
            new_pairs = [(out[i], out[i + 1])
                         for i in range(len(out) - 1)]
            for p in old_pairs:
                left = pair_counts[p] - f
                if left:
                    pair_counts[p] = left
                else:
                    del pair_counts[p]
                changed.add(p)
            for p in new_pairs:
                pair_counts[p] = pair_counts.get(p, 0) + f
                changed.add(p)
            old_set, new_set = set(old_pairs), set(new_pairs)
            for p in old_set - new_set:
                s = pair_words.get(p)
                if s is not None:
                    s.discard(w)
                    if not s:
                        del pair_words[p]
            for p in new_set - old_set:
                pair_words.setdefault(p, set()).add(w)
            words[w] = out
        for p in changed:
            _push(p)
    return spark.createDataFrame(
        merges,
        schema="rank int, lhs string, rhs string, merged string, "
               "pair_count bigint")


def _merge_list(merges) -> list[tuple[str, str]]:
    """Merge table → rank-ordered [(lhs, rhs)]; accepts the DataFrame
    from ``train_bpe`` or a pre-collected list of rows/tuples."""
    if isinstance(merges, DataFrame):
        rows = merges.select("rank", "lhs", "rhs") \
                     .orderBy("rank").collect()
        return [(r["lhs"], r["rhs"]) for r in rows]
    out = []
    for m in merges:
        # pyspark Row subclasses tuple — check for named fields FIRST
        # or a (rank, lhs, rhs) Row would fall through to positional
        # guessing and silently yield (rank, lhs) pairs.
        if hasattr(m, "__fields__") or isinstance(m, dict):
            out.append((m["lhs"], m["rhs"]))
        else:
            seq = tuple(m)
            if len(seq) == 2:          # bare (lhs, rhs)
                out.append((seq[0], seq[1]))
            elif len(seq) == 5:        # full (rank,lhs,rhs,merged,cnt)
                out.append((seq[1], seq[2]))
            else:
                raise ValueError(
                    f"ambiguous merge tuple of length {len(seq)}: "
                    f"{seq!r} — pass (lhs, rhs), the 5-column "
                    "train_bpe row, or rows with named fields")
    return out


def _doc_syms(text_col):
    """Document → one spaced symbol string spanning all its words
    (``' h  i  </w>  h  i  </w> '``).  Safe for whole-doc merge
    replay: learned pairs never have a ``</w>``-bearing lhs (see
    module docstring), so no replace can span a word boundary."""
    return F.array_join(F.transform(_words(text_col), _spaced_word), "")


def bpe_tokenize(df: DataFrame, merges, text_col: str = "text") -> DataFrame:
    """Tokenize with a learned merge table — fully declarative.

    Replays merges in rank order as a chain of JVM ``replace`` calls
    over the document's spaced symbol string: zero Python, zero
    shuffle, whole-stage codegen per row.  Right for merge tables up
    to a few hundred ranks (the expression chain is n_merges deep);
    for production-sized tables (30k merges) use
    ``bpe_tokenize_fast`` — identical output, pytest-pinned.

    Adds ``tokens array<string>`` and ``n_tokens int`` to ``df``.
    NULL text tokenizes like empty text (``[]``/0), matching
    ``bpe_tokenize_fast``."""
    col = _doc_syms(F.coalesce(F.col(text_col), F.lit("")))
    for lhs, rhs in _merge_list(merges):
        col = F.replace(col, F.lit(f" {lhs}  {rhs} "),
                        F.lit(f" {lhs}{rhs} "))
    # all-whitespace/empty docs: split('') would yield [''] — emit []
    # so the declarative and pandas paths agree
    tokens = F.when(F.trim(col) == "",
                    F.array().cast("array<string>")) \
              .otherwise(F.split(F.trim(col), "  "))
    return df.withColumn("tokens", tokens) \
             .withColumn("n_tokens", F.size("tokens").cast("int"))


def bpe_tokenize_fast(df: DataFrame, merges,
                      text_col: str = "text") -> DataFrame:
    """Arrow-batched tokenizer for production merge-table sizes.

    Same semantics as ``bpe_tokenize`` (rank-ordered replay, each
    merge one greedy left-to-right non-overlapping pass), but applied
    per distinct word with a per-batch memo — Zipf makes the word
    cache hit rate extreme, so cost ≈ O(distinct words per batch ×
    n_merges) instead of O(tokens × n_merges).  A pandas UDF, not a
    row-at-a-time UDF; still zero shuffles."""
    import pandas as pd  # noqa: F401 (worker-side import)

    ranked = _merge_list(merges)

    @F.pandas_udf("array<string>")
    def _tok(texts):
        import re

        import pandas as pd

        # Match _words() exactly: Java \s is the ASCII class
        # [ \t\n\x0b\f\r] — Python str.split() would also split on
        # Unicode whitespace (U+00A0, U+2028, …) and diverge (same
        # pitfall corpus._JAVA_WS documents).  Remaining documented
        # gap: Python str.lower vs UTF8String.toLowerCase may differ
        # on exotic case folding; both are deterministic per engine.
        java_ws = re.compile(r"[ \t\n\x0b\f\r]+")

        memo: dict[str, list[str]] = {}

        def word_tokens(w: str) -> list[str]:
            got = memo.get(w)
            if got is not None:
                return got
            syms = list(w) + [EOW]
            for lhs, rhs in ranked:
                out, i, n = [], 0, len(syms)
                while i < n:
                    if (i + 1 < n and syms[i] == lhs
                            and syms[i + 1] == rhs):
                        out.append(lhs + rhs)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            memo[w] = syms
            return syms

        def doc(t) -> list[str]:
            toks: list[str] = []
            for w in java_ws.split((t or "").lower()):
                if w:
                    toks.extend(word_tokens(w))
            return toks

        return pd.Series([doc(t) for t in texts])

    return df.withColumn("tokens", _tok(F.col(text_col))) \
             .withColumn("n_tokens", F.size("tokens").cast("int"))
