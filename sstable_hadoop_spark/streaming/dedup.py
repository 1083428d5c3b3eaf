"""Streaming dedup surface (SURVEY.md §2.8): exactly-once event intake
with bounded state via watermarked duplicate dropping."""

from __future__ import annotations

from pyspark.sql import DataFrame

from .windows import _with_event_time


def dedup_events_stream(events: DataFrame, keys: list[str] | None = None,
                        watermark: str = "1 hour",
                        within_watermark: bool = True) -> DataFrame:
    """Drop duplicate events by key columns.

    Streaming: ``dropDuplicatesWithinWatermark`` keeps state only for
    the watermark horizon — duplicates arriving within the window are
    dropped, state for expired windows is evicted (O(window) state, not
    O(stream)).  Batch: plain ``dropDuplicates`` (the oracle twin).
    """
    keys = keys or ["event_id"]
    ev = _with_event_time(events)
    if not ev.isStreaming:
        return ev.dropDuplicates(keys)
    ev = ev.withWatermark("event_time", watermark)
    if within_watermark:
        return ev.dropDuplicatesWithinWatermark(keys)
    return ev.dropDuplicates(keys)


def minhash_dedup_foreach_batch(stored_profiles_path: str,
                                pairs_out_path: str,
                                text_col: str = "text",
                                id_col: str = "doc_id", n: int = 4,
                                num_perm: int = 16, bands: int = 4,
                                min_jaccard: float = 0.5,
                                max_doc_freq: int | None = 1000,
                                update_profiles: bool = True):
    """Continuous-ingest near-dup detection: a ``foreachBatch`` body
    that runs ``minhash_dedup_incremental`` per micro-batch against
    the profile store, appends the detected pairs, and (optionally)
    appends the batch's own profiles so LATER batches dedup against
    it — the streaming twin of the batch incremental operator.

    MinHash profiles need a full per-doc aggregation, which structured
    streaming cannot express mid-stream in append mode; foreachBatch
    is the standard escape hatch and keeps every batch a plain batch
    plan (broadcast new side, corpus never re-shingled).  Idempotence:
    both writes go under ``batch_id``-named subdirectories (replay
    overwrites rather than re-appends), and the incremental operator
    excludes the batch's own ids from the stored side — so a replay
    that crashed AFTER its profile write still reproduces the original
    pairs, never jaccard-1.0 self-matches.

    Usage::

        body = minhash_dedup_foreach_batch(profiles, pairs)
        stream.writeStream.foreachBatch(body).start()
    """
    from ..operators.dedup import (
        minhash_dedup_incremental,
        minhash_profiles,
    )

    def body(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.errors import AnalysisException

        spark = batch_df.sparkSession
        try:
            stored = spark.read.parquet(stored_profiles_path)
            have_store = True
        except AnalysisException as e:
            # only a genuinely-absent store means "first batch"; any
            # other read failure (permissions, corrupt footer, flaky
            # FS) must fail the batch so Spark retries it — otherwise
            # the batch silently dedups only against itself and the
            # missed corpus pairs are never re-detected (ADVICE r5)
            if "PATH_NOT_FOUND" not in str(e) \
                    and "Path does not exist" not in str(e):
                raise
            stored = None
            have_store = False
        new_prof = minhash_profiles(batch_df, text_col, id_col, n,
                                    num_perm, max_doc_freq)
        # localCheckpoint: the profile lineage feeds BOTH the pair
        # detection and the store write — cut it once so the batch is
        # shingled/aggregated a single time, not per consumer
        new_prof = new_prof.localCheckpoint()
        if have_store:
            pairs = minhash_dedup_incremental(
                batch_df, stored, text_col, id_col, n, num_perm,
                bands, min_jaccard, max_doc_freq,
                new_profiles=new_prof)
        else:
            from ..operators.dedup import (
                _verify_pairs,
                lsh_candidate_pairs,
            )
            sig_cols = [f"sig_{i}" for i in range(num_perm)]
            cand = lsh_candidate_pairs(
                new_prof.select("id", *sig_cols), bands,
                num_perm // bands)
            pairs = _verify_pairs(cand, new_prof, min_jaccard)
        (pairs.write.mode("overwrite")
              .parquet(f"{pairs_out_path}/batch_id={batch_id}"))
        if update_profiles:
            (new_prof.write.mode("overwrite")
             .parquet(f"{stored_profiles_path}/batch_id={batch_id}"))

    return body
