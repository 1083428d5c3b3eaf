"""Streaming window views of the events model (SURVEY.md §2.8).

The reference is batch-MapReduce-only; these are the engine's declared
streaming extension.  Every function works on BOTH a batch DataFrame
and a streaming DataFrame (Structured Streaming unifies them), so the
batch mode is the DuckDB-checkable oracle twin of the stream.

Scale notes: windowed aggregations shuffle on (window, keys) with
partial aggregation; watermarks bound state (late events beyond the
watermark are dropped, state for closed windows is evicted) — state
size is O(open windows × keys), independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_event_time(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize the event-time column to TimestampType (testdata
    events.ts arrives as nano-epoch bigint)."""
    for f in events.schema.fields:
        if f.name == ts_col and f.dataType.simpleString().startswith("timestamp"):
            return events.withColumn("event_time",
                                     F.col(ts_col).cast("timestamp"))
    us = F.floor(F.col(ts_col).cast("decimal(38,0)") / F.lit(1000)) \
          .cast("long")
    return events.withColumn("event_time", F.timestamp_micros(us))


def tumbling_counts(events: DataFrame, width: str = "1 hour",
                    watermark: str | None = None) -> DataFrame:
    """Tumbling window per event_type: count + avg(value).
    Pass ``watermark`` when ``events`` is a stream."""
    ev = _with_event_time(events)
    if watermark:
        ev = ev.withWatermark("event_time", watermark)
    return (ev.groupBy(F.window("event_time", width).alias("w"), "event_type")
              .agg(F.count("*").alias("n"),
                   F.round(F.avg("value"), 4).alias("avg_value"))
              .select(F.unix_micros(F.col("w.start")).alias("w_start_us"),
                      F.unix_micros(F.col("w.end")).alias("w_end_us"),
                      "event_type", "n", "avg_value"))


def sliding_counts(events: DataFrame, width: str = "2 hours",
                   slide: str = "1 hour",
                   watermark: str | None = None) -> DataFrame:
    """Sliding window counts per event_type (each event lands in
    width/slide windows)."""
    ev = _with_event_time(events)
    if watermark:
        ev = ev.withWatermark("event_time", watermark)
    return (ev.groupBy(F.window("event_time", width, slide).alias("w"),
                       "event_type")
              .agg(F.count("*").alias("n"))
              .select(F.unix_micros(F.col("w.start")).alias("w_start_us"),
                      F.unix_micros(F.col("w.end")).alias("w_end_us"),
                      "event_type", "n"))


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str | None = None) -> DataFrame:
    """Session windows per user: events within ``gap`` of each other
    merge into one session (dynamic-length windows)."""
    ev = _with_event_time(events)
    if watermark:
        ev = ev.withWatermark("event_time", watermark)
    return (ev.groupBy(F.session_window("event_time", gap).alias("w"),
                       "user_id")
              .agg(F.count("*").alias("n_events"),
                   F.round(F.sum("value"), 2).alias("sum_value"))
              .select(F.unix_micros(F.col("w.start")).alias("w_start_us"),
                      F.unix_micros(F.col("w.end")).alias("w_end_us"),
                      "user_id", "n_events", "sum_value"))
