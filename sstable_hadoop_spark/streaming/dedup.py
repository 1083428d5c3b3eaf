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
