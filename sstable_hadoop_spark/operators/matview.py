"""Materialized rollup views over transaction-log tables, refreshed
INCREMENTALLY with an exactly-once cursor.

The view is itself a logged table (same format, same time travel,
same readers), holding `txlog_rollup`'s shape — one row per group
with ``n_rows`` and ``sum_<c>`` columns.  Each refresh:

1. reads the BASE's change feed from the last refreshed version to
   head (`txlog_diff` — O(files that changed), never O(base));
2. folds it into the stored view with `txlog_incremental_rollup`
   (count/sum self-inversion, exact for integer sums);
3. swaps the view's content in ONE `txlog_overwrite` commit whose
   ``txn`` tag IS the cursor: the view's own commit log records
   "refreshed through base version V", read back via
   `txlog_txn_high_water` — no side-channel state files, and a
   crashed/replayed refresh of the same window is a no-op (the tag
   dedups inside the commit protocol).

At 100 TB the refresh cost tracks the day's commits, not the table:
the base-side reads are the diff's file-granular batch, and the view
side is rollup-sized.  Compare `streaming/` for push-based variants;
this is the pull-based nightly shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .txlog import (
    txlog_create,
    txlog_exists,
    txlog_incremental_rollup,
    txlog_overwrite,
    txlog_read,
    txlog_rollup,
    txlog_snapshot,
    txlog_txn_high_water,
)

#: txn app name under which refresh cursors journal in the VIEW's log.
MATVIEW_APP = "matview-refresh"


def matview_refresh(spark, view_path: str, base_path: str,
                    group_by: list[str], sum_cols: list[str],
                    n_buckets: int = 4) -> tuple[int, bool]:
    """Create-or-refresh the rollup view of ``base_path`` at
    ``view_path``.  First call full-builds (one base scan); later
    calls fold only the base's change feed since the journaled
    cursor.  Returns ``(base version now reflected, whether work
    happened)`` — a no-op when the base hasn't committed since the
    last refresh.

    Safe under replays and racing refreshers: the winning refresh
    journals the cursor transactionally; the loser's identical
    window turns into a duplicate-tag no-op."""
    head = txlog_snapshot(base_path)["version"]
    if not txlog_exists(view_path):
        full = txlog_rollup(spark, base_path, group_by, sum_cols,
                            version=head)
        txlog_create(spark, view_path, full, tuple(group_by),
                     n_buckets, txn=(MATVIEW_APP, head))
        return head, True
    cur = txlog_txn_high_water(view_path, MATVIEW_APP)
    if cur < 0:
        raise ValueError(
            f"{view_path} exists but journals no {MATVIEW_APP!r} "
            "cursor — it was not created by matview_refresh; build "
            "the view at a fresh path")
    if head <= cur:
        return cur, False
    stored = txlog_read(spark, view_path)
    fresh = txlog_incremental_rollup(spark, base_path, stored,
                                     group_by, sum_cols,
                                     v_from=cur, v_to=head)
    txlog_overwrite(spark, view_path, fresh,
                    txn=(MATVIEW_APP, head))
    return head, True


def matview_read(spark, view_path: str) -> DataFrame:
    """The view's current content (a plain logged-table read — time
    travel and the streaming source work on it like any table)."""
    return txlog_read(spark, view_path)


def matview_staleness(view_path: str, base_path: str) -> int:
    """How many base versions the view is behind (0 = current) —
    metadata-only, the monitoring hook."""
    cur = txlog_txn_high_water(view_path, MATVIEW_APP)
    if cur < 0:
        raise ValueError(
            f"{view_path} journals no {MATVIEW_APP!r} cursor")
    return txlog_snapshot(base_path)["version"] - cur
