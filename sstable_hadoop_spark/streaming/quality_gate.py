"""Streaming data-quality gate — the constraint suite
(operators/checks.py) as a per-micro-batch circuit breaker, the
"stop bad data at the door" pattern every production ingest needs:
a batch is admitted only if EVERY rule passes; failing batches are
quarantined for inspection (or abort the stream, or are admitted
with the failure on record), and every batch's full per-rule report
is journaled either way.

Exactly-once across crash/replay without a transaction log:

* admitted/quarantined data lands in a per-batch directory
  (``.../batch=<id>``) written with ``mode("overwrite")`` — a
  replayed batch rewrites identical content into the same directory
  instead of appending duplicates (the same idempotence argument as
  the bucketed-upsert sink);
* the journal entry is one atomic file keyed by batch id
  (``fs.write_bytes_atomic``) whose content is a deterministic
  function of the batch — a replay rewrites identical bytes.

Cost per batch: ONE fused aggregation pass for all rules (see
checks.py) + one write of the batch itself; the report collect is
len(rules) rows — metadata.

Reference scope: no counterpart (the reference trusts its inputs);
declared extension composing two existing components.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from ..operators.checks import check_constraints
from ..sources import fs

__all__ = ["QualityGateError", "quality_gate_stream",
           "read_quality_journal"]


class QualityGateError(RuntimeError):
    """A micro-batch failed the constraint suite under
    ``on_fail="abort"`` — the stream stops (circuit breaker).  The
    journal entry for the failing batch is written BEFORE the raise,
    so the failure is on record; restarting the stream replays the
    same batch and aborts again until the data or the rules change
    (that is the point of an abort gate)."""


def read_quality_journal(journal_dir: str) -> list[dict]:
    """All journal entries, batch order — one dict per batch with
    ``batch_id``, ``passed``, ``n_rows`` and the per-rule report.
    Driver-side metadata (len(rules) rows per batch)."""
    out = []
    for f in fs.list_dir(journal_dir):
        base = os.path.basename(f)
        if base.startswith("batch-") and base.endswith(".json"):
            out.append(json.loads(fs.read_bytes(f)))
    return sorted(out, key=lambda e: e["batch_id"])


def quality_gate_stream(stream: DataFrame, rules: list[dict],
                        accepted_dir: str, checkpoint_dir: str,
                        journal_dir: str,
                        on_fail: str = "quarantine",
                        quarantine_dir: str | None = None):
    """Gate ``stream`` through the constraint suite per micro-batch.

    ``on_fail``: ``"quarantine"`` (failing batches land in
    ``quarantine_dir`` — required then), ``"abort"`` (raise
    :class:`QualityGateError`, stopping the query), or ``"admit"``
    (write to ``accepted_dir`` anyway; the journal still records the
    failure — the observe-only mode to burn in new rules).

    Read admitted data with ``spark.read.parquet(accepted_dir)``
    (the per-batch dirs surface as a ``batch`` partition column)."""
    if on_fail not in ("quarantine", "abort", "admit"):
        raise ValueError(
            f"on_fail must be quarantine/abort/admit, got {on_fail!r}")
    if on_fail == "quarantine" and not quarantine_dir:
        raise ValueError('on_fail="quarantine" needs quarantine_dir=')

    def gate(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.cache()
        try:
            report = check_constraints(batch_df, rules).collect()
            ok = all(r["passed"] for r in report)
            n_rows = next((r["metric"] for r in report
                           if r["rule"] == "row_count"), None)
            fs.makedirs(journal_dir)
            entry = {
                "batch_id": batch_id, "passed": ok,
                "n_rows": n_rows,
                "rules": [{"rule_id": r["rule_id"], "rule": r["rule"],
                           "target": r["target"],
                           "metric": r["metric"],
                           "violations": r["violations"],
                           "passed": r["passed"]} for r in report],
            }
            fs.write_bytes_atomic(
                os.path.join(journal_dir,
                             f"batch-{batch_id:020d}.json"),
                json.dumps(entry, sort_keys=True).encode())
            if ok or on_fail == "admit":
                dest = os.path.join(accepted_dir, f"batch={batch_id}")
            elif on_fail == "quarantine":
                dest = os.path.join(quarantine_dir,
                                    f"batch={batch_id}")
            else:
                failed = [r["target"] for r in report
                          if not r["passed"]]
                raise QualityGateError(
                    f"batch {batch_id} failed constraint(s) "
                    f"{failed}; see the journal at {journal_dir}")
            batch_df.write.mode("overwrite").parquet(dest)
        finally:
            batch_df.unpersist()

    return (stream.writeStream
            .foreachBatch(gate)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
