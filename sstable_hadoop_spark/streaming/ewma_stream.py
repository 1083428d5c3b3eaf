"""Streaming exact EWMA — the continuous twin of
``operators/timeseries.ewma_smooth`` via ``applyInPandasWithState``
(the engine's custom-stateful streaming extension point, SURVEY.md
§2.8/§2.9).

State per key is THREE integers ``(last_ts, s, rn)``; each micro-batch
sorts its arrivals by ``(ts, *tie_cols)`` and folds them through the
identical truncating recursion as the batch operator

    s_1 = v_1        s_t = (v_t + (2^shift - 1) * s_{t-1}) idiv 2^shift

so a finite in-order stream drained to completion emits exactly the
batch trajectory (asserted in tests/test_streaming.py).

Ordering contract (the kappa-architecture assumption an order-
SENSITIVE fold needs): rows must arrive per key in non-decreasing
event time ACROSS micro-batches — EWMA is not reorderable, so this is
a property of the ingest log, not something a watermark can repair.
A row arriving with ``ts`` below its key's folded high-water mark is
emitted with ``late = true`` and ``ewma_c = NULL`` and does NOT touch
the state (it can no longer be placed in the trajectory; dropping it
silently would hide the upstream ordering bug, folding it would
corrupt every later value).  Ties ACROSS batch boundaries fold in
arrival order (within a batch, ``tie_cols`` order them exactly as the
batch operator does).

Scale notes: state is hash-partitioned by key (RocksDB store in
production) and constant-size per key; per batch the work is linear
in arrivals.  Memory never depends on stream length.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import _parse_datatype_string


def ewma_stream(df: DataFrame, ts_us_col, key_col: str,
                value_col: str, *, shift: int = 3,
                tie_cols: tuple[str, ...] = ()) -> DataFrame:
    """Continuous per-key EWMA over a streaming frame: output rows
    ``(key, ts_us, rn, value_c, ewma_c, late)``.  See the module
    docstring for the ordering contract; parameters match
    :func:`operators.timeseries.ewma_smooth`."""
    if shift < 1 or shift > 20:
        raise ValueError(f"shift must be in [1, 20], got {shift}")
    mul, div = (1 << shift) - 1, 1 << shift
    ts = F.col(ts_us_col) if isinstance(ts_us_col, str) else ts_us_col
    key_type = next(f.dataType.simpleString() for f in df.schema.fields
                    if f.name == key_col)
    out_schema = _parse_datatype_string(
        f"`{key_col}` {key_type}, ts_us long, rn long, value_c long, "
        "ewma_c long, late boolean")
    state_schema = _parse_datatype_string(
        "last_ts long, s long, rn long")
    order = ["_tu", *tie_cols]

    src = (df.filter(F.col(key_col).isNotNull() & ts.isNotNull()
                     & F.col(value_col).isNotNull())
             .select(F.col(key_col),
                     ts.cast("long").alias("_tu"),
                     F.floor(F.col(value_col) * 100 + F.lit(0.5))
                      .cast("long").alias("_c"),
                     *[F.col(c) for c in tie_cols]))

    def fold(key: Any, pdfs: Iterable[pd.DataFrame],
             state: GroupState) -> Iterator[pd.DataFrame]:
        last_ts, s, rn = state.get if state.exists else (None, None, 0)
        out = {k: [] for k in ("ts_us", "rn", "value_c",
                               "ewma_c", "late")}
        kv = key[0]
        n_out = 0
        # ONE sort over the whole micro-batch: Arrow delivers a large
        # batch as multiple chunks, and sorting each chunk separately
        # would violate per-key ordering across chunk boundaries
        # (review r10: rows past maxRecordsPerBatch were mis-flagged
        # late)
        chunks = list(pdfs)
        if chunks:
            whole = (chunks[0] if len(chunks) == 1
                     else pd.concat(chunks, ignore_index=True))
            whole = whole.sort_values(order, kind="mergesort")
            # (itertuples mangles underscore-prefixed column names)
            for t, v in zip(whole["_tu"].to_list(),
                            whole["_c"].to_list()):
                t, v = int(t), int(v)
                if last_ts is not None and t < last_ts:
                    out["ts_us"].append(t)
                    out["rn"].append(None)
                    out["value_c"].append(v)
                    out["ewma_c"].append(None)
                    out["late"].append(True)
                    n_out += 1
                    continue
                if s is None:
                    s = v
                else:
                    q = v + mul * s
                    s = q // div if q >= 0 else -((-q) // div)
                rn += 1
                last_ts = t
                out["ts_us"].append(t)
                out["rn"].append(rn)
                out["value_c"].append(v)
                out["ewma_c"].append(s)
                out["late"].append(False)
                n_out += 1
        state.update((last_ts, s, rn))
        if n_out:
            yield pd.DataFrame({key_col: [kv] * n_out, **out})

    return (src.groupBy(key_col)
               .applyInPandasWithState(
                   fold, outputStructType=out_schema,
                   stateStructType=state_schema,
                   outputMode="append",
                   timeoutConf=GroupStateTimeout.NoTimeout))
