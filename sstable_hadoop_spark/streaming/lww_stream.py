"""Streaming per-cell LWW merge — the reference's A3 compaction
semantics (MsgPackSSTableDataReducer HashMap merge,
mapred/SSTableData.scala:85-95) as a *continuous upsert* over an
unbounded stream of cell writes, via ``applyInPandasWithState``.

State per row key = {cell name → current winning cell}; each
micro-batch folds its arrivals into the state with the same
deterministic total order as the batch operator
(operators/lww.py: timestamp DESC, DELETED>EXPIRING>NORMAL, generation
DESC, data bytes) and emits the updated winners.  Run to completion
over a finite stream, the last emission per (key, name) equals the
batch ``lww_cell`` result exactly — asserted in
tests/test_streaming.py.

Scale notes: state is partitioned by key across executors (RocksDB
state store in production), so memory is O(live cells / executor);
only winner candidates are emitted downstream per batch.
"""

from __future__ import annotations

import base64
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CELL_FIELDS = StructType([
    StructField("key", BinaryType(), False),
    StructField("name", BinaryType(), False),
    StructField("state", StringType(), False),
    StructField("data", BinaryType(), True),
    StructField("timestamp", LongType(), False),
    StructField("ttl", LongType(), True),
    StructField("expiration", LongType(), True),
    StructField("generation", IntegerType(), False),
])

_STATE_RANK = {"DELETED": 2, "EXPIRING": 1, "NORMAL": 0}

# GroupState schema: one row per cell name (pickled-friendly scalars).
_STATE_SCHEMA = StructType([
    StructField("names", ArrayType(StringType()), True),      # b64 names
    StructField("packed", ArrayType(StringType()), True),     # packed cells
])


def _order_tuple(cell: dict) -> tuple:
    return (cell["timestamp"], _STATE_RANK[cell["state"]],
            cell["generation"],
            base64.b64encode(cell["data"] or b"").decode())


def _pack(cell: dict) -> str:
    return "|".join([
        cell["state"],
        base64.b64encode(cell["data"] or b"").decode(),
        "1" if cell["data"] is not None else "0",
        str(cell["timestamp"]),
        str(cell["ttl"]) if cell["ttl"] is not None else "",
        str(cell["expiration"]) if cell["expiration"] is not None else "",
        str(cell["generation"]),
    ])


def _unpack(s: str) -> dict:
    st, data_b64, has_data, ts, ttl, exp, gen = s.split("|")
    return {
        "state": st,
        "data": base64.b64decode(data_b64) if has_data == "1" else None,
        "timestamp": int(ts),
        "ttl": int(ttl) if ttl else None,
        "expiration": int(exp) if exp else None,
        "generation": int(gen),
    }


def _merge_cells(key: Any, pdfs: Iterable[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
    if state.exists:
        names, packed = state.get
        merged = {n: _unpack(p) for n, p in zip(names, packed)}
    else:
        merged = {}
    touched = set()
    for pdf in pdfs:
        for row in pdf.itertuples(index=False):
            cell = {
                "state": row.state,
                "data": bytes(row.data) if row.data is not None else None,
                "timestamp": int(row.timestamp),
                "ttl": int(row.ttl) if pd.notna(row.ttl) else None,
                "expiration": (int(row.expiration)
                               if pd.notna(row.expiration) else None),
                "generation": int(row.generation),
            }
            nb = base64.b64encode(bytes(row.name)).decode()
            cur = merged.get(nb)
            if cur is None or _order_tuple(cell) > _order_tuple(cur):
                merged[nb] = cell
                touched.add(nb)
    state.update((list(merged.keys()), [_pack(c) for c in merged.values()]))
    if touched:
        out = {f.name: [] for f in CELL_FIELDS.fields}
        kb = bytes(key[0])
        for nb in sorted(touched):
            c = merged[nb]
            out["key"].append(kb)
            out["name"].append(base64.b64decode(nb))
            out["state"].append(c["state"])
            out["data"].append(c["data"])
            out["timestamp"].append(c["timestamp"])
            out["ttl"].append(c["ttl"])
            out["expiration"].append(c["expiration"])
            out["generation"].append(c["generation"])
        yield pd.DataFrame(out)


def streaming_lww_cells(cell_stream: DataFrame) -> DataFrame:
    """Continuous per-cell LWW over a stream with CELL_FIELDS schema
    (+ key).  Emits, per micro-batch, the new winning cell for every
    (key, name) whose winner changed."""
    return (cell_stream
            .groupBy("key")
            .applyInPandasWithState(
                _merge_cells,
                outputStructType=CELL_FIELDS,
                stateStructType=_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
