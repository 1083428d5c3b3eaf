"""Compatibility sinks — the reference's two output formats as DataFrame
transforms (write with ``df.write.text(...)``).

- S10: ``base64(msgpack(MsgPackRow))`` one line per merged row
  (reference MsgPackSSTableDataReducer, mapred/SSTableData.scala:97-118,
  serialize :115; row shape :64-77).
- S11: ``(key, latestColumn.toString)`` text lines
  (reference SSTableDataReducer → WritableColumn.toString,
  mapred/SSTableData.scala:56, WritableColumn.java:95-103).

The engine's *native* sink is plain Parquet (columnar, splittable,
predicate-pushdown-friendly — strictly better at 100 TB); these exist
so reference users keep byte-level-compatible outputs where they need
them.  Packing runs as an Arrow-batched pandas UDF, not per-row Python.
"""

from __future__ import annotations

import base64

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .msgpack_lite import packb

# NB: @pandas_udf with a DDL-string return type needs an active
# SparkSession to parse it, so the udf is created lazily on first use
# — importing this package must work before any session exists.
_pack_row_udf = None


def _pack_row():
    global _pack_row_udf
    if _pack_row_udf is None:
        @pandas_udf("string")
        def pack_row(key: pd.Series, columns: pd.Series) -> pd.Series:
            # Tombstone winners: the reference sets value/ts only for
            # NORMAL|EXPIRING (SSTableData.scala:102-105), so a DELETED
            # cell keeps the MsgPackCol defaults — value=null (msgpack
            # nil) and ts=0 — NOT the tombstone's real timestamp.
            def cell(c):
                dead = c["state"] == "DELETED"
                return [
                    bytes(c["name"]),
                    None if dead else
                    (bytes(c["data"]) if c["data"] is not None else b""),
                    0 if dead else int(c["timestamp"]),
                    int(c["expiration"]) if c["expiration"] is not None else 0,
                    int(c["ttl"]) if c["ttl"] is not None else 0,
                ]

            out = []
            for k, cols in zip(key, columns):
                packed = packb([bytes(k),
                                [cell(c) for c in (cols if cols is not None
                                                   else [])]])
                out.append(base64.b64encode(packed).decode("ascii"))
            return pd.Series(out)

        _pack_row_udf = pack_row
    return _pack_row_udf


def to_msgpack_base64_lines(rows: DataFrame) -> DataFrame:
    """Nested merged rows (key, columns[]) → one-column DataFrame
    ``value: string`` of base64(msgpack) lines (S10)."""
    return rows.select(_pack_row()("key", "columns").alias("value"))


def manifest_tsv(manifest: DataFrame) -> DataFrame:
    """S9: split manifest as the reference's tab-separated layout —
    ``filename, splitIndex, byteStart, byteLength, innerOffset,
    innerLength, uncompressedLength, chunkOffsetsCSV``
    (GenerateSSTableDataSplits.scala:213,
    SplitSSTableDataRecordReader.scala:28-31).  Write with
    ``.write.text(path)``.  For compressed tables byteStart/byteLength
    are compressed-file positions and innerOffset locates the first row
    inside the uncompressed chunk range, exactly like the reference's
    reducer output."""
    return manifest.select(F.concat_ws(
        "\t",
        F.col("filename"),
        F.col("split_index"),
        F.col("byte_start"),
        F.col("byte_length"),
        F.col("inner_offset"),
        F.col("inner_length"),
        F.col("uncompressed_length"),
        F.concat_ws(",", F.col("chunks")),
    ).alias("value"))


def _hex_pairs(col) -> "F.Column":
    """Hadoop ``BytesWritable.toString`` rendering: lowercase two-digit
    hex per byte, space-separated (e.g. b'col' → '63 6f 6c')."""
    return F.rtrim(F.regexp_replace(F.lower(F.hex(col)), "(..)", "$1 "))


def to_text_lines(winners: DataFrame) -> DataFrame:
    """Row-LWW winners → ``key<TAB>rendered-cell`` text lines (S11).

    Rendering follows WritableColumn.toString (WritableColumn.java:95-103):
    ``Column(name,data,timestamp)`` for NORMAL, ``Deleted(name)`` for
    DELETED, ``Unknown`` otherwise (the reference renders EXPIRING as
    ``Unknown`` — reproduced verbatim).  ``name``/``data`` interpolate
    Hadoop ``BytesWritable``, whose toString emits space-separated hex
    byte pairs — reproduced here; the row key interpolates ``Text``,
    which renders as UTF-8.
    """
    rendered = (
        F.when(F.col("state") == "NORMAL",
               F.format_string("Column(%s,%s,%d)",
                               _hex_pairs(F.col("name")),
                               _hex_pairs(F.col("data")),
                               F.col("timestamp")))
         .when(F.col("state") == "DELETED",
               F.format_string("Deleted(%s)", _hex_pairs(F.col("name"))))
         .otherwise(F.lit("Unknown")))
    return winners.select(
        F.concat_ws("\t", F.col("key").cast("string"), rendered)
         .alias("value"))
