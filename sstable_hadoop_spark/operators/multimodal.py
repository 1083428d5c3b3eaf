"""Multimodal column plumbing (declared extension E5, SURVEY.md §2.9):
image/audio/video as opaque ``binary`` payloads with typed metadata,
processed by Arrow-batched ``mapInPandas`` pipelines.

The SSTable cell model is already bytes-first (BinaryType data,
WritableColumn.java:17-18), so binary payload columns are native to the
engine.  Actual media decoding (PIL/ffmpeg/librosa) is NOT available in
this container — the decode kernels are STUBBED: ``fake=True`` (default)
runs a deterministic arithmetic fake so the Spark-side plumbing
(schema, batching, partitioning, UDF signatures) is fully real and
testable; ``fake=False`` raises NotImplementedError where the real
library call belongs.

Scale notes: payloads never pass through the driver; mapInPandas
processes Arrow batches per partition, and feature outputs are small
fixed-size arrays, so the shuffle after extraction carries features,
not media bytes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("modality", StringType(), False),   # image|audio|video
    StructField("payload", BinaryType(), False),    # opaque encoded bytes
    StructField("meta", StructType([                # typed metadata
        StructField("mime", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]), True),
])

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("modality", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("features", ArrayType(FloatType()), False),
])


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for decode→feature-extract: md5-seeded
    pseudo-features in [0, 1).  Replace with a real decoder + model when
    media libraries are available."""
    h = hashlib.md5(payload).digest()
    out = []
    for i in range(dim):
        hi = hashlib.md5(h + bytes([i])).digest()
        out.append(int.from_bytes(hi[:4], "big") / 2 ** 32)
    return out


def extract_features(media: DataFrame, fake: bool = True,
                     dim: int = FEATURE_DIM) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas
    (Arrow batches; one python worker per partition; media bytes stay
    on executors)."""
    if not fake:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg/librosa — not in "
            "this container; run with fake=True for the plumbing path")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["payload"].map(len),
                "features": pdf["payload"].map(
                    lambda p: _fake_decode_features(bytes(p), dim)),
            })

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int,
                  fake: bool = True) -> DataFrame:
    """Image resize kernel: passes payloads through mapInPandas keeping
    the media schema; the fake path tags metadata with the new size."""
    if not fake:
        raise NotImplementedError("real resize requires PIL — stubbed")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [{"mime": (m or {}).get("mime") if isinstance(m, dict) else None,
                     "width": width, "height": height,
                     "duration_ms": None} for m in pdf["meta"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "payload": pdf["payload"],
                "meta": meta,
            })

    return media.filter(F.col("modality") == "image") \
                .mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  fake: bool = True) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.  The
    fake path derives frame count from meta.duration_ms and synthesizes
    frame payload slices deterministically."""
    if not fake:
        raise NotImplementedError("real frame sampling requires ffmpeg")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_ms": [],
                    "payload": []}
            for _, r in pdf.iterrows():
                dur = (r["meta"] or {}).get("duration_ms") or 0
                n = max(int(dur // every_ms), 1)
                for i in range(n):
                    rows["media_id"].append(r["media_id"])
                    rows["frame_idx"].append(i)
                    rows["frame_ms"].append(i * every_ms)
                    payload = bytes(r["payload"])
                    step = max(len(payload) // n, 1)
                    rows["payload"].append(payload[i * step:(i + 1) * step])
            yield pd.DataFrame(rows)

    schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame_ms", LongType(), False),
        StructField("payload", BinaryType(), True),
    ])
    return media.filter(F.col("modality") == "video") \
                .mapInPandas(run, schema=schema)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a MEDIA_SCHEMA DataFrame from the documents table (text
    bytes as stand-in payloads) — the testdata path for exercising the
    plumbing without real media files."""
    modality = (F.when(F.col("doc_id") % 3 == 0, "image")
                 .when(F.col("doc_id") % 3 == 1, "audio")
                 .otherwise("video"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        modality.alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.when(modality == "image", F.col("n_chars")).alias("width"),
            F.when(modality == "image", F.lit(480).cast("long")).alias("height"),
            F.when(modality == "video", F.col("n_chars") * 10)
             .alias("duration_ms"),
        ).alias("meta"))
