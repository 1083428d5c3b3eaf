"""Multimodal column plumbing (declared extension E5, SURVEY.md §2.9):
image/audio/video as opaque ``binary`` payloads with typed metadata,
processed by Arrow-batched ``mapInPandas`` pipelines.

The SSTable cell model is already bytes-first (BinaryType data,
WritableColumn.java:17-18), so binary payload columns are native to the
engine.  Decode kernels come in two tiers:

- ``fake=True`` (default): deterministic arithmetic stand-in, so the
  Spark-side plumbing (schema, batching, partitioning, UDF signatures)
  is exercised without any media dependency.
- ``fake=False``: REAL decoding for the formats parseable with the
  standard library alone — 24-bit uncompressed BMP, non-interlaced
  8-bit PNG (zlib inflate + scanline unfiltering), baseline AND
  progressive JPEG (jpeg_codec.py: Annex K Huffman + 8x8 DCT,
  4:4:4/4:2:2/4:2:0, restart intervals; r10 adds SOF2 spectral
  selection + successive approximation), PCM-16 WAV, and
  MJPEG-in-AVI video (avi_mjpeg.py: RIFF container walk + per-frame
  JPEG decode, real frame sampling under ``sample_frames(fake=
  False)``) — all public formats, pure struct+zlib+numpy.  Remaining
  formats (arithmetic-coded JPEG, MP3, non-MJPEG video codecs) raise
  NotImplementedError naming the library they need (PIL/ffmpeg — not
  in this container).

Scale notes: payloads never pass through the driver; mapInPandas
processes Arrow batches per partition, and feature outputs are small
fixed-size arrays, so the shuffle after extraction carries features,
not media bytes.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
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


# --- stdlib-only media codecs (real formats, no PIL/ffmpeg) ---------------


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP (BITMAPINFOHEADER,
    bottom-up rows, 4-byte row padding) — the classic public layout."""
    h, w, _ = rgb.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += rgb[y, :, ::-1].tobytes()  # BGR on disk
        body += b"\0" * pad
    off = 14 + 40
    return (struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                          2835, 2835, 0, 0)
            + bytes(body))


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h, _planes, bpp, comp = struct.unpack_from(
        "<IiiHHI", payload, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP is supported "
            f"(got bpp={bpp}, compression={comp})")
    pad = (-(w * 3)) % 4
    rows = []
    pos = off
    for _ in range(abs(h)):
        rows.append(np.frombuffer(payload, np.uint8, w * 3, pos)
                    .reshape(w, 3)[:, ::-1])  # BGR → RGB
        pos += w * 3 + pad
    if h > 0:
        rows.reverse()  # bottom-up on disk
    return np.stack(rows)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(rgb: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → non-interlaced 8-bit truecolor PNG
    (filter-0 scanlines, one zlib IDAT) — the minimal public writer."""
    import zlib

    h, w, _ = rgb.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """Non-interlaced 8-bit PNG (grayscale / RGB / RGBA, all five
    scanline filters) → (h, w, 3) uint8 RGB — stdlib zlib inflate +
    per-row unfiltering, no PIL.  Grayscale is expanded to RGB; the
    alpha channel of RGBA is dropped (features/resize operate on
    color).  Palette, 16-bit, and Adam7-interlaced PNGs raise
    ``NotImplementedError`` naming the limitation."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = ctype = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data)
            if depth != 8 or interlace != 0:
                raise NotImplementedError(
                    f"only 8-bit non-interlaced PNG is supported "
                    f"(got depth={depth}, interlace={interlace})")
            if ctype not in (0, 2, 6):
                raise NotImplementedError(
                    f"PNG color type {ctype} (palette/alpha-gray) is "
                    "not supported — decode with PIL")
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data has wrong length")
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    p = 0
    for y in range(h):
        ftype = raw[p]
        p += 1
        row = np.frombuffer(raw, np.uint8, stride, p).astype(np.int32)
        p += stride
        if ftype == 0:
            rec = row
        elif ftype == 2:  # Up
            rec = (row + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            rec = row.copy()
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prev[x]
                if ftype == 1:
                    rec[x] = (rec[x] + a) & 0xFF
                elif ftype == 3:
                    rec[x] = (rec[x] + (a + b) // 2) & 0xFF
                else:
                    c = prev[x - ch] if x >= ch else 0
                    pp = a + b - c
                    pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                    pred = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c)
                    rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        prev = rec
        out[y] = rec
    px = out.reshape(h, w, ch)
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    return px[:, :, :3]  # RGBA → drop alpha


def encode_wav(pcm: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples → RIFF/WAVE with one PCM ``data`` chunk."""
    data = pcm.astype("<i2").tobytes()
    return (struct.pack("<4sI4s", b"RIFF", 36 + len(data), b"WAVE")
            + struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate,
                          sample_rate * 2, 2, 16)
            + struct.pack("<4sI", b"data", len(data)) + data)


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM-16 → (sample_rate, int16 samples); walks chunks,
    so extra chunks (LIST, fact) are tolerated."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, data = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt, _ch, rate = struct.unpack_from("<HHI", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM-16 WAV is supported (fmt={fmt}, "
                    f"bits={bits})")
        elif cid == b"data":
            data = np.frombuffer(body, "<i2")
        pos += 8 + size + (size % 2)
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, data


def _real_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Real decode → fixed-size features for the stdlib formats.

    image (BMP/PNG): [1, w/4096, h/4096, meanR, meanG, meanB,
                      10-bin luminance histogram]     (normalized, 16)
    audio (WAV):     [2, rate/48000, dur_s/60, rms,
                      12-bin |amplitude| histogram]   (normalized, 16)
    """
    if (payload[:2] == b"BM" or payload[:8] == _PNG_SIG
            or payload[:2] == b"\xff\xd8"):
        if payload[:2] == b"BM":
            img = decode_bmp(payload)
        elif payload[:8] == _PNG_SIG:
            img = decode_png(payload)
        else:
            from .jpeg_codec import decode_jpeg
            img = decode_jpeg(payload)
        h, w, _ = img.shape
        lum = img.astype(np.float32).mean(axis=2) / 255.0
        hist, _ = np.histogram(lum, bins=10, range=(0.0, 1.0))
        out = [1.0, w / 4096.0, h / 4096.0,
               *(img.reshape(-1, 3).mean(axis=0) / 255.0),
               *(hist / max(lum.size, 1))]
    elif payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        from .avi_mjpeg import video_features
        out = video_features(payload, dim)
        return out
    elif payload[:4] == b"RIFF":
        rate, pcm = decode_wav(payload)
        x = pcm.astype(np.float32) / 32768.0
        hist, _ = np.histogram(np.abs(x), bins=12, range=(0.0, 1.0))
        out = [2.0, rate / 48000.0, (len(x) / rate) / 60.0,
               float(np.sqrt(np.mean(x * x))) if len(x) else 0.0,
               *(hist / max(len(x), 1))]
    else:
        raise NotImplementedError(
            "real decode supports BMP/PNG/JPEG/WAV/MJPEG-AVI; other "
            "video containers need ffmpeg — not in this container")
    out = [float(v) for v in out]
    return (out + [0.0] * dim)[:dim]


def _fake_decode_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for decode→feature-extract: md5-seeded
    pseudo-features in [0, 1).  Replace with a real decoder + model when
    media libraries are available.

    Formula: feature[i] = first-4-bytes of md5(payload || byte(i)) as
    a [0,1) fraction — chosen so a SQL engine can replicate it
    (``md5(text || chr(i))`` for UTF-8 payloads and i < 128), making
    the fake path cross-engine oracle-checkable, not just
    deterministic."""
    out = []
    for i in range(dim):
        hi = hashlib.md5(payload + bytes([i])).digest()
        out.append(int.from_bytes(hi[:4], "big") / 2 ** 32)
    return out


def extract_features(media: DataFrame, fake: bool = True,
                     dim: int = FEATURE_DIM) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas
    (Arrow batches; one python worker per partition; media bytes stay
    on executors).  ``fake=False`` decodes for real — BMP/WAV via the
    stdlib codecs above; other formats raise inside the task naming the
    missing library."""
    from ._util import ensure_parallelism

    media = ensure_parallelism(media)
    kernel = _fake_decode_features if fake else _real_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "n_bytes": pdf["payload"].map(len),
                "features": pdf["payload"].map(
                    lambda p: kernel(bytes(p), dim)),
            })

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int,
                  fake: bool = True) -> DataFrame:
    """Image resize kernel over mapInPandas, keeping the media schema.
    ``fake=False`` really resizes BMP and PNG payloads (nearest-neighbor
    index mapping — the standard cheap kernel) and re-encodes in the
    input's format; other image formats raise naming PIL.  The fake
    path passes payloads through and only rewrites metadata."""

    def _resize_image(payload: bytes) -> bytes:
        if payload[:2] == b"BM":
            img, enc = decode_bmp(payload), encode_bmp
        elif payload[:8] == _PNG_SIG:
            img, enc = decode_png(payload), encode_png
        elif payload[:2] == b"\xff\xd8":
            from .jpeg_codec import decode_jpeg, encode_jpeg
            img, enc = decode_jpeg(payload), encode_jpeg
        else:
            raise NotImplementedError(
                "real resize supports BMP/PNG/JPEG; other image "
                "formats need PIL")
        h, w, _ = img.shape
        ys = (np.arange(height) * h // height).clip(0, h - 1)
        xs = (np.arange(width) * w // width).clip(0, w - 1)
        return enc(img[np.ix_(ys, xs)])

    from ._util import ensure_parallelism

    media = ensure_parallelism(media)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [{"mime": (m or {}).get("mime") if isinstance(m, dict) else None,
                     "width": width, "height": height,
                     "duration_ms": None} for m in pdf["meta"]]
            payloads = (pdf["payload"] if fake else
                        pdf["payload"].map(lambda p: _resize_image(bytes(p))))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "modality": pdf["modality"],
                "payload": payloads,
                "meta": meta,
            })

    return media.filter(F.col("modality") == "image") \
                .mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000,
                  fake: bool = True) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.  The
    fake path derives frame count from meta.duration_ms and synthesizes
    frame payload slices deterministically.  ``fake=False`` REALLY
    samples MJPEG-AVI containers (operators/avi_mjpeg.py): each output
    payload is the sampled frame's JPEG bytes; non-MJPEG codecs raise
    inside the task naming ffmpeg.  Only sampled frames leave the task,
    so the downstream shuffle carries n_sampled images, never videos."""
    if not fake:
        from .avi_mjpeg import sample_mjpeg_frames

        def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ids, idxs, mss, payloads = [], [], [], []
                for mid, p in zip(pdf["media_id"], pdf["payload"]):
                    for i, ms, jpeg in sample_mjpeg_frames(
                            bytes(p), every_ms):
                        ids.append(mid)
                        idxs.append(i)
                        mss.append(ms)
                        payloads.append(jpeg)
                yield pd.DataFrame({
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_ms": pd.Series(mss, dtype="int64"),
                    "payload": payloads,
                })

        schema = StructType([
            StructField("media_id", LongType(), False),
            StructField("frame_idx", LongType(), False),
            StructField("frame_ms", LongType(), False),
            StructField("payload", BinaryType(), True),
        ])
        return media.filter(F.col("modality") == "video") \
                    .mapInPandas(run_real, schema=schema)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # vectorized explode: one np.repeat per batch for ids,
            # one concatenated arange for frame indices; only the
            # payload slicing (inherently per-bytes-object) is a
            # python comprehension
            durs = pdf["meta"].map(
                lambda m: (m or {}).get("duration_ms") or 0)
            counts = np.maximum(durs.to_numpy(np.int64) // every_ms, 1)
            frame_idx = np.concatenate(
                [np.arange(n) for n in counts]) if len(counts) else \
                np.array([], np.int64)
            payloads: list[bytes] = []
            for p, n in zip(pdf["payload"], counts):
                b = bytes(p)
                step = max(len(b) // n, 1)
                payloads.extend(b[i * step:(i + 1) * step]
                                for i in range(n))
            yield pd.DataFrame({
                "media_id": np.repeat(pdf["media_id"].to_numpy(), counts),
                "frame_idx": frame_idx,
                "frame_ms": frame_idx * every_ms,
                "payload": payloads,
            })

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
