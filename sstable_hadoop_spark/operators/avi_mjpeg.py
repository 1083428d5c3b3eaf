"""MJPEG-in-AVI container codec — stdlib + the baseline JPEG codec.

Completes E5 (SURVEY.md §2.9): video payloads previously had no real
path at all (``sample_frames(fake=False)`` raised naming ffmpeg).  AVI
is plain RIFF — the same public chunk grammar as WAV — and Motion-JPEG
stores one baseline JPEG per ``00dc`` chunk, so an MJPEG AVI is fully
parseable with ``struct`` plus ``jpeg_codec.decode_jpeg``.  Other
codecs (H.264, VP9, ...) still raise naming ffmpeg; MJPEG is the one
video format that is honestly stdlib-decodable, and it is common in
scientific/capture corpora.

Real-world quirk handled: MJPEG frames classically OMIT their Huffman
tables (implicit Annex K per the OpenDML spec) — ``encode_avi_mjpeg``
can write such frames (``omit_dht=True``) and ``jpeg_codec`` decodes
them via its default-table fallback.

Layout written/parsed (all public, Microsoft AVI RIFF spec):
    RIFF('AVI ')
      LIST('hdrl')  avih(56-byte MainAVIHeader)
                    LIST('strl') strh('vids'/'MJPG') strf(BITMAPINFO)
      LIST('movi')  '00dc' <jpeg bytes> ...  (word-aligned)
      'idx1'        one entry per frame (offset/size)

Scale note: containers ride through the same opaque-binary column as
every other payload; parsing happens inside Arrow-batched mapInPandas
tasks on executors.  Frame extraction emits the JPEG bytes only for
the SAMPLED frames, so the post-sample shuffle carries `n_sampled`
small images, never the container.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg_codec import decode_jpeg, encode_jpeg


def _strip_dht(jpeg: bytes) -> bytes:
    """Remove every DHT segment (headerless-MJPEG style frames)."""
    out = bytearray(jpeg[:2])
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            out += jpeg[pos:]
            break
        marker = jpeg[pos + 1]
        if marker == 0xDA:            # SOS: copy the rest verbatim
            out += jpeg[pos:]
            break
        (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
        if marker != 0xC4:
            out += jpeg[pos:pos + 2 + seglen]
        pos += 2 + seglen
    return bytes(out)


def encode_avi_mjpeg(frames: list[np.ndarray], fps: int = 30,
                     quality: int = 85, omit_dht: bool = False) -> bytes:
    """uint8 RGB frames (equal shapes) → MJPEG AVI bytes."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w, _ = frames[0].shape
    jpegs = []
    for f in frames:
        if f.shape != frames[0].shape:
            raise ValueError("all frames must share one shape")
        j = encode_jpeg(f, quality)
        jpegs.append(_strip_dht(j) if omit_dht else j)

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\0" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    usec = 1_000_000 // fps
    maxbuf = max(len(j) for j in jpegs)
    avih = struct.pack("<14I", usec, maxbuf * fps, 0, 0x10,  # HASINDEX
                       len(jpegs), 0, 1, maxbuf, w, h, 0, 0, 0, 0)
    # 56-byte AVISTREAMHEADER: rcFrame is a full 8-byte RECT
    # (left, top, right, bottom as words), not a packed dword
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII",
            0, 0, 0, 0, 1, fps, 0, len(jpegs), maxbuf, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_body = bytearray()
    idx = bytearray()
    for j in jpegs:
        # idx1 offsets are relative to the 'movi' fourcc position
        off = 4 + len(movi_body)
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(j))
        movi_body += chunk(b"00dc", j)
    movi = lst(b"movi", bytes(movi_body))
    riff_body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def parse_avi_mjpeg(payload: bytes) -> dict:
    """MJPEG AVI → {"usec_per_frame", "width", "height", "n_frames",
    "frames": [jpeg bytes, ...]}.

    Walks the RIFF tree directly (no idx1 dependency — streams written
    without an index still parse); tolerates '00db' uncompressed-named
    chunks that actually hold JPEG, which some MJPEG writers emit.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    usec = width = height = 0
    handler = b""
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal usec, width, height, handler
        while pos + 8 <= end:
            fourcc = payload[pos:pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            body_start = pos + 8
            if fourcc == b"LIST":
                walk(body_start + 4, body_start + size)
            elif fourcc == b"avih":
                usec = struct.unpack_from("<I", payload, body_start)[0]
                width, height = struct.unpack_from(
                    "<II", payload, body_start + 32)
            elif fourcc == b"strh":
                if payload[body_start:body_start + 4] == b"vids":
                    handler = payload[body_start + 4:body_start + 8]
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                frames.append(payload[body_start:body_start + size])
            pos = body_start + size + (size % 2)

    walk(12, len(payload))
    if handler not in (b"MJPG", b"mjpg", b"dmb1"):
        raise NotImplementedError(
            f"AVI video handler {handler!r} requires ffmpeg — only "
            "MJPG is stdlib-decodable")
    return {"usec_per_frame": usec, "width": width, "height": height,
            "n_frames": len(frames), "frames": frames}


def sample_mjpeg_frames(payload: bytes, every_ms: int) -> list[tuple[int, int, bytes]]:
    """(frame_idx, frame_ms, jpeg_bytes) for one frame per ``every_ms``
    of video time (the frame whose timestamp covers each sample tick);
    always yields at least the first frame."""
    if every_ms <= 0:
        raise ValueError(f"every_ms must be positive, got {every_ms}")
    avi = parse_avi_mjpeg(payload)
    if avi["n_frames"] == 0:
        raise ValueError("MJPEG AVI contains no frames")
    usec = avi["usec_per_frame"] or 33333
    out = []
    seen = set()
    dur_ms = avi["n_frames"] * usec / 1000.0
    t = 0.0
    while t < dur_ms or not out:
        i = min(int(t * 1000.0 / usec), avi["n_frames"] - 1)
        if i not in seen:
            seen.add(i)
            out.append((i, int(i * usec / 1000), avi["frames"][i]))
        t += every_ms
    return out


def video_features(payload: bytes, dim: int) -> list[float]:
    """Real video features for the E5 feature vector:
    [3, w/4096, h/4096, n_frames/1000, dur_s/60,
     mean luminance of the middle frame, 10-bin luminance histogram]
    (decodes ONE frame — feature cost is O(frame), not O(video))."""
    avi = parse_avi_mjpeg(payload)
    if avi["n_frames"] == 0:
        raise ValueError("MJPEG AVI contains no frames")
    usec = avi["usec_per_frame"] or 33333
    mid = decode_jpeg(avi["frames"][avi["n_frames"] // 2])
    lum = mid.astype(np.float32).mean(axis=2) / 255.0
    hist, _ = np.histogram(lum, bins=10, range=(0.0, 1.0))
    out = [3.0, avi["width"] / 4096.0, avi["height"] / 4096.0,
           avi["n_frames"] / 1000.0,
           (avi["n_frames"] * usec / 1e6) / 60.0,
           float(lum.mean()), *(hist / max(lum.size, 1))]
    out = [float(v) for v in out]
    return (out + [0.0] * dim)[:dim]
