"""Baseline JPEG (ITU-T T.81 sequential DCT) codec — stdlib + numpy only.

Closes the E5 multimodal gap flagged in round 4: JPEG payloads previously
raised ``NotImplementedError`` naming PIL; this module implements the
public baseline-sequential subset so ``extract_features(fake=False)`` and
``resize_images`` handle ``image/jpeg`` without any media library.

Scope (all from the public T.81 spec + JFIF):
- decode: baseline sequential (SOF0) AND progressive (SOF2, r10 —
  spectral selection + successive approximation per Annex G: DC
  first/refinement scans interleaved or single-component, AC scans
  with EOBn runs and refinement correction bits), 8-bit samples,
  Huffman entropy coding, 1-4 components with sampling factors 1-2
  (covers 4:4:4, 4:2:2, 4:2:0 and grayscale), restart intervals
  (DRI/RSTn), multi-table DQT/DHT segments, APPn/COM skipping.
  Arithmetic coding, 12-bit and hierarchical modes raise
  ``NotImplementedError`` naming the mode.
- encode: baseline (``encode_jpeg``) and progressive
  (``encode_jpeg_progressive``, the libjpeg-shaped scan script) with
  the Annex K quantization + Huffman tables, quality scaling per the
  well-known IJG curve.  Both encoders quantize identically, so the
  two encodings of one image decode to byte-identical pixels — the
  progressive path's roundtrip anchor.  Used for fixtures and for
  the re-encode half of ``resize_images``.

The DCT is the exact 8x8 DCT-II/III as matrix products (numpy einsum over
whole block batches) — no per-pixel Python in the hot loop; entropy
decode is the only scalar loop and runs over Arrow-batched executors via
mapInPandas (multimodal.py), never on the driver.

Reference parity note: the reference engine has no media path at all
(SURVEY.md §2.9, extension E5); this is beyond-reference capability for
multimodal training-data pipelines.
"""

from __future__ import annotations

import struct

import numpy as np

# --- 8x8 DCT basis ---------------------------------------------------------

_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16)
_C *= 0.5
_C[0, :] *= 1 / np.sqrt(2)
# forward:  F = C @ f @ C.T      inverse:  f = C.T @ F @ C


def _fdct(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial → (n, 8, 8) DCT-II coefficients."""
    return np.einsum("ij,njk,lk->nil", _C, blocks, _C)


def _idct(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) coefficients → (n, 8, 8) spatial."""
    return np.einsum("ji,njk,kl->nil", _C, blocks, _C)


# --- zigzag ----------------------------------------------------------------

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])
_UNZIGZAG = np.argsort(ZIGZAG)

# --- Annex K tables --------------------------------------------------------

K1_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
])
K2_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
])

# (bits-per-length list, symbol list) — T.81 Annex K.3
K3_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
              list(range(12)))
K4_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                list(range(12)))
K5_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
K6_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _build_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman: symbol → (code, length)."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_table(bits: list[int], symbols: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman: (length, code) → symbol."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return out


# --- color transforms (JFIF full-range) ------------------------------------


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    return np.stack([
        0.299 * r + 0.587 * g + 0.114 * b,
        128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
        128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b,
    ], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y = ycc[..., 0]
    cb = ycc[..., 1] - 128.0
    cr = ycc[..., 2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- encoder ---------------------------------------------------------------


def _scale_q(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality curve: 50 → base tables, 100 → all-ones."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int32)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            self.put(0x7F, 8 - self._n)  # pad with 1-bits


def _magnitude(v: int) -> tuple[int, int]:
    """v → (category, value-bits) per T.81 table F.1/F.2."""
    if v == 0:
        return 0, 0
    a = abs(v)
    cat = a.bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _quantized_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Level-shifted component plane → (bh, bw, 64) quantized zigzag
    ints, blocks in raster order; plane already padded to 8-multiples."""
    h, w = plane.shape
    blocks = (plane.reshape(h // 8, 8, w // 8, 8)
              .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
    coef = _fdct(blocks - 128.0)
    qz = np.round(coef.reshape(-1, 64) / q.reshape(1, 64)).astype(np.int32)
    return qz[:, ZIGZAG].reshape(h // 8, w // 8, 64)


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    dc = int(zz[0])
    cat, bits = _magnitude(dc - pred)
    code, length = dc_codes[cat]
    bw.put(code, length)
    if cat:
        bw.put(bits, cat)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]     # ZRL
            bw.put(code, length)
            run -= 16
        cat, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | cat]
        bw.put(code, length)
        bw.put(bits, cat)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]         # EOB
        bw.put(code, length)
    return dc


def _encode_prep(rgb: np.ndarray, quality: int, subsampling: str):
    """Shared front half of the baseline and progressive encoders:
    color transform, padding, optional chroma downsample, quantized
    zigzag block grids.  Returns (true_h, true_w, qy, qc, factors,
    grids, yf)."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    yf = 2 if subsampling == "420" else 1     # luma h=v sampling factor
    true_h, true_w = rgb.shape[0], rgb.shape[1]
    qy = _scale_q(K1_LUMA_Q, quality)
    qc = _scale_q(K2_CHROMA_Q, quality)
    ycc = _rgb_to_ycbcr(rgb)
    mcu = 8 * yf
    ph = -ycc.shape[0] % mcu
    pw = -ycc.shape[1] % mcu
    ycc = np.pad(ycc, ((0, ph), (0, pw), (0, 0)), mode="edge")
    planes = [ycc[..., 0]]
    for ci in (1, 2):
        c = ycc[..., ci]
        if yf == 2:                            # 2x2 box-average downsample
            c = c.reshape(c.shape[0] // 2, 2, c.shape[1] // 2, 2).mean((1, 3))
        planes.append(c)
    factors = [(yf, yf), (1, 1), (1, 1)]
    grids = [_quantized_blocks(planes[ci], qy if ci == 0 else qc)
             for ci in range(3)]
    return true_h, true_w, qy, qc, factors, grids, yf


def encode_jpeg(rgb: np.ndarray, quality: int = 85,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB → baseline JFIF bytes (Annex K Huffman
    tables, IJG quality scaling).

    ``subsampling``: "444" (no chroma downsample) or "420" (2x2 box
    average, interleaved 2x2-Y MCUs).  ``restart_interval``: emit
    RSTn markers every N MCUs (0 = none).
    """
    true_h, true_w, qy, qc, factors, grids, yf = _encode_prep(
        rgb, quality, subsampling)

    dc_y = _build_codes(*K3_DC_LUMA)
    ac_y = _build_codes(*K5_AC_LUMA)
    dc_c = _build_codes(*K4_DC_CHROMA)
    ac_c = _build_codes(*K6_AC_CHROMA)

    bw = _BitWriter()
    preds = [0, 0, 0]
    mcuy = grids[0].shape[0] // yf
    mcux = grids[0].shape[1] // yf
    nmcu, rst = 0, 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and nmcu and nmcu % restart_interval == 0:
                bw.flush()
                bw.out += struct.pack(">H", 0xFFD0 | rst)
                rst = (rst + 1) & 7
                preds = [0, 0, 0]
            for ci in range(3):
                ch, cv = factors[ci]
                for by in range(cv):
                    for bx in range(ch):
                        zz = grids[ci][my * cv + by, mx * ch + bx]
                        preds[ci] = _encode_block(
                            bw, zz, preds[ci],
                            dc_y if ci == 0 else dc_c,
                            ac_y if ci == 0 else ac_c)
            nmcu += 1
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dht(tc: int, th: int, table: tuple[list[int], list[int]]) -> bytes:
        bits, syms = table
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(syms)

    out = bytearray(b"\xff\xd8")                               # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qy[ZIGZAG].tolist()))   # DQT 0
    out += seg(0xFFDB, b"\x01" + bytes(qc[ZIGZAG].tolist()))   # DQT 1
    # SOF declares the TRUE size (per T.81 A.2.4 the decoder pads to
    # MCU multiples itself and crops on output), so round trips return
    # the exact input shape for any dimensions.
    sof = struct.pack(">BHHB", 8, true_h, true_w, 3)
    for cid, (chf, cvf), tq in ((1, factors[0], 0), (2, factors[1], 1),
                                (3, factors[2], 1)):
        sof += bytes([cid, (chf << 4) | cvf, tq])
    out += seg(0xFFC0, sof)                                    # SOF0
    out += seg(0xFFC4, dht(0, 0, K3_DC_LUMA))
    out += seg(0xFFC4, dht(1, 0, K5_AC_LUMA))
    out += seg(0xFFC4, dht(0, 1, K4_DC_CHROMA))
    out += seg(0xFFC4, dht(1, 1, K6_AC_CHROMA))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    sos = b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00"
    out += seg(0xFFDA, sos)                                    # SOS
    out += bw.out
    out += b"\xff\xd9"                                         # EOI
    return bytes(out)


# --- decoder ---------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 destuffing; stops at any
    non-stuffing marker and exposes it for restart handling."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        while self._n <= 24:
            if self.marker is not None or self.pos >= len(self.data):
                self._acc = (self._acc << 8) | 0xFF   # pad past end
                self._n += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = (self.data[self.pos + 1]
                       if self.pos + 1 < len(self.data) else 0xD9)
                if nxt == 0x00:
                    self.pos += 2
                else:                                  # real marker
                    self.marker = 0xFF00 | nxt
                    continue
            else:
                self.pos += 1
            self._acc = (self._acc << 8) | b
            self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> None:
        """Byte-align (drop pad bits) and consume an RSTn marker,
        whether the reader already stumbled onto it or it is still
        ahead at ``pos``."""
        self._acc = 0
        self._n = 0
        if self.marker is not None:
            if 0xFFD0 <= self.marker <= 0xFFD7:
                self.pos += 2
                self.marker = None
        elif (self.pos + 1 < len(self.data)
              and self.data[self.pos] == 0xFF
              and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 2

    def marker_start(self) -> int:
        """Byte offset of the next real marker at or after the
        current position — where the outer segment parser resumes
        after a progressive scan's entropy data ends."""
        if self.marker is not None:
            return self.pos
        p = self.pos
        while p + 1 < len(self.data):
            if self.data[p] == 0xFF and self.data[p + 1] != 0x00:
                return p
            p += 1
        return len(self.data)


_DEFAULT_HUFF_CACHE: dict[tuple[int, int], dict] = {}


def _default_huff(tc: int, th: int) -> dict[tuple[int, int], int]:
    """Annex K decode table for (class, slot) — used when a scan
    references a table no DHT defined (headerless MJPEG frames)."""
    key = (tc, th)
    if key not in _DEFAULT_HUFF_CACHE:
        table = {(0, 0): K3_DC_LUMA, (0, 1): K4_DC_CHROMA,
                 (1, 0): K5_AC_LUMA, (1, 1): K6_AC_CHROMA}[
                     (tc, min(th, 1))]
        _DEFAULT_HUFF_CACHE[key] = _build_decode_table(*table)
    return _DEFAULT_HUFF_CACHE[key]


def _receive_extend(r: _BitReader, cat: int) -> int:
    if cat == 0:
        return 0
    v = r.bits(cat)
    if v < (1 << (cat - 1)):
        v -= (1 << cat) - 1
    return v


def _decode_huff(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | r.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def decode_jpeg(payload: bytes) -> np.ndarray:
    """JFIF bytes → (h, w, 3) uint8 RGB (grayscale replicated).

    Supports baseline sequential (SOF0/1) with a single interleaved
    scan, AND progressive (SOF2, r10): spectral selection +
    successive approximation, interleaved or single-component DC
    scans, single-component AC scans with EOBn runs and refinement
    correction bits — coefficients accumulate across scans and are
    dequantized/IDCT'd once at EOI.  Sampling factors 1-2, restart
    intervals (baseline).  Arithmetic coding, hierarchical mode and
    12-bit precision raise NotImplementedError.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    comps: list[dict] = []
    restart = 0
    h = w = 0
    progressive = False
    saw_scan = False
    while pos < len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a
        # marker — skip them so FF FF DB parses as DQT, not marker 0xFF
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        marker = payload[pos + 1]
        pos += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:                       # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos)
        body = payload[pos + 2:pos + seglen]
        pos += seglen
        if marker == 0xDB:                       # DQT (may hold several)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise NotImplementedError(
                        "16-bit quantization tables not supported")
                zz = np.frombuffer(body, np.uint8, 64, p + 1).astype(np.int32)
                qtables[tq] = zz[_UNZIGZAG]
                p += 65
        elif marker == 0xC4:                     # DHT (may hold several)
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = list(body[p + 1:p + 17])
                n = sum(bits)
                syms = list(body[p + 17:p + 17 + n])
                htables[(tc, th)] = _build_decode_table(bits, syms)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):       # SOF0/1 base, SOF2 prog
            progressive = marker == 0xC2
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG not supported")
            for i in range(nc):
                cid, hv, tq = struct.unpack_from("BBB", body, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                              "tq": tq})
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} (arithmetic/hierarchical/"
                "lossless) not supported — sequential or progressive "
                "Huffman only")
        elif marker == 0xDD:                     # DRI
            (restart,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:                     # SOS → entropy data
            ns = body[0]
            if progressive:
                pos = _decode_progressive_scan(
                    payload, pos, body, comps, htables, h, w, restart)
                saw_scan = True
                continue
            if comps and ns < len(comps):
                # spec-valid but out of scope: decoding only the first
                # scan would silently return luma-as-grayscale for a
                # color image — refuse loudly instead
                raise NotImplementedError(
                    f"non-interleaved baseline JPEG ({ns}-component "
                    f"scan of a {len(comps)}-component image) not "
                    "supported — single interleaved scan only")
            by_id = {c["id"]: c for c in comps}
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                c = by_id[cs]
                # MJPEG quirk (OpenDML): frames may omit DHT entirely —
                # the Annex K tables are implicit.  Fall back to them
                # per-slot when a referenced table was never defined.
                c["dc"] = htables.get((0, tt >> 4)) or _default_huff(
                    0, tt >> 4)
                c["ac"] = htables.get((1, tt & 0x0F)) or _default_huff(
                    1, tt & 0x0F)
                scan.append(c)
            return _decode_scan(payload, pos, scan, qtables, h, w, restart)
    if progressive and saw_scan:
        return _assemble(comps, qtables, h, w)
    raise ValueError("JPEG missing SOS segment")


def _decode_scan(data: bytes, pos: int, comps: list[dict],
                 qtables: dict[int, np.ndarray], h: int, w: int,
                 restart: int) -> np.ndarray:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors above 2 not supported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]            # blocks per row
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int32)
        c["pred"] = 0

    r = _BitReader(data, pos)
    nmcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and nmcu and nmcu % restart == 0:
                r.align_restart()
                for c in comps:
                    c["pred"] = 0
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, np.int32)
                        cat = _decode_huff(r, c["dc"])
                        c["pred"] += _receive_extend(r, cat)
                        zz[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(r, c["ac"])
                            run, cat = rs >> 4, rs & 0x0F
                            if cat == 0:
                                if run == 15:   # ZRL
                                    k += 16
                                    continue
                                break           # EOB
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _receive_extend(r, cat)
                            k += 1
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        c["coef"][row * c["bw"] + col] = zz
            nmcu += 1

    return _assemble(comps, qtables, h, w)


def _assemble(comps: list[dict], qtables: dict[int, np.ndarray],
              h: int, w: int) -> np.ndarray:
    """Accumulated coefficient arrays → RGB pixels: dequantize, IDCT,
    reassemble planes, upsample subsampled components, crop."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c in comps:
        q = qtables[c["tq"]]
        deq = (c["coef"][:, _UNZIGZAG] * q.reshape(1, 64)).reshape(-1, 8, 8)
        spat = np.clip(np.round(_idct(deq.astype(np.float64)) + 128),
                       0, 255)
        plane = (spat.reshape(c["bh"], c["bw"], 8, 8)
                 .transpose(0, 2, 1, 3)
                 .reshape(c["bh"] * 8, c["bw"] * 8))
        # upsample to full MCU-padded resolution, then crop
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        g = planes[0].astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    ycc = np.stack(planes[:3], axis=-1)
    return _ycbcr_to_rgb(ycc)


# --- progressive mode (r10) -------------------------------------------------
# T.81 Annex G, Huffman procedures: spectral selection + successive
# approximation.  Coefficients accumulate across scans in the same
# MCU-padded per-component arrays the baseline decoder uses; the
# entropy procedures mirror the spec's G.1.2 (encode) / G.2 (decode)
# flowcharts — the same algorithms libjpeg implements in
# jcphuff.c/jdphuff.c, re-derived here from the public standard.


def _prog_block_grid(c: dict, h: int, w: int, hmax: int,
                     vmax: int) -> tuple[int, int]:
    """Non-interleaved data-unit grid for one component (T.81 A.2.2:
    based on the component's OWN sample dimensions, not MCU padding)."""
    cw = -(-(w * c["h"]) // hmax)
    ch = -(-(h * c["v"]) // vmax)
    return -(-ch // 8), -(-cw // 8)


def _decode_progressive_scan(data: bytes, pos: int, body: bytes,
                             comps: list[dict],
                             htables: dict[tuple[int, int], dict],
                             h: int, w: int, restart: int) -> int:
    """Decode one progressive SOS; returns the byte offset of the next
    marker.  Updates the components' coefficient arrays in place."""
    ns = body[0]
    by_id = {c["id"]: c for c in comps}
    scan = []
    tts = []
    for i in range(ns):
        cs, tt = body[1 + 2 * i], body[2 + 2 * i]
        scan.append(by_id[cs])
        tts.append(tt)
    ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
    a = body[3 + 2 * ns]
    ah, al = a >> 4, a & 0x0F

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise NotImplementedError("sampling factors above 2 not supported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        if "coef" not in c:
            c["bw"] = mcux * c["h"]
            c["bh"] = mcuy * c["v"]
            c["coef"] = np.zeros((c["bh"] * c["bw"], 64), np.int32)
            c["eobrun"] = 0

    r = _BitReader(data, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        for c, tt in zip(scan, tts):
            c["dc_t"] = htables.get((0, tt >> 4)) or _default_huff(
                0, tt >> 4)
            c["pred"] = 0

        def dc_unit(c: dict, bi: int) -> None:
            if ah == 0:                       # first scan: diffs << Al
                cat = _decode_huff(r, c["dc_t"])
                c["pred"] += _receive_extend(r, cat)
                c["coef"][bi, 0] = c["pred"] << al
            else:                             # refinement: one raw bit
                if r.bit():
                    c["coef"][bi, 0] |= 1 << al

        if ns > 1:                            # interleaved MCU order
            nmcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if restart and nmcu and nmcu % restart == 0:
                        r.align_restart()
                        for c in scan:
                            c["pred"] = 0
                    for c in scan:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                bi = ((my * c["v"] + by) * c["bw"]
                                      + mx * c["h"] + bx)
                                dc_unit(c, bi)
                    nmcu += 1
        else:                                 # single-component order
            c = scan[0]
            bh_s, bw_s = _prog_block_grid(c, h, w, hmax, vmax)
            ndu = 0
            for row in range(bh_s):
                for col in range(bw_s):
                    if restart and ndu and ndu % restart == 0:
                        r.align_restart()
                        c["pred"] = 0
                    dc_unit(c, row * c["bw"] + col)
                    ndu += 1
        return r.marker_start()

    # AC scan: single component, non-interleaved (T.81 G.1.1.1.1)
    if ns != 1:
        raise ValueError("progressive AC scan must be single-component")
    if not (1 <= ss <= se <= 63):
        raise ValueError(f"bad spectral band [{ss}, {se}]")
    c = scan[0]
    c["ac_t"] = htables.get((1, tts[0] & 0x0F)) or _default_huff(
        1, tts[0] & 0x0F)
    bh_s, bw_s = _prog_block_grid(c, h, w, hmax, vmax)
    coef = c["coef"]
    p1, m1 = 1 << al, -1 << al
    ndu = 0
    for row in range(bh_s):
        for col in range(bw_s):
            if restart and ndu and ndu % restart == 0:
                r.align_restart()
                c["eobrun"] = 0
            ndu += 1
            bi = row * c["bw"] + col
            zz = coef[bi]
            if ah == 0:                       # first scan for this band
                if c["eobrun"] > 0:
                    c["eobrun"] -= 1
                    continue
                k = ss
                while k <= se:
                    rs = _decode_huff(r, c["ac_t"])
                    rr, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if rr == 15:          # ZRL
                            k += 16
                            continue
                        eob = 1 << rr
                        if rr:
                            eob += r.bits(rr)
                        c["eobrun"] = eob - 1  # current block counted
                        break
                    k += rr
                    if k > se:
                        raise ValueError("AC run past band end")
                    zz[k] = _receive_extend(r, s) << al
                    k += 1
            else:                             # refinement (G.2, jdphuff)
                def correct(kk: int) -> None:
                    v = int(zz[kk])
                    if r.bit() and (v & p1) == 0:
                        zz[kk] = v + (p1 if v >= 0 else m1)

                k = ss
                if c["eobrun"] == 0:
                    while k <= se:
                        rs = _decode_huff(r, c["ac_t"])
                        rr, s = rs >> 4, rs & 0x0F
                        val = 0
                        if s == 0:
                            if rr != 15:      # EOBn: band tail below
                                eob = 1 << rr
                                if rr:
                                    eob += r.bits(rr)
                                c["eobrun"] = eob
                                break
                            # ZRL: 16 zero-history skips, no insert
                        else:
                            if s != 1:
                                raise ValueError(
                                    "refinement magnitude must be 1")
                            val = p1 if r.bit() else m1
                        while k <= se:
                            if zz[k] != 0:
                                correct(k)
                            else:
                                if rr == 0:
                                    break
                                rr -= 1
                            k += 1
                        if val and k <= se:
                            zz[k] = val
                        k += 1
                if c["eobrun"] > 0:
                    while k <= se:            # band tail: corrections
                        if zz[k] != 0:
                            correct(k)
                        k += 1
                    c["eobrun"] -= 1
    return r.marker_start()


def _enc_ac_first_block(bw: _BitWriter, zz: np.ndarray, ss: int,
                        se: int, al: int, codes: dict) -> None:
    """One block of an AC first scan (Ah=0): sequential-style run/size
    coding of the point-transformed band, EOB as a length-1 EOB run
    (the Annex K tables carry no longer EOBn symbols)."""
    vals = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        vals.append(-((-v) >> al) if v < 0 else v >> al)
    last_nz = -1
    for i, v in enumerate(vals):
        if v:
            last_nz = i
    r = 0
    for i in range(last_nz + 1):
        v = vals[i]
        if v == 0:
            r += 1
            continue
        while r > 15:
            c, ln = codes[0xF0]
            bw.put(c, ln)
            r -= 16
        cat, bits = _magnitude(v)
        c, ln = codes[(r << 4) | cat]
        bw.put(c, ln)
        bw.put(bits, cat)
        r = 0
    if last_nz < len(vals) - 1:
        c, ln = codes[0x00]
        bw.put(c, ln)


def _enc_ac_refine_block(bw: _BitWriter, zz: np.ndarray, ss: int,
                         se: int, al: int, codes: dict) -> None:
    """One block of an AC refinement scan (Ah=Al+1): newly-significant
    coefficients as (run, 1) symbols with a sign bit, correction bits
    for already-significant ones buffered and emitted with the next
    symbol (T.81 G.1.2.3 / libjpeg's BR-buffer discipline — in
    particular ZRLs flush BEFORE a history coefficient buffers its
    bit, or the decoder's advance loop desynchronizes)."""
    t = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    last_new = -1
    for i, v in enumerate(t):
        if v == 1:
            last_new = i
    br: list[int] = []
    r = 0
    for i in range(last_new + 1):
        v = t[i]
        if v == 0:
            r += 1
            continue
        while r > 15:
            c, ln = codes[0xF0]
            bw.put(c, ln)
            for b in br:
                bw.put(b, 1)
            br = []
            r -= 16
        if v > 1:
            br.append(v & 1)
            continue
        c, ln = codes[(r << 4) | 1]
        bw.put(c, ln)
        bw.put(1 if int(zz[ss + i]) > 0 else 0, 1)
        for b in br:
            bw.put(b, 1)
        br = []
        r = 0
    tail = [t[i] & 1 for i in range(last_new + 1, len(t)) if t[i] > 1]
    if last_new + 1 < len(t):
        c, ln = codes[0x00]          # EOB run of 1 covers the tail
        bw.put(c, ln)
        for b in br:
            bw.put(b, 1)
        for b in tail:
            bw.put(b, 1)


def encode_jpeg_progressive(rgb: np.ndarray, quality: int = 85,
                            subsampling: str = "444") -> bytes:
    """(h, w, 3) uint8 RGB → PROGRESSIVE JFIF bytes (SOF2) with the
    standard spectral-selection + successive-approximation scan
    script (the libjpeg default shape): DC first at Al=1 then a DC
    refinement; luma AC split into a 1-5 band and a 6-63 band at Al=2
    with two refinement passes; chroma AC full-band at Al=1 with one
    refinement.  The quantized coefficients are IDENTICAL to
    ``encode_jpeg`` at the same quality, so both encodings decode to
    byte-identical pixels — the roundtrip test's anchor.  Restart
    intervals are not emitted in progressive mode (decode supports
    them)."""
    true_h, true_w, qy, qc, factors, grids, yf = _encode_prep(
        rgb, quality, subsampling)
    dc_codes = [_build_codes(*K3_DC_LUMA), _build_codes(*K4_DC_CHROMA),
                _build_codes(*K4_DC_CHROMA)]
    ac_codes = [_build_codes(*K5_AC_LUMA), _build_codes(*K6_AC_CHROMA),
                _build_codes(*K6_AC_CHROMA)]
    mcuy = grids[0].shape[0] // yf
    mcux = grids[0].shape[1] // yf
    hmax = vmax = yf

    def dc_scan(ah: int, al: int) -> bytes:
        bw = _BitWriter()
        preds = [0, 0, 0]
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(3):
                    ch, cv = factors[ci]
                    for by in range(cv):
                        for bx in range(ch):
                            dc = int(grids[ci][my * cv + by,
                                               mx * ch + bx, 0])
                            if ah == 0:
                                v = dc >> al
                                cat, bits = _magnitude(v - preds[ci])
                                c, ln = dc_codes[ci][cat]
                                bw.put(c, ln)
                                if cat:
                                    bw.put(bits, cat)
                                preds[ci] = v
                            else:
                                bw.put((dc >> al) & 1, 1)
        bw.flush()
        return bytes(bw.out)

    def ac_scan(ci: int, ss: int, se: int, ah: int, al: int) -> bytes:
        bw = _BitWriter()
        ch, cv = factors[ci]
        grid = grids[ci]
        comp = {"h": ch, "v": cv}
        bh_s, bw_s = _prog_block_grid(comp, true_h, true_w, hmax, vmax)
        for row in range(bh_s):
            for col in range(bw_s):
                zz = grid[row, col]
                if ah == 0:
                    _enc_ac_first_block(bw, zz, ss, se, al,
                                        ac_codes[ci])
                else:
                    _enc_ac_refine_block(bw, zz, ss, se, al,
                                         ac_codes[ci])
        bw.flush()
        return bytes(bw.out)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dht(tc: int, th: int, table: tuple[list[int], list[int]]) -> bytes:
        bits, syms = table
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(syms)

    def sos(comp_specs: list[tuple[int, int]], ss: int, se: int,
            ah: int, al: int) -> bytes:
        body = bytes([len(comp_specs)])
        for cid, tt in comp_specs:
            body += bytes([cid, tt])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xFFDA, body)

    out = bytearray(b"\xff\xd8")                               # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(qy[ZIGZAG].tolist()))
    out += seg(0xFFDB, b"\x01" + bytes(qc[ZIGZAG].tolist()))
    sof = struct.pack(">BHHB", 8, true_h, true_w, 3)
    for cid, (chf, cvf), tq in ((1, factors[0], 0), (2, factors[1], 1),
                                (3, factors[2], 1)):
        sof += bytes([cid, (chf << 4) | cvf, tq])
    out += seg(0xFFC2, sof)                                    # SOF2
    out += seg(0xFFC4, dht(0, 0, K3_DC_LUMA))
    out += seg(0xFFC4, dht(1, 0, K5_AC_LUMA))
    out += seg(0xFFC4, dht(0, 1, K4_DC_CHROMA))
    out += seg(0xFFC4, dht(1, 1, K6_AC_CHROMA))

    all_dc = [(1, 0x00), (2, 0x10), (3, 0x10)]
    # scan script: (sos header, entropy bytes)
    out += sos(all_dc, 0, 0, 0, 1) + dc_scan(0, 1)
    out += sos([(1, 0x00)], 1, 5, 0, 2) + ac_scan(0, 1, 5, 0, 2)
    out += sos([(2, 0x01)], 1, 63, 0, 1) + ac_scan(1, 1, 63, 0, 1)
    out += sos([(3, 0x01)], 1, 63, 0, 1) + ac_scan(2, 1, 63, 0, 1)
    out += sos([(1, 0x00)], 6, 63, 0, 2) + ac_scan(0, 6, 63, 0, 2)
    out += sos([(1, 0x00)], 1, 63, 2, 1) + ac_scan(0, 1, 63, 2, 1)
    out += sos(all_dc, 0, 0, 1, 0) + dc_scan(1, 0)
    out += sos([(1, 0x00)], 1, 63, 1, 0) + ac_scan(0, 1, 63, 1, 0)
    out += sos([(2, 0x01)], 1, 63, 1, 0) + ac_scan(1, 1, 63, 1, 0)
    out += sos([(3, 0x01)], 1, 63, 1, 0) + ac_scan(2, 1, 63, 1, 0)
    out += b"\xff\xd9"                                         # EOI
    return bytes(out)
