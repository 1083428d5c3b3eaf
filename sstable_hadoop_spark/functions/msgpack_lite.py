"""Minimal pure-Python MessagePack encoder (encode-only, plus a decoder
for round-trip tests).  The container has no ``msgpack`` module, and the
S10 compatibility sink only needs to pack the reference's ``MsgPackRow``
shape — nested arrays of (bytes, ints) — so a small deterministic subset
of the spec suffices:

    MsgPackRow  := [key: bin, cols: [[key: bin, value: bin,
                    ts: int, expiresMillis: int, ttlSecs: int], ...]]

matching the ``@Message``-annotated field order of the reference
(mapred/SSTableData.scala:64-77; the java msgpack library serializes
annotated classes as field-order arrays).  Uses the current-spec bin
family for byte arrays.
"""

from __future__ import annotations

import struct


def _pack_int(n: int, out: bytearray) -> None:
    if 0 <= n <= 0x7F:
        out.append(n)
    elif -32 <= n < 0:
        out.append(0x100 + n)
    elif 0 <= n <= 0xFF:
        out += b"\xcc" + struct.pack(">B", n)
    elif 0 <= n <= 0xFFFF:
        out += b"\xcd" + struct.pack(">H", n)
    elif 0 <= n <= 0xFFFFFFFF:
        out += b"\xce" + struct.pack(">I", n)
    elif n >= 0:
        out += b"\xcf" + struct.pack(">Q", n)
    elif n >= -(1 << 7):
        out += b"\xd0" + struct.pack(">b", n)
    elif n >= -(1 << 15):
        out += b"\xd1" + struct.pack(">h", n)
    elif n >= -(1 << 31):
        out += b"\xd2" + struct.pack(">i", n)
    else:
        out += b"\xd3" + struct.pack(">q", n)


def _pack_bin(b: bytes, out: bytearray) -> None:
    n = len(b)
    if n <= 0xFF:
        out += b"\xc4" + struct.pack(">B", n)
    elif n <= 0xFFFF:
        out += b"\xc5" + struct.pack(">H", n)
    else:
        out += b"\xc6" + struct.pack(">I", n)
    out += b


def _pack_array_header(n: int, out: bytearray) -> None:
    if n <= 0xF:
        out.append(0x90 | n)
    elif n <= 0xFFFF:
        out += b"\xdc" + struct.pack(">H", n)
    else:
        out += b"\xdd" + struct.pack(">I", n)


def _pack(obj, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif isinstance(obj, bool):
        out.append(0xC3 if obj else 0xC2)
    elif isinstance(obj, int):
        _pack_int(obj, out)
    elif isinstance(obj, (bytes, bytearray)):
        _pack_bin(bytes(obj), out)
    elif isinstance(obj, str):
        _pack_bin(obj.encode("utf-8"), out)
    elif isinstance(obj, (list, tuple)):
        _pack_array_header(len(obj), out)
        for item in obj:
            _pack(item, out)
    else:
        raise TypeError(f"cannot msgpack {type(obj)}")


def packb(obj) -> bytes:
    out = bytearray()
    _pack(obj, out)
    return bytes(out)


def unpackb(buf: bytes):
    obj, rest = _unpack(memoryview(buf))
    if len(rest):
        raise ValueError("trailing bytes")
    return obj


def _unpack(mv):
    b = mv[0]
    mv = mv[1:]
    if b <= 0x7F:
        return b, mv
    if b >= 0xE0:
        return b - 0x100, mv
    if 0x90 <= b <= 0x9F:
        return _unpack_array(b & 0xF, mv)
    if b == 0xC0:
        return None, mv
    if b == 0xC2:
        return False, mv
    if b == 0xC3:
        return True, mv
    if b == 0xC4:
        n = mv[0]; return bytes(mv[1:1 + n]), mv[1 + n:]
    if b == 0xC5:
        n = struct.unpack(">H", mv[:2])[0]; return bytes(mv[2:2 + n]), mv[2 + n:]
    if b == 0xC6:
        n = struct.unpack(">I", mv[:4])[0]; return bytes(mv[4:4 + n]), mv[4 + n:]
    if b == 0xCC:
        return mv[0], mv[1:]
    if b == 0xCD:
        return struct.unpack(">H", mv[:2])[0], mv[2:]
    if b == 0xCE:
        return struct.unpack(">I", mv[:4])[0], mv[4:]
    if b == 0xCF:
        return struct.unpack(">Q", mv[:8])[0], mv[8:]
    if b == 0xD0:
        return struct.unpack(">b", mv[:1])[0], mv[1:]
    if b == 0xD1:
        return struct.unpack(">h", mv[:2])[0], mv[2:]
    if b == 0xD2:
        return struct.unpack(">i", mv[:4])[0], mv[4:]
    if b == 0xD3:
        return struct.unpack(">q", mv[:8])[0], mv[8:]
    if b == 0xDC:
        return _unpack_array(struct.unpack(">H", mv[:2])[0], mv[2:])
    if b == 0xDD:
        return _unpack_array(struct.unpack(">I", mv[:4])[0], mv[4:])
    raise ValueError(f"unsupported msgpack byte {b:#x}")


def _unpack_array(n, mv):
    items = []
    for _ in range(n):
        obj, mv = _unpack(mv)
        items.append(obj)
    return items, mv
