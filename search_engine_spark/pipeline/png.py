"""Minimal PNG codec from the public specification (RFC 2083 / W3C PNG),
stdlib only (struct + zlib) — gives the multimodal pipeline a REAL image
decode path in a container without PIL.

Supported: 8-bit depth, grayscale (color type 0) and RGB (color type 2),
non-interlaced. The encoder emits filter 0 (None) rows; the decoder
implements all five standard filters (None/Sub/Up/Average/Paeth) so
externally produced baseline PNGs of these color types decode too.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (H, W) grayscale or (H, W, 3) RGB -> PNG bytes."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        ctype = 0
    elif arr.ndim == 3 and arr.shape[2] == 3:
        ctype = 2
    else:
        raise ValueError("expected (H,W) grayscale or (H,W,3) RGB uint8")
    h, w = arr.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (H, W) or (H, W, 3)."""
    data = bytes(data)
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = b""
    while pos + 8 <= len(data):
        ln, typ = struct.unpack(">I4s", data[pos : pos + 8])
        pos += 8
        chunk = data[pos : pos + ln]
        pos += ln + 4  # skip CRC
        if typ == b"IHDR":
            ihdr = chunk
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8 or interlace != 0 or ctype not in (0, 2):
        raise ValueError(f"unsupported PNG (depth={depth} ctype={ctype} interlace={interlace})")
    ch = 1 if ctype == 0 else 3
    stride = w * ch
    raw = zlib.decompress(idat)
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    pos2 = 0
    for y in range(h):
        f = raw[pos2]
        pos2 += 1
        line = np.frombuffer(raw[pos2 : pos2 + stride], np.uint8).astype(np.int64)
        pos2 += stride
        if f == 0:
            rec = line
        elif f == 2:  # Up
            rec = (line + prev) & 0xFF
        elif f in (1, 3, 4):  # Sub / Average / Paeth: left-recursive
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - ch] if x >= ch else 0
                b = prev[x]
                if f == 1:
                    rec[x] = (line[x] + a) & 0xFF
                elif f == 3:
                    rec[x] = (line[x] + (a + b) // 2) & 0xFF
                else:
                    c = prev[x - ch] if x >= ch else 0
                    rec[x] = (line[x] + _paeth(int(a), int(b), int(c))) & 0xFF
        else:
            raise ValueError(f"bad filter byte {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, 3)
