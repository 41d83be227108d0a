"""Driver-side XXH64 — must equal Spark's ``F.xxhash64`` bit-for-bit.

Implemented from the public xxHash specification
(https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md); Spark's
``org.apache.spark.sql.catalyst.expressions.XXH64`` follows the same spec
(string columns hash their UTF-8 bytes with seed 42).  Equality against
``F.xxhash64`` is asserted in tests/test_index_format.py over empty /
short / long / multi-stripe / unicode inputs, so the bucket routing the
query side does driver-side (``_py_bucket``) can never drift from the
bucket the build side computed JVM-side.

Used to avoid a 1-row Spark job per cold query term (VERDICT r01 item 8).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def xxhash64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` as a SIGNED 64-bit int (Spark long semantics)."""
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while off + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[off : off + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[off + 8 : off + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[off + 16 : off + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[off + 24 : off + 32], "little"))
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while off + 8 <= n:
        k1 = _round(0, int.from_bytes(data[off : off + 8], "little"))
        h = (_rotl(h ^ k1, 27) * _P1 + _P4) & _M
        off += 8
    if off + 4 <= n:
        h = (
            _rotl(h ^ ((int.from_bytes(data[off : off + 4], "little") * _P1) & _M), 23)
            * _P2
            + _P3
        ) & _M
        off += 4
    while off < n:
        h = (_rotl(h ^ ((data[off] * _P5) & _M), 11) * _P1) & _M
        off += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_str(s: str, seed: int = 42) -> int:
    """``F.xxhash64(string_col)`` twin: XXH64 over the UTF-8 bytes."""
    return xxhash64(s.encode("utf-8"), seed)
