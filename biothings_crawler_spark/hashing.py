"""Pure-Python XXH64 matching Spark's ``xxhash64`` (seed 42).

Spark's ``F.xxhash64(col)`` hashes the UTF-8 bytes of a string column /
the 8-byte little-endian encoding of a long column with XXH64, seed 42,
and reinterprets the unsigned result as a signed int64. The oracle side
(tests, BFS simulator, bloom goldens) needs the identical value without
a JVM, so this module implements XXH64 from the public specification
(Yann Collet, github.com/Cyan4973/xxHash). Verified against Spark in
tests/test_hashing.py.

Engine hot paths never call this — they use ``F.xxhash64`` (JVM,
whole-stage codegen); numpy-vectorized avalanche mixing is used for
bloom bit positions (see operators/seen.py).
"""

from __future__ import annotations

import struct

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _MASK
    acc = _rotl(acc, 31)
    return (acc * _P1) & _MASK


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _MASK


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of *data*; returns the unsigned 64-bit digest."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            (a, b, c, d) = struct.unpack_from("<QQQQ", data, i)
            v1, v2, v3, v4 = _round(v1, a), _round(v2, b), _round(v3, c), _round(v4, d)
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, k)
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def to_signed64(u: int) -> int:
    """Reinterpret an unsigned 64-bit value as Spark's signed long."""
    return u - (1 << 64) if u >= (1 << 63) else u


def xxhash64_str(s: str, seed: int = SPARK_SEED) -> int:
    """== Spark ``F.xxhash64(string_col)`` (signed)."""
    return to_signed64(xxh64(s.encode("utf-8"), seed))


def xxhash64_long(v: int, seed: int = SPARK_SEED) -> int:
    """== Spark ``F.xxhash64(long_col)`` (signed): LE 8-byte encoding."""
    return to_signed64(xxh64(struct.pack("<q", v), seed))
