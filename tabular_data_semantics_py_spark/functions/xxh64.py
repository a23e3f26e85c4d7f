"""Pure-Python XXH64 replicating Spark's ``F.xxhash64`` exactly.

Spark's XxHash64 expression (sql/catalyst XXH64.java) chains its
arguments: the accumulator starts at the seed (42), and each argument
re-seeds the next hash — strings hash their UTF-8 bytes with the
standard XXH64 byte algorithm, int/long arguments use the 4/8-byte
finalization-only variants. This module is the *independent oracle
implementation* (used to build DuckDB VALUES CTEs for queries whose
Spark side uses xxhash64); equality with the JVM implementation is
asserted in tests/test_xxh64.py over fixture and random inputs.
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


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Standard XXH64 over a byte string."""
    seed &= _M
    n = len(data)
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        i = 0
        while i <= n - 32:
            for off, v in ((0, 1), (8, 2), (16, 3), (24, 4)):
                k = int.from_bytes(data[i + off:i + off + 8], "little")
                if v == 1:
                    v1 = (_rotl((v1 + k * _P2) & _M, 31) * _P1) & _M
                elif v == 2:
                    v2 = (_rotl((v2 + k * _P2) & _M, 31) * _P1) & _M
                elif v == 3:
                    v3 = (_rotl((v3 + k * _P2) & _M, 31) * _P1) & _M
                else:
                    v4 = (_rotl((v4 + k * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = ((h * _P1) + _P4) & _M
    else:
        h = (seed + _P5) & _M
        i = 0
    h = (h + n) & _M
    while i <= n - 8:
        k = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = ((_rotl(h, 27) * _P1) + _P4) & _M
        i += 8
    if i <= n - 4:
        k = int.from_bytes(data[i:i + 4], "little")
        h ^= (k * _P1) & _M
        h = ((_rotl(h, 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def xxh64_int(value: int, seed: int) -> int:
    """Spark XXH64.hashInt: 4-byte finalization-only variant."""
    h = (seed + _P5 + 4) & _M
    h ^= ((value & 0xFFFFFFFF) * _P1) & _M
    h = ((_rotl(h, 23) * _P2) + _P3) & _M
    return _fmix(h)


def xxh64_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong: 8-byte finalization-only variant."""
    h = (seed + _P5 + 8) & _M
    h ^= (_rotl(((value & _M) * _P2) & _M, 31) * _P1) & _M
    h = ((_rotl(h, 27) * _P1) + _P4) & _M
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64(*args, seed: int = 42) -> int:
    """``F.xxhash64(*args)`` for str / int32 / int64 Python values —
    the accumulator chains through the arguments like Spark's
    XxHash64.computeHash. Ints tagged as (value, 'int') hash with the
    4-byte variant, plain Python ints with the 8-byte (LongType)
    variant, matching Spark's literal typing."""
    h = seed
    for a in args:
        if isinstance(a, tuple) and a[1] == "int":
            h = xxh64_int(a[0], h)
        elif isinstance(a, str):
            h = xxh64_bytes(a.encode("utf-8"), h)
        elif isinstance(a, bytes):
            h = xxh64_bytes(a, h)
        elif isinstance(a, int):
            h = xxh64_long(a, h)
        else:  # pragma: no cover
            raise TypeError(f"unsupported arg type: {type(a)}")
    return _signed(h)
