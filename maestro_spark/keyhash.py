"""Driver-side key→bucket arithmetic: pure-Python XXH64.

The lake's layout hash is ``pmod(xxhash64(conv_id), n_buckets)``
(lake.bucket_expr), which Spark evaluates JVM-side. A *point lookup*
("fetch conversation X") must compute the same bucket on the driver
WITHOUT launching a Spark job — at serving time the whole win is that no
cluster work happens until the one-bucket scan. This module is a pure
Python implementation of XXH64 (Yann Collet's public-domain xxHash, the
same published algorithm Spark's ``XxHash64`` expression implements) over
the key's UTF-8 bytes with Spark's string seed (42).

Parity with ``F.xxhash64`` is property-tested in tests/test_lookup.py over
random unicode strings — if Spark ever changed its hash, the test (not a
silently wrong bucket) catches it.
"""

from __future__ import annotations

_MASK = (1 << 64) - 1
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _MASK
    return (_rotl(acc, 31) * _P1) & _MASK


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _MASK


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64 of ``data`` (unsigned 64-bit). Default seed 42 = Spark's."""
    n, i = len(data), 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK
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


def xxh64_signed(data: bytes, seed: int = 42) -> int:
    """XXH64 reinterpreted as Spark's signed LongType."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def bucket_of(conv_id: str, n_buckets: int) -> int:
    """The bucket ``lake.bucket_expr`` assigns this key — computed on the
    driver. Python's ``%`` on a positive modulus IS pmod (non-negative for
    negative hashes), matching Spark's ``pmod``."""
    return xxh64_signed(conv_id.encode("utf-8")) % n_buckets
