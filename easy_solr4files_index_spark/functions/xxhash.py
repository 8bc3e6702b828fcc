"""Pure-Python XXH64 matching Spark's ``xxhash64`` expression.

Spark partitions the physical index by ``pmod(xxhash64(term), T)``
(postings.py). The query planner needs the same bucket number for a
handful of query terms; launching a Spark job (createDataFrame + collect)
to hash <10 strings costs a full scheduler round-trip per query. XXH64 is
a public, stable algorithm (and Spark's expression is specified to match
it for string input = XXH64 over the UTF-8 bytes, default seed 42), so we
compute it driver-side. Parity is pinned by tests/test_xxhash.py against
the live Spark expression.
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


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxhash64(data: bytes | str, seed: int = 42) -> int:
    """XXH64 as a SIGNED 64-bit int (Spark's LongType semantics)."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    n = len(data)
    seed &= _M

    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed
        v4 = (seed - _P1) & _M
        i = 0
        for i in range(0, n - 31, 32):
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
        i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        i = 0
        h = (seed + _P5) & _M

    h = (h + n) & _M

    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1

    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def term_bucket(term: str, buckets: int) -> int:
    """Driver-side twin of ``pmod(xxhash64(term), buckets)`` (postings._tbucket)."""
    return xxhash64(term) % buckets
