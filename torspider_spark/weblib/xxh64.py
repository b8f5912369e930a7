"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` — oracle/simulator use.

Spark's XxHash64 expression (public Apache Spark source,
sql/catalyst XxHash64Function) applies the standard XXH64 algorithm per
column with seed chaining: column i is hashed with the running hash of
columns 0..i-1 as its seed (initial seed 42). LongType values hash as their
8 little-endian bytes; StringType values hash as their UTF-8 bytes. This
module reimplements exactly that so the crawl oracle can compute expected
minhash/LSH outputs without Spark (non-circular correctness check).

Standard XXH64 reference: the public xxHash specification (Yann Collet).
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1
PRIME1 = 0x9E3779B185EBCA87
PRIME2 = 0xC2B2AE3D27D4EB4F
PRIME3 = 0x165667B19E3779F9
PRIME4 = 0x85EBCA77C2B2AE63
PRIME5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * PRIME2) & MASK64
    return (_rotl(acc, 31) * PRIME1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * PRIME1 + PRIME4) & MASK64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * PRIME2) & MASK64
    h ^= h >> 29
    h = (h * PRIME3) & MASK64
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """Standard XXH64 of ``data`` with ``seed`` (unsigned 64-bit result)."""
    seed &= MASK64
    n = len(data)
    if n >= 32:
        v1 = (seed + PRIME1 + PRIME2) & MASK64
        v2 = (seed + PRIME2) & MASK64
        v3 = seed
        v4 = (seed - PRIME1) & MASK64
        i = 0
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + PRIME5) & MASK64
        i = 0
    h = (h + n) & MASK64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * PRIME1 + PRIME4) & MASK64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * PRIME1) & MASK64
        h = (_rotl(h, 23) * PRIME2 + PRIME3) & MASK64
        i += 4
    while i < n:
        h ^= (data[i] * PRIME5) & MASK64
        h = (_rotl(h, 11) * PRIME1) & MASK64
        i += 1
    return _fmix(h)


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def xxh64_long(value: int, seed: int) -> int:
    """XXH64 of one 64-bit integer, as Spark hashes LongType columns
    (the value's 8 little-endian two's-complement bytes)."""
    return xxh64((value & MASK64).to_bytes(8, "little"), seed)


def xxh64_int(value: int, seed: int) -> int:
    """Spark's hashInt — IntegerType columns hash via the 4-byte tail path
    (zero-extended), NOT as promoted longs (verified against F.xxhash64)."""
    h = ((seed & MASK64) + PRIME5 + 4) & MASK64
    h ^= ((value & 0xFFFFFFFF) * PRIME1) & MASK64
    h = (_rotl(h, 23) * PRIME2 + PRIME3) & MASK64
    return _fmix(h)


class I32(int):
    """Marker: hash this value as a Spark IntegerType column."""


def spark_xxhash64(*cols: int | str | None, seed: int = 42) -> int:
    """``F.xxhash64(*cols)`` — signed 64-bit result, seed-chained per column;
    NULL columns are skipped (leave the running hash unchanged). Plain
    Python ints hash as LongType; wrap in ``I32`` for IntegerType columns
    (e.g. un-cast ``F.lit(i)``)."""
    h = seed & MASK64
    for col in cols:
        if col is None:
            continue
        if isinstance(col, str):
            h = xxh64(col.encode("utf-8"), h)
        elif isinstance(col, I32):
            h = xxh64_int(col, h)
        else:
            h = xxh64_long(col, h)
    return _to_signed(h)
