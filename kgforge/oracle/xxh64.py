"""Pure-Python twin of Spark's ``xxhash64`` expression (XXH64, seed 42).

DuckDB cannot evaluate Spark's ``xxhash64``, so oracles for hash-keyed
operators (the fixed-width minhash variant in operators/dedup.py) read a
committed fixture of hash values instead — and that fixture must come
from an implementation INDEPENDENT of the engine under test.  This
module is that implementation: XXH64 from the public xxHash
specification (https://github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md),
plus the three entry points Spark's ``XxHash64`` expression composes
(`org.apache.spark.sql.catalyst.expressions.XXH64`):

- ``hash_bytes``  — XXH64 over a byte string (UTF8 bytes of a string
  column), little-endian word reads, the spec's stripe/merge rounds;
- ``hash_long`` / ``hash_int`` — the fixed-width fast paths (one round
  over the 8- or zero-extended 4-byte value);
- ``spark_xxhash64`` — the multi-argument chaining: hash = 42, then for
  each argument hash = H(value, seed=hash), left to right.  Integer
  Python values are hashed as Spark LongType by default (pass
  ``("int", v)`` for IntegerType literals).

tests/test_xxh64.py differentials every path against the live Spark
expression on randomized inputs, so a divergence (or a Spark upgrade
that changes hashing) fails the suite rather than silently skewing the
fixture oracles.
"""

from __future__ import annotations

_M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & _M
    h ^= h >> 29
    h = (h * P3) & _M
    h ^= h >> 32
    return h


def hash_long(v: int, seed: int) -> int:
    """Spark XXH64.hashLong: one stripe round over the 8-byte value."""
    v &= _M
    h = (seed + P5 + 8) & _M
    h ^= (_rotl((v * P2) & _M, 31) * P1) & _M
    h = (_rotl(h, 27) * P1 + P4) & _M
    return _fmix(h)


def hash_int(v: int, seed: int) -> int:
    """Spark XXH64.hashInt: the 4-byte value zero-extended."""
    h = (seed + P5 + 4) & _M
    h ^= ((v & 0xFFFFFFFF) * P1) & _M
    h = (_rotl(h, 23) * P2 + P3) & _M
    return _fmix(h)


def hash_bytes(b: bytes, seed: int) -> int:
    """XXH64 of a byte string (Spark hashes string columns over their
    UTF8 bytes with this)."""
    n = len(b)
    o = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & _M
        v2 = (seed + P2) & _M
        v3 = seed & _M
        v4 = (seed - P1) & _M
        while o + 32 <= n:
            for i, v in enumerate((v1, v2, v3, v4)):
                k = int.from_bytes(b[o + 8 * i : o + 8 * i + 8], "little")
                v = (v + k * P2) & _M
                v = (_rotl(v, 31) * P1) & _M
                if i == 0:
                    v1 = v
                elif i == 1:
                    v2 = v
                elif i == 2:
                    v3 = v
                else:
                    v4 = v
            o += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            v = (_rotl((v * P2) & _M, 31) * P1) & _M
            h = ((h ^ v) * P1 + P4) & _M
    else:
        h = (seed + P5) & _M
    h = (h + n) & _M
    while o + 8 <= n:
        k = int.from_bytes(b[o : o + 8], "little")
        h ^= (_rotl((k * P2) & _M, 31) * P1) & _M
        h = (_rotl(h, 27) * P1 + P4) & _M
        o += 8
    if o + 4 <= n:
        k = int.from_bytes(b[o : o + 4], "little")
        h ^= (k * P1) & _M
        h = (_rotl(h, 23) * P2 + P3) & _M
        o += 4
    while o < n:
        h ^= (b[o] * P5) & _M
        h = (_rotl(h, 11) * P1) & _M
        o += 1
    return _fmix(h)


def _signed(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64(*values) -> int:
    """Twin of the multi-argument ``F.xxhash64(...)``: seed 42, each
    argument folds the running hash as its seed.  str -> UTF8 bytes;
    int -> LongType; ``("int", v)`` -> IntegerType.  Returns the SIGNED
    64-bit value Spark's LongType column carries."""
    h = 42
    for v in values:
        if isinstance(v, str):
            h = hash_bytes(v.encode("utf-8"), h)
        elif isinstance(v, tuple) and v[0] == "int":
            h = hash_int(v[1], h)
        elif isinstance(v, int):
            h = hash_long(v, h)
        else:  # pragma: no cover - guard against silent wrong-type hashing
            raise TypeError(f"unsupported xxhash64 twin argument: {type(v)}")
    return _signed(h)
