"""Pure-Python xxHash64 — test/oracle-side twin of Spark's ``F.xxhash64``.

Production code always hashes JVM-side with ``F.xxhash64(col)`` (whole-stage
codegen, zero Python). The mini-oracle (tests/oracle_crawler.py) needs the
*same* 64-bit values to compare seen-set membership, so this module
implements the xxHash64 algorithm (public spec, Yann Collet) plus Spark's
composition rule for hashing a string column: xxhash64 over the UTF-8 bytes
with Spark's fixed seed 42. Equality with the JVM implementation is asserted
in tests/test_canon.py.

Never call this in a hot path — it exists for small-scale verification only.
"""

from __future__ import annotations

MASK64 = 0xFFFFFFFFFFFFFFFF
PRIME1 = 0x9E3779B185EBCA87
PRIME2 = 0xC2B2AE3D27D4EB4F
PRIME3 = 0x165667B19E3779F9
PRIME4 = 0x85EBCA77C2B2AE63
PRIME5 = 0x27D4EB2F165667C5

SPARK_SEED = 42  # org.apache.spark.sql.catalyst.expressions.XxHash64 default


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * PRIME2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * PRIME1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    val = _round(0, val)
    acc ^= val
    return (acc * PRIME1 + PRIME4) & MASK64


def xxhash64(data: bytes, seed: int = SPARK_SEED) -> int:
    """xxHash64 of ``data`` → *signed* 64-bit int (Spark LongType semantics)."""
    n = len(data)
    if n >= 32:
        v1 = (seed + PRIME1 + PRIME2) & MASK64
        v2 = (seed + PRIME2) & MASK64
        v3 = seed
        v4 = (seed - PRIME1) & MASK64
        i = 0
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + PRIME5) & MASK64
        i = 0
    h = (h + n) & MASK64
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * PRIME1 + PRIME4) & MASK64
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * PRIME1) & MASK64
        h = (_rotl(h, 23) * PRIME2 + PRIME3) & MASK64
        i += 4
    while i < n:
        h ^= (data[i] * PRIME5) & MASK64
        h = (_rotl(h, 11) * PRIME1) & MASK64
        i += 1
    h ^= h >> 33
    h = (h * PRIME2) & MASK64
    h ^= h >> 29
    h = (h * PRIME3) & MASK64
    h ^= h >> 32
    # to signed
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64_str(s: str, seed: int = SPARK_SEED) -> int:
    """Spark's ``xxhash64(string_col)`` — xxHash64 over UTF-8 bytes, seed 42."""
    return xxhash64(s.encode("utf-8"), seed)
