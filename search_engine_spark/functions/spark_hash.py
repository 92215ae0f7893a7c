"""Pure-Python Murmur3 x86-32 matching Spark's `hash()` for strings.

Spark's `F.hash(col)` on a StringType is Murmur3_x86_32 over the UTF-8
bytes with seed 42 (org.apache.spark.unsafe.hash.Murmur3_x86_32 /
catalyst Murmur3Hash). Reimplemented here from the public MurmurHash3
algorithm so the query engine can compute a term's bucket
(`pmod(hash(term), n_buckets)`) driver-side WITHOUT a Spark job —
equality with the JVM is asserted in tests/test_spark_hash.py.

Note Spark's tail handling: unlike canonical murmur3, Spark processes the
trailing 1-3 bytes one at a time, each as a full int (sign-extended) mixed
with k1 rotation — this matches Murmur3_x86_32.hashUnsafeBytes for the
"bytesHash" variant used by catalyst HashExpression on UTF8String: it
actually iterates 4-byte words and then SINGLE bytes through mixK1/mixH1.
"""

from __future__ import annotations

_M32 = 0xFFFFFFFF
SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _M32
    k1 = _rotl(k1, 15)
    return (k1 * 0x1B873593) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1


def spark_hash_string(s: str, seed: int = SPARK_SEED) -> int:
    """Signed 32-bit Murmur3 of a string, identical to Spark F.hash."""
    data = s.encode("utf-8")
    n = len(data)
    h1 = seed & _M32
    # full little-endian 4-byte words
    n_words = n // 4
    for i in range(n_words):
        k1 = int.from_bytes(data[4 * i : 4 * i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(k1))
    # Spark (Murmur3_x86_32.hashUnsafeBytes): remaining bytes ONE at a
    # time, each sign-extended and sent through the full k1/h1 mix
    for i in range(4 * n_words, n):
        b = data[i]
        if b >= 128:
            b -= 256  # sign extension of the JVM byte
        h1 = _mix_h1(h1, _mix_k1(b & _M32))
    out = _fmix(h1, n)
    return out - (1 << 32) if out >= (1 << 31) else out


def spark_bucket(term: str, n_buckets: int) -> int:
    """pmod(hash(term), n_buckets) — the postings bucket partition value."""
    return spark_hash_string(term) % n_buckets
