"""Iceberg bucket-transform hashing (spec Appendix B: 32-bit Murmur3).

The spec buckets with ``murmur3_x86_32`` seed 0 over a type-specific
byte layout (ints/longs hash their LITTLE-ENDIAN 8-byte form, strings
their UTF-8 bytes, ...), then ``(hash & Integer.MAX_VALUE) % N``.

The Murmur3 core here is from-scratch but NOT self-trusted: Spark's
``F.hash`` is the same murmur3_x86_32 with seed 42 over UTF-8/binary
payloads, so tests cross-check this implementation against the JVM's
on random byte strings — an independent oracle for every rotate/mix
constant — before trusting the seed-0 bucket values.

Long hashing is vectorized across values in numpy (fixed two-block
layout); variable-length byte strings hash per value inside Arrow
batches (write-path only).
"""

from __future__ import annotations

import numpy as np

_C1 = 0xCC9E2D51
_C2 = 0x1B873593
_MASK = 0xFFFFFFFF


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK


def murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 of a byte string; returns a SIGNED int32."""
    h = seed & _MASK
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        k = int.from_bytes(data[4 * i: 4 * i + 4], "little")
        k = (k * _C1) & _MASK
        k = _rotl32(k, 15)
        k = (k * _C2) & _MASK
        h ^= k
        h = _rotl32(h, 13)
        h = (h * 5 + 0xE6546B64) & _MASK
    tail = data[4 * nblocks:]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * _C1) & _MASK
        k = _rotl32(k, 15)
        k = (k * _C2) & _MASK
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _MASK
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _MASK
    h ^= h >> 16
    return h - (1 << 32) if h & 0x80000000 else h


def murmur3_32_longs(values: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized murmur3_x86_32 of int64 values in their little-endian
    8-byte layout (the spec's int/long/timestamp hashing) — two 4-byte
    blocks, no tail. Returns signed int32 per value."""
    v = np.asarray(values, dtype=np.int64).astype("<i8").view(np.uint32).reshape(-1, 2)
    h = np.full(len(v), seed & _MASK, dtype=np.uint64)

    def mix(h, k):
        k = (k.astype(np.uint64) * _C1) & _MASK
        k = ((k << 15) | (k >> 17)) & _MASK
        k = (k * _C2) & _MASK
        h = h ^ k
        h = ((h << 13) | (h >> 19)) & _MASK
        return (h * 5 + 0xE6546B64) & _MASK

    h = mix(h, v[:, 0])
    h = mix(h, v[:, 1])
    h ^= 8
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & _MASK
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & _MASK
    h ^= h >> 16
    return h.astype(np.uint32).astype(np.int32)


def bucket_longs(values: np.ndarray, n: int) -> np.ndarray:
    """Spec bucket transform for int/long/timestamp sources."""
    h = murmur3_32_longs(values, 0).astype(np.int64)
    return ((h & 0x7FFFFFFF) % n).astype(np.int32)


def bucket_value(value, iceberg_type: str, n: int) -> int:
    """Single-value bucket for string/binary/int-family sources."""
    if iceberg_type in ("int", "long", "date", "timestamp", "timestamptz"):
        h = int(murmur3_32_longs(np.array([int(value)], dtype=np.int64), 0)[0])
    elif iceberg_type == "string":
        h = murmur3_32(str(value).encode("utf-8"), 0)
    elif iceberg_type == "binary":
        h = murmur3_32(bytes(value), 0)
    else:
        raise ValueError(f"bucket transform unsupported for {iceberg_type}")
    return (h & 0x7FFFFFFF) % n
