"""Bloom filter — vectorized, exactly-associative merge (bitwise OR).

Companion sketch per BASELINE.json north_rule (SURVEY.md §2.3). k bit
positions per item are derived from one strong 64-bit input hash via
Kirsch-Mitzenmacher double hashing, so Spark-side hashing stays JVM-side
(xxhash64) and only int64 hashes cross into Python.

Guarantees (tested): zero false negatives; false-positive rate
approximately (1 - e^{-k n / m})^k.

Primary use in this engine: distributed join pre-filter — build a Bloom
over a dimension key column, broadcast the (m/8)-byte bitmap, and filter
the fact table before the shuffle (SURVEY.md §2.2 joins row).

Serialization: 24-byte header (magic u32, k u32, m_bits u64, n_added u64)
+ packed little-endian bitmap bytes.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .hashing import murmur3_finalizer_u64

_MAGIC = 0x424C4D31  # "BLM1"
_GOLDEN = np.array(0x9E3779B97F4A7C15, dtype=np.uint64)
_ONE = np.array(1, dtype=np.uint64)


def optimal_params(expected_items: int, fpr: float) -> tuple[int, int]:
    """(m_bits, k) minimizing space for a target false-positive rate."""
    m = max(8, int(math.ceil(-expected_items * math.log(fpr) / (math.log(2) ** 2))))
    k = max(1, int(round(m / expected_items * math.log(2))))
    return m, k


class BloomFilter:
    def __init__(self, m_bits: int = 1 << 20, k: int = 7):
        if m_bits < 8 or k < 1:
            raise ValueError("m_bits must be >= 8 and k >= 1")
        self.m_bits = m_bits
        self.k = k
        self.bits = np.zeros((m_bits + 7) // 8, dtype=np.uint8)
        self.n_added = 0

    @classmethod
    def for_items(cls, expected_items: int, fpr: float = 0.01) -> "BloomFilter":
        m, k = optimal_params(expected_items, fpr)
        return cls(m, k)

    def _positions(self, hashed: np.ndarray) -> np.ndarray:
        h = np.ascontiguousarray(hashed).view(np.uint64).reshape(-1)
        h1 = h
        h2 = murmur3_finalizer_u64(h ^ _GOLDEN) | _ONE
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        m_bits = np.array(self.m_bits, dtype=np.uint64)
        return ((h1[None, :] + i * h2[None, :]) % m_bits).reshape(-1)

    def add_hashed(self, hashed: np.ndarray) -> None:
        hashed = np.ascontiguousarray(hashed).view(np.uint64).reshape(-1)
        if hashed.size == 0:
            return
        pos = self._positions(hashed)
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        self.n_added += hashed.size

    def might_contain_hashed(self, hashed: np.ndarray) -> np.ndarray:
        hashed = np.ascontiguousarray(hashed).view(np.uint64).reshape(-1)
        if hashed.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(hashed).reshape(self.k, hashed.size)
        hit = (self.bits[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
        return hit.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m_bits, self.k) != (other.m_bits, other.k):
            raise ValueError("cannot merge Blooms with different (m_bits, k)")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        self.n_added += other.n_added
        return self

    def expected_fpr(self) -> float:
        return (1 - math.exp(-self.k * self.n_added / self.m_bits)) ** self.k

    def to_bytes(self) -> bytes:
        header = struct.pack("<IIQQ", _MAGIC, self.k, self.m_bits, self.n_added)
        return header + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "BloomFilter":
        magic, k, m_bits, n_added = struct.unpack_from("<IIQQ", data, 0)
        if magic != _MAGIC:
            raise ValueError("bad Bloom magic")
        s = cls(m_bits, k)
        s.bits = np.frombuffer(data, dtype=np.uint8, offset=24).copy()
        s.n_added = n_added
        return s
