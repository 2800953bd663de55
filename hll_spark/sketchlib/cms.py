"""Count-Min sketch — vectorized, exactly-associative merge.

Companion sketch mandated by BASELINE.json north_rule; no counterpart in
the reference repo (SURVEY.md §2.3). Standard Cormode-Muthukrishnan CMS:
a (depth x width) counter matrix; row hashes derived from one strong
64-bit input hash via Kirsch-Mitzenmacher double hashing
(h_i = h1 + i*h2), so the Spark layer can keep hashing JVM-side.

Guarantees (tested): estimates never underestimate; overestimate bounded
by eps*N with probability 1-delta, eps = e/width, delta = e^-depth.
Merge is elementwise addition — exactly associative and byte-stable.

Serialization: 24-byte header (magic u32, depth u32, width u64, n_items u64) +
row-major little-endian uint64 counters.
"""

from __future__ import annotations

import struct

import numpy as np

from .hashing import murmur3_finalizer_u64

_MAGIC = 0x434D5331  # "CMS1"
_GOLDEN = np.array(0x9E3779B97F4A7C15, dtype=np.uint64)
_ONE = np.array(1, dtype=np.uint64)


class CountMinSketch:
    def __init__(self, depth: int = 5, width: int = 2048):
        if depth < 1 or width < 1:
            raise ValueError("depth and width must be positive")
        self.depth = depth
        self.width = width
        self.table = np.zeros((depth, width), dtype=np.uint64)
        self.n_items = 0  # total weight added (N in the bound)

    # -- hashing -------------------------------------------------------------
    def _rows_cols(self, hashed: np.ndarray) -> np.ndarray:
        """(depth, n) column indices via Kirsch-Mitzenmacher double hash."""
        h = np.ascontiguousarray(hashed).view(np.uint64)
        h1 = h
        h2 = murmur3_finalizer_u64(h ^ _GOLDEN) | _ONE  # odd -> full period
        i = np.arange(self.depth, dtype=np.uint64)[:, None]
        width = np.array(self.width, dtype=np.uint64)
        return ((h1[None, :] + i * h2[None, :]) % width).astype(np.int64)

    # -- update / query --------------------------------------------------------
    def add_hashed(self, hashed: np.ndarray, counts: np.ndarray | None = None) -> None:
        """Add pre-hashed items (optionally with per-item weights)."""
        hashed = np.ascontiguousarray(hashed).view(np.uint64).reshape(-1)
        if hashed.size == 0:
            return
        if counts is None:
            counts = np.ones(hashed.size, dtype=np.uint64)
        else:
            counts = np.ascontiguousarray(counts, dtype=np.uint64)
        cols = self._rows_cols(hashed)
        for r in range(self.depth):
            np.add.at(self.table[r], cols[r], counts)
        self.n_items += int(counts.sum())

    def query_hashed(self, hashed: np.ndarray) -> np.ndarray:
        """Point-estimate counts: min over rows (never underestimates)."""
        hashed = np.ascontiguousarray(hashed).view(np.uint64).reshape(-1)
        if hashed.size == 0:
            return np.zeros(0, dtype=np.uint64)
        cols = self._rows_cols(hashed)
        ests = self.table[np.arange(self.depth)[:, None], cols]
        return ests.min(axis=0)

    # -- merge -------------------------------------------------------------------
    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.depth, self.width) != (other.depth, other.width):
            raise ValueError("cannot merge CMS with different (depth, width)")
        self.table += other.table
        self.n_items += other.n_items
        return self

    # -- bounds ---------------------------------------------------------------
    @property
    def epsilon(self) -> float:
        return float(np.e) / self.width

    @property
    def delta(self) -> float:
        return float(np.exp(-self.depth))

    # -- serialization ------------------------------------------------------------
    def to_bytes(self) -> bytes:
        header = struct.pack("<IIQQ", _MAGIC, self.depth, self.width, self.n_items)
        return header + self.table.astype("<u8").tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMinSketch":
        magic, depth, width, n_items = struct.unpack_from("<IIQQ", data, 0)
        if magic != _MAGIC:
            raise ValueError("bad CMS magic")
        s = cls(depth, width)
        s.table = (
            np.frombuffer(data, dtype="<u8", offset=24)
            .astype(np.uint64)
            .reshape(depth, width)
            .copy()
        )
        s.n_items = n_items
        return s
