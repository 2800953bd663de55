"""Fast-AMS (count-sketch layout) — F2 moments and join-size
estimation.

Companion sketch in the north_rule spirit (mergeable, vectorized, never
per-row Python); no counterpart in the reference repo (which is an
HLL-only library).  What it buys a 100 TB pipeline that HLL/CMS can't:

* **self-join size / F2** (``Σ f_k²``) — the second frequency moment,
  i.e. the output size of a self-equi-join and the standard skew
  statistic (F2/N² is the collision probability of two random rows).
* **equi-join size** (``Σ f_k · g_k``) — the inner product of two
  frequency vectors.  Sketch both sides' key columns with the SAME
  (depth, width, seed) and ``inner()`` estimates the join output rows
  WITHOUT running the join: the measurement that decides
  broadcast-vs-shuffle-vs-salt before committing a 10^12-row shuffle.

Layout (Fast-AMS, Cormode-Garofalakis; a.k.a. the count-sketch): a
(depth x width) counter matrix.  Each item lands in ONE bucket per row
(Kirsch-Mitzenmacher double hashing, same scheme as cms.py) and adds
``±count`` with a sign hashed independently of the bucket — O(depth)
work per item, unlike the original tug-of-war's O(depth*width):

  F2 estimate          = median over rows of Σ_j c[r,j]²
  inner(a, b) estimate = median over rows of Σ_j a[r,j] · b[r,j]

Guarantees (classical, for 4-wise independent hashes): per row the
estimator is unbiased with variance <= 2·F2(f)·F2(g)/width, so with
``width = O(1/eps²)`` and ``depth = O(log 1/delta)`` medians,

  |F2_est - F2|          <= eps * F2                 w.p. 1 - delta
  |inner_est - <f, g>|   <= eps * sqrt(F2(f) F2(g))  w.p. 1 - delta

Bucket/sign hashes derive from one murmur-finalizer chain — not
provably 4-wise independent, but the finalizer's avalanche makes the
bound hold empirically; tests/test_ams.py asserts the concentration on
seeded streams rather than assuming it.

Merge is elementwise counter addition — exactly associative and
byte-stable (the shuffle-tree requirement every sketch here meets).

Serialization: 32-byte header (magic u32, depth u32, width u64,
n_items u64, seed i64) + row-major little-endian int64 counters.
"""

from __future__ import annotations

import struct

import numpy as np

from .hashing import murmur3_finalizer_u64

_MAGIC = 0x414D5331  # "AMS1"
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_SIGN_SALT = np.uint64(0xA076_1D64_78BD_642F)


class AmsSketch:
    def __init__(self, depth: int = 5, width: int = 1024, seed: int = 0):
        if depth < 1 or width < 1:
            raise ValueError("depth and width must be positive")
        self.depth = depth
        self.width = width
        self.seed = seed
        self.counters = np.zeros((depth, width), dtype=np.int64)
        self.n_items = 0

    # -- hashing -------------------------------------------------------------
    def _cols_signs(self, hashed: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Per (row, item): bucket column and ±1 sign.

        Buckets via Kirsch-Mitzenmacher double hashing (h1 + r*h2, the
        cms.py scheme); signs from a FRESH finalize of the mixed value
        salted differently, so sign ⟂ bucket even within a row.
        """
        seed_mix = np.uint64(
            (self.seed * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        )
        h = hashed ^ seed_mix
        h1 = h
        h2 = murmur3_finalizer_u64(h ^ _GOLDEN) | np.uint64(1)
        r = np.arange(self.depth, dtype=np.uint64)[:, None]
        mixed = h1[None, :] + r * h2[None, :]
        cols = (mixed % np.uint64(self.width)).astype(np.int64)
        signs = 1 - 2 * (
            (murmur3_finalizer_u64(mixed ^ _SIGN_SALT) >> np.uint64(63))
            .astype(np.int64)
        )
        return cols, signs

    # -- update --------------------------------------------------------------
    def add_hashed(
        self, hashed: np.ndarray, counts: np.ndarray | None = None
    ) -> None:
        hashed = np.ascontiguousarray(hashed).view(np.uint64).reshape(-1)
        if hashed.size == 0:
            return
        if counts is None:
            counts = np.ones(hashed.size, dtype=np.int64)
        else:
            counts = np.ascontiguousarray(counts, dtype=np.int64)
        cols, signs = self._cols_signs(hashed)
        for r in range(self.depth):
            np.add.at(self.counters[r], cols[r], signs[r] * counts)
        self.n_items += int(counts.sum())

    # -- estimates -----------------------------------------------------------
    def query_hashed(self, hashed: np.ndarray) -> np.ndarray:
        """Unbiased point-frequency estimates: median over the depth
        rows of sign * counter (Charikar-Chen-Farach-Colton's count
        sketch estimator — this layout IS the count sketch).

        Complements CMS's point query: CMS only ever OVERestimates
        (bias = whatever mass collides into the min bucket), while this
        estimator is unbiased — colliding items cancel in expectation
        because their signs are independent — with per-row standard
        deviation sqrt(F2/width).  On heavy-tailed (Zipfian) web-text
        frequencies F2 << N², so the count-sketch error beats CMS's
        eps*N guarantee for tail items.  Signed updates mean it also
        answers point queries on turnstile (insert+delete) streams,
        which CMS's uint counters cannot represent at all.

        Median-of-int rounding: .5 midpoints at even depth round to
        nearest even (np.rint); use odd depth for exact-integer
        medians.
        """
        hashed = np.ascontiguousarray(hashed).view(np.uint64).reshape(-1)
        if hashed.size == 0:
            return np.zeros(0, dtype=np.int64)
        cols, signs = self._cols_signs(hashed)
        ests = signs * self.counters[np.arange(self.depth)[:, None], cols]
        return np.rint(np.median(ests, axis=0)).astype(np.int64)

    def f2(self) -> float:
        """Second frequency moment (self-join size) estimate."""
        sq = self.counters.astype(np.float64) ** 2
        return float(np.median(sq.sum(axis=1)))

    def inner(self, other: "AmsSketch") -> float:
        """Join-size estimate ``Σ f_k · g_k`` — both sketches must share
        (depth, width, seed) so buckets and signs line up."""
        self._check_compatible(other)
        prod = self.counters.astype(np.float64) * other.counters.astype(
            np.float64
        )
        return float(np.median(prod.sum(axis=1)))

    def error_bound(self, other: "AmsSketch | None" = None) -> float:
        """One-sigma scale of a single row's estimator: sqrt(2/width) *
        sqrt(F2_a * F2_b) (a=b for f2()).  The median over depth rows
        concentrates harder; tests assert at a few multiples of this."""
        fa = self.f2()
        fb = fa if other is None else other.f2()
        return float(np.sqrt(2.0 / self.width) * np.sqrt(fa * fb))

    # -- merge ---------------------------------------------------------------
    def _check_compatible(self, other: "AmsSketch") -> None:
        if (self.depth, self.width, self.seed) != (
            other.depth,
            other.width,
            other.seed,
        ):
            raise ValueError(
                "AMS sketches differ in (depth, width, seed); buckets/"
                "signs would not align"
            )

    def merge(self, other: "AmsSketch") -> "AmsSketch":
        self._check_compatible(other)
        self.counters += other.counters
        self.n_items += other.n_items
        return self

    # -- serialization -------------------------------------------------------
    def to_bytes(self) -> bytes:
        header = struct.pack(
            "<IIQQq",
            _MAGIC,
            self.depth,
            self.width,
            self.n_items,
            self.seed,
        )
        return header + self.counters.astype("<i8").tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "AmsSketch":
        magic, depth, width, n_items, seed = struct.unpack_from(
            "<IIQQq", data, 0
        )
        if magic != _MAGIC:
            raise ValueError("bad AMS magic")
        s = cls(depth, width, seed)
        s.counters = (
            np.frombuffer(data, dtype="<i8", offset=32)
            .astype(np.int64)
            .reshape(depth, width)
            .copy()
        )
        s.n_items = n_items
        return s
