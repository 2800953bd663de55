"""Theta (KMV — k-minimum-values) sketch: distinct counts PLUS direct
set-operation estimates.

Why it exists alongside HLL: HLL can only intersect via
inclusion-exclusion (|A∩B| = |A|+|B|-|A∪B|), whose absolute error is
driven by the UNION size — terrible for small intersections of large
sets. A theta sketch carries the k smallest distinct hash values, so
intersection and difference are estimated DIRECTLY on the retained
samples with error relative to the result. This is the same design
point Apache DataSketches' theta family occupies next to its HLL; the
reference library (l0vest0rm/hll) has no counterpart — this is one of
the beyond-the-reference operators the training-pipeline mandate asks
for.

State is a PURE FUNCTION of the distinct inserted-hash set: the
``min(k, n)`` smallest distinct 64-bit hashes plus an overflow flag
(the k smallest of a union are always contained in the union of each
side's k smallest, so merge is byte-associative and order-insensitive
— the same canonicity invariant the HLL kernel guarantees, and what
the distributed tree merge requires).

Estimators (hashes mapped to (0,1] by v/2^64):
- not full (n <= k): exact count.
- full: M_k = max(retained)/2^64, est = (k-1)/M_k  (classic KMV,
  Bar-Yossef et al. 2002 / Beyer et al. 2007; rel. std err ~ 1/sqrt(k-2)).
- intersection/difference: filter both retained sets below
  theta = min(theta_A, theta_B), then count/theta over the filtered
  sample (Dasgupta et al., "Theta-Sketch Framework").
  Exact when both sides are not full.

Serialization (little-endian): magic u32 'TKMV', k u32, full u8,
count u64, then ``count`` sorted u64 hash values — deterministic bytes
for identical state.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

_MAGIC = 0x544B4D56  # 'TKMV'
_TWO64 = float(2**64)


@dataclass
class ThetaSketch:
    k: int = 4096
    full: bool = False
    # sorted ascending, uint64, at most k entries
    values: np.ndarray = field(
        default_factory=lambda: np.zeros(0, dtype=np.uint64)
    )

    def __post_init__(self) -> None:
        if self.k < 16:
            raise ValueError("theta sketch k must be >= 16")

    # -- update -------------------------------------------------------------
    def add_hashed(self, hashed: np.ndarray) -> "ThetaSketch":
        vals = np.ascontiguousarray(hashed).view(np.uint64).reshape(-1)
        if vals.size == 0:
            return self
        merged = np.union1d(self.values, vals)  # sorted distinct
        if merged.size > self.k:
            self.full = True
            merged = merged[: self.k]
        self.values = merged
        return self

    # -- merge --------------------------------------------------------------
    def union(self, other: "ThetaSketch") -> "ThetaSketch":
        if self.k != other.k:
            raise ValueError("cannot union theta sketches with different k")
        merged = np.union1d(self.values, other.values)
        full = self.full or other.full or merged.size > self.k
        if merged.size > self.k:
            merged = merged[: self.k]
        self.values, self.full = merged, full
        return self

    # -- estimators -----------------------------------------------------------
    @property
    def error_bound(self) -> float:
        """KMV relative standard error ~ 1/sqrt(k-2) (Beyer et al. 2007)."""
        return 1.0 / (self.k - 2) ** 0.5

    @property
    def theta(self) -> float:
        """Sampling threshold in (0, 1]."""
        if not self.full:
            return 1.0
        return float(self.values[-1]) / _TWO64

    def estimate_float(self) -> float:
        if not self.full:
            return float(self.values.size)
        return (self.k - 1) / self.theta

    def estimate(self) -> int:
        import math

        return int(math.ceil(self.estimate_float()))

    def _theta_u64(self) -> int:
        """Sampling threshold as an exact integer in (0, 2^64]."""
        return 2**64 if not self.full else int(self.values[-1])

    def _common_theta_filter(self, other: "ThetaSketch") -> tuple:
        # exact u64 comparisons: a float round-trip of the 64-bit
        # threshold could shift the boundary by an ulp and include or
        # drop a boundary sample inconsistently with the divisor
        thr = min(self._theta_u64(), other._theta_u64())
        theta = thr / _TWO64
        if thr == 2**64:
            return theta, self.values, other.values
        cut = np.uint64(thr)
        return theta, self.values[self.values < cut], other.values[
            other.values < cut
        ]

    def intersect_estimate(self, other: "ThetaSketch") -> float:
        """Direct |A∩B| estimate; exact when neither side is full."""
        theta, a, b = self._common_theta_filter(other)
        n = np.intersect1d(a, b, assume_unique=True).size
        return n / theta

    def difference_estimate(self, other: "ThetaSketch") -> float:
        """Direct |A \\ B| estimate; exact when neither side is full."""
        theta, a, b = self._common_theta_filter(other)
        n = np.setdiff1d(a, b, assume_unique=True).size
        return n / theta

    # -- serialization ----------------------------------------------------------
    def to_bytes(self) -> bytes:
        header = struct.pack(
            "<IIBQ", _MAGIC, self.k, int(self.full), self.values.size
        )
        return header + self.values.astype("<u8").tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "ThetaSketch":
        magic, k, full, count = struct.unpack_from("<IIBQ", data, 0)
        if magic != _MAGIC:
            raise ValueError(f"bad theta sketch magic: {magic:#x}")
        off = struct.calcsize("<IIBQ")
        vals = np.frombuffer(
            data, dtype="<u8", count=count, offset=off
        ).astype(np.uint64)
        return cls(k=k, full=bool(full), values=vals)
