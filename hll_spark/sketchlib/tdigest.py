"""t-digest quantile sketch (Dunning's merging variant) — deterministic.

Companion sketch per BASELINE.json north_rule (SURVEY.md §2.3). Centroids
(mean, weight) sorted by mean; batch inserts buffer values and re-merges;
cluster sizes are governed by the k1 scale function
k(q) = (delta / 2π) · asin(2q − 1), which keeps clusters tiny near the
tails — giving high relative accuracy at extreme quantiles.

Fully deterministic (no RNG): merges process centroids in sorted order.
Merge is statistically associative — order affects bytes, bounds hold
(tested under permuted merge orders).

Serialization: header (magic u32, delta f64, total weight f64, count u32)
+ mean/weight float64 arrays.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = 0x54444731  # "TDG1"


class TDigest:
    def __init__(self, delta: float = 200.0):
        if delta < 10:
            raise ValueError("delta must be >= 10")
        self.delta = float(delta)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf: list[np.ndarray] = []
        self._buf_size = 0

    # -- scale function ----------------------------------------------------------
    def _k(self, q: np.ndarray) -> np.ndarray:
        q = np.clip(q, 0.0, 1.0)
        return self.delta / (2 * np.pi) * np.arcsin(2 * q - 1)

    # -- update --------------------------------------------------------------------
    def update(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64).reshape(-1)
        values = values[~np.isnan(values)]
        if values.size == 0:
            return
        self._buf.append(values)
        self._buf_size += values.size
        if self._buf_size >= 10 * self.delta:
            self._flush()

    def _flush(self) -> None:
        if not self._buf:
            return
        vals = np.concatenate(self._buf)
        self._buf, self._buf_size = [], 0
        self._merge_in(vals, np.ones(vals.size, dtype=np.float64))

    def _merge_in(self, means: np.ndarray, weights: np.ndarray) -> None:
        """Re-cluster sorted centroids, fully vectorized.

        Clusters are cut wherever floor(k(q_left)) advances — every
        resulting cluster spans < 1 unit of k-space, satisfying the
        t-digest size invariant (clusters near q=0/1 stay tiny). This is
        the vectorized formulation of Dunning's merging algorithm; the
        sequential greedy variant packs slightly differently but both
        respect the same bound. Deterministic: no RNG, stable sort.
        """
        all_means = np.concatenate([self.means, means])
        all_weights = np.concatenate([self.weights, weights])
        order = np.argsort(all_means, kind="stable")
        all_means, all_weights = all_means[order], all_weights[order]
        total = all_weights.sum()

        q_left = (np.cumsum(all_weights) - all_weights) / total
        cluster = np.floor(self._k(q_left)).astype(np.int64)
        # group consecutive equal cluster ids (ids are non-decreasing)
        new_group = np.r_[True, cluster[1:] != cluster[:-1]]
        gid = np.cumsum(new_group) - 1
        n_groups = int(gid[-1]) + 1
        w_out = np.zeros(n_groups, dtype=np.float64)
        np.add.at(w_out, gid, all_weights)
        m_out = np.zeros(n_groups, dtype=np.float64)
        np.add.at(m_out, gid, all_means * all_weights)
        m_out /= w_out
        self.means = m_out
        self.weights = w_out

    # -- merge ----------------------------------------------------------------------
    def merge(self, other: "TDigest") -> "TDigest":
        if self.delta != other.delta:
            raise ValueError("cannot merge t-digests with different delta")
        self._flush()
        other_flushed = other.clone()
        other_flushed._flush()
        if other_flushed.means.size:
            self._merge_in(other_flushed.means, other_flushed.weights)
        return self

    def clone(self) -> "TDigest":
        t = TDigest(self.delta)
        t.means = self.means.copy()
        t.weights = self.weights.copy()
        t._buf = [b.copy() for b in self._buf]
        t._buf_size = self._buf_size
        return t

    # -- queries ---------------------------------------------------------------------
    @property
    def n(self) -> float:
        return float(self.weights.sum()) + self._buf_size

    def quantile(self, q: float) -> float:
        self._flush()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        total = self.weights.sum()
        target = q * total
        # centroid centers at cumulative weight minus half own weight
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            return float(self.means[0])
        if target >= cum[-1]:
            return float(self.means[-1])
        idx = int(np.searchsorted(cum, target, side="right"))
        c0, c1 = cum[idx - 1], cum[idx]
        m0, m1 = self.means[idx - 1], self.means[idx]
        frac = (target - c0) / (c1 - c0)
        return float(m0 + frac * (m1 - m0))

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs])

    # -- serialization -----------------------------------------------------------------
    def to_bytes(self) -> bytes:
        self._flush()
        head = struct.pack("<IdI", _MAGIC, self.delta, self.means.size)
        return (
            head
            + self.means.astype("<f8").tobytes()
            + self.weights.astype("<f8").tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "TDigest":
        magic, delta, count = struct.unpack_from("<IdI", data, 0)
        if magic != _MAGIC:
            raise ValueError("bad t-digest magic")
        t = cls(delta)
        off = struct.calcsize("<IdI")
        t.means = np.frombuffer(data, dtype="<f8", count=count, offset=off).astype(
            np.float64
        )
        t.weights = np.frombuffer(
            data, dtype="<f8", count=count, offset=off + 8 * count
        ).astype(np.float64)
        return t
