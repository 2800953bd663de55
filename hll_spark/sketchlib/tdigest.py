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
        all_means = np.concatenate([self.means, means])
        all_weights = np.concatenate([self.weights, weights])
        order = np.argsort(all_means, kind="stable")
        all_means, all_weights = all_means[order], all_weights[order]
        total = all_weights.sum()

        out_means: list[float] = []
        out_weights: list[float] = []
        cur_mean = float(all_means[0])
        cur_weight = float(all_weights[0])
        q_left = 0.0
        k_left = float(self._k(np.array([0.0]))[0])
        for m, w in zip(all_means[1:].tolist(), all_weights[1:].tolist()):
            q_right = q_left + (cur_weight + w) / total
            if float(self._k(np.array([q_right]))[0]) - k_left <= 1.0:
                # absorb into current centroid
                cur_mean += (m - cur_mean) * w / (cur_weight + w)
                cur_weight += w
            else:
                out_means.append(cur_mean)
                out_weights.append(cur_weight)
                q_left += cur_weight / total
                k_left = float(self._k(np.array([q_left]))[0])
                cur_mean, cur_weight = m, w
        out_means.append(cur_mean)
        out_weights.append(cur_weight)
        self.means = np.array(out_means, dtype=np.float64)
        self.weights = np.array(out_weights, dtype=np.float64)

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
