"""KLL quantile sketch — deterministic compaction, mergeable.

Companion sketch per BASELINE.json north_rule (SURVEY.md §2.3), following
the KLL algorithm (Karnin-Lang-Liberty, FOCS'16; see PAPERS.md KLL±
VLDB'21 for the streaming context): a hierarchy of compactor levels where
level i holds items of weight 2^i; a full level sorts and keeps every
other item (promoting survivors upward), halving its size.

Determinism (SURVEY.md §7.3 risk 5): the classic algorithm flips a coin
for odd/even survivor selection; we use a counter-based alternation so
reruns and checkpoint resumes are bit-reproducible. Merge is
*statistically* associative: merge order can change bytes but the rank
error bound holds under any order (tested over permutations).

Guarantee (tested): additive rank error <= ~3.2/k with c=2/3 capacities,
with high probability; we assert a conservative 5/k empirically.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = 0x4B4C4C31  # "KLL1"
_C = 2.0 / 3.0  # capacity decay for lower levels
_MIN_CAP = 8


class KllSketch:
    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._coin = 0  # deterministic compaction selector

    # -- capacities ------------------------------------------------------------
    def _capacity(self, level: int) -> int:
        height = len(self.levels)
        return max(_MIN_CAP, int(np.ceil(self.k * _C ** (height - 1 - level))))

    def _total_capacity(self) -> int:
        return sum(self._capacity(i) for i in range(len(self.levels)))

    # -- update -------------------------------------------------------------------
    def update(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64).reshape(-1)
        values = values[~np.isnan(values)]
        if values.size == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], values])
        self.n += values.size
        self._compress()

    def _compress(self) -> None:
        while sum(len(lv) for lv in self.levels) > self._total_capacity():
            for i in range(len(self.levels)):
                if len(self.levels[i]) >= self._capacity(i):
                    self._compact_level(i)
                    break
            else:
                break

    def _compact_level(self, i: int) -> None:
        if i + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        lv = np.sort(self.levels[i])
        offset = self._coin & 1
        self._coin += 1
        survivors = lv[offset::2]
        # odd length: one item has no pair; keep it at this level so total
        # weight is conserved exactly for the paired portion
        if len(lv) % 2 == 1:
            if offset == 0:
                # survivors include the last unpaired item; keep it down here
                keep, promote = lv[-1:], survivors[:-1]
            else:
                keep, promote = lv[:1], survivors
        else:
            keep, promote = np.empty(0, dtype=np.float64), survivors
        self.levels[i] = keep
        self.levels[i + 1] = np.concatenate([self.levels[i + 1], promote])

    # -- merge ------------------------------------------------------------------
    def merge(self, other: "KllSketch") -> "KllSketch":
        if self.k != other.k:
            raise ValueError("cannot merge KLL sketches with different k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for i, lv in enumerate(other.levels):
            if len(lv):
                self.levels[i] = np.concatenate([self.levels[i], lv])
        self.n += other.n
        self._coin = max(self._coin, other._coin)
        self._compress()
        return self

    # -- queries ------------------------------------------------------------------
    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for i, lv in enumerate(self.levels):
            if len(lv):
                items.append(lv)
                weights.append(np.full(len(lv), 2**i, dtype=np.float64))
        if not items:
            return np.empty(0), np.empty(0)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def quantile(self, q: float) -> float:
        """Value at rank q*n (q in [0,1])."""
        items, weights = self._weighted_items()
        if items.size == 0:
            return float("nan")
        cum = np.cumsum(weights)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(items[min(idx, items.size - 1)])

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs])

    def rank(self, value: float) -> float:
        """Approximate normalized rank of value (fraction of items <= value)."""
        items, weights = self._weighted_items()
        if items.size == 0:
            return float("nan")
        total = weights.sum()
        return float(weights[items <= value].sum() / total)

    # -- serialization ----------------------------------------------------------------
    def to_bytes(self) -> bytes:
        head = struct.pack(
            "<IIQQI", _MAGIC, self.k, self.n, self._coin, len(self.levels)
        )
        parts = [head]
        for lv in self.levels:
            parts.append(struct.pack("<Q", len(lv)))
            parts.append(lv.astype("<f8").tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "KllSketch":
        magic, k, n, coin, n_levels = struct.unpack_from("<IIQQI", data, 0)
        if magic != _MAGIC:
            raise ValueError("bad KLL magic")
        s = cls(k)
        s.n = n
        s._coin = coin
        s.levels = []
        off = struct.calcsize("<IIQQI")
        for _ in range(n_levels):
            (ln,) = struct.unpack_from("<Q", data, off)
            off += 8
            s.levels.append(
                np.frombuffer(data, dtype="<f8", count=ln, offset=off).astype(
                    np.float64
                )
            )
            off += 8 * ln
        if not s.levels:
            s.levels = [np.empty(0, dtype=np.float64)]
        return s
