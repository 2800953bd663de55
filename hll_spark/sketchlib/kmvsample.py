"""Bottom-k distinct sample — KMV with payload.

The KMV/theta construction (k smallest 64-bit hashes of the distinct
values) carries the ITEMS alongside their hashes, which turns the
cardinality sketch into a mergeable UNIFORM SAMPLE OVER DISTINCT values:
hashing is a uniform random permutation of the value universe, so the k
items with the smallest hashes are a simple random sample of the
distinct set — independent of how often each value repeats (the property
a plain row sample cannot give on duplicate-heavy web corpora).

Properties (tested):
- deterministic: same value set -> same sample, any partitioning/order;
- mergeable: union of summaries == summary of union (byte-exact);
- exact regime: if distinct <= k the sample IS the distinct set;
- duplication-invariant: repeating one value 10^6 times changes nothing.

Serialization: magic u32, k u32, full u8, n u32, then n x (hash u64,
len u32, utf-8 item) in ascending hash order — byte-stable.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from .hashing import murmur3_x64_128_low64

_MAGIC = 0x4B4D5653  # "KMVS"


class BottomKSample:
    def __init__(self, k: int = 1024):
        if k < 1:
            raise ValueError("sample size k must be >= 1")
        self.k = k
        self.full = False  # True once anything was evicted
        self.hashes = np.zeros(0, dtype=np.uint64)
        self.items: list[str] = []

    # -- update ---------------------------------------------------------------
    def update(self, values) -> "BottomKSample":
        s = pd.Series(values)
        if not len(s):
            return self
        s = s.astype(str)
        uniq = s.drop_duplicates()
        h = murmur3_x64_128_low64(uniq)
        return self._absorb(h, uniq.tolist())

    def _absorb(self, hashes: np.ndarray, items: list[str]) -> "BottomKSample":
        cat_h = np.concatenate([self.hashes, hashes.view(np.uint64)])
        cat_items = self.items + list(items)
        order = np.argsort(cat_h, kind="stable")
        cat_h, cat_items = cat_h[order], [cat_items[i] for i in order]
        # drop duplicate hashes (same value seen again; 64-bit collisions
        # between different values are negligible and resolve stably to
        # the first occurrence in hash order)
        keep = np.concatenate([[True], np.diff(cat_h) != 0])
        cat_h = cat_h[keep]
        cat_items = [it for it, kflag in zip(cat_items, keep) if kflag]
        if len(cat_h) > self.k:
            self.full = True
            cat_h, cat_items = cat_h[: self.k], cat_items[: self.k]
        self.hashes, self.items = cat_h, cat_items
        return self

    # -- merge ----------------------------------------------------------------
    def merge(self, other: "BottomKSample") -> "BottomKSample":
        if self.k != other.k:
            raise ValueError("cannot merge bottom-k samples with different k")
        self.full = self.full or other.full
        return self._absorb(other.hashes, other.items)

    # -- query ----------------------------------------------------------------
    def sample(self) -> list[str]:
        """The sampled distinct items, ascending hash order."""
        return list(self.items)

    @property
    def is_exact(self) -> bool:
        """True iff the sample is the COMPLETE distinct set."""
        return not self.full

    # -- serialization ----------------------------------------------------------
    def to_bytes(self) -> bytes:
        parts = [
            struct.pack("<IIBI", _MAGIC, self.k, int(self.full), len(self.items))
        ]
        for h, item in zip(self.hashes.tolist(), self.items):
            b = item.encode("utf-8")
            parts.append(struct.pack("<QI", h, len(b)) + b)
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "BottomKSample":
        if len(data) < 13:
            raise ValueError("bottom-k blob too short")
        magic, k, full, n = struct.unpack_from("<IIBI", data, 0)
        if magic != _MAGIC:
            raise ValueError("bad bottom-k magic")
        s = cls(k)
        s.full = bool(full)
        pos = 13
        hashes, items = [], []
        for _ in range(n):
            if pos + 12 > len(data):
                raise ValueError("truncated bottom-k blob")
            h, blen = struct.unpack_from("<QI", data, pos)
            pos += 12
            if pos + blen > len(data):
                raise ValueError("truncated bottom-k blob")
            items.append(data[pos : pos + blen].decode("utf-8"))
            hashes.append(h)
            pos += blen
        if pos != len(data):
            raise ValueError("trailing bytes after bottom-k blob")
        arr = np.array(hashes, dtype=np.uint64)
        if n and not (np.diff(arr) > 0).all():
            raise ValueError("bottom-k blob hashes not strictly ascending")
        if n > k:
            raise ValueError("bottom-k blob larger than its capacity")
        s.hashes, s.items = arr, items
        return s
