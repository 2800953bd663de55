"""Misra-Gries / SpaceSaving heavy-hitters summary — mergeable.

Companion sketch in the spirit of the north rule's "approximate query
family" (SURVEY.md §2.3); no counterpart in the reference repo. The
classic frequent-items summary (Misra & Gries 1982) in the MERGEABLE
formulation of Agarwal et al., "Mergeability of Summaries" (PODS 2012):
keep at most ``k`` (item, count) counters; when an update or a merge
overflows the capacity, subtract the (k+1)-th largest count from every
counter and drop the non-positive ones.

Guarantees (all tested):
- never overestimates: est(x) <= true(x);
- per-item error bounded by the cumulative decrement ``offset``:
  true(x) <= est(x) + offset, and offset <= n / (k + 1) after ANY
  sequence of merges (the mergeability theorem);
- every item with true frequency > n/(k+1) is present in the summary;
- if the stream has at most ``k`` distinct items, counts are EXACT
  (offset == 0) — the oracle-checkable regime the driver query pins.

Batch updates fold a whole Arrow batch through one pandas
``value_counts`` (C-speed) before touching the dict, so the per-item
Python cost is O(distinct-per-batch), not O(rows).

Serialization: magic u32, k u32, n_items u64, offset u64, n_entries u32,
then per entry u32 utf-8 length + key bytes + u64 count, entries in
(count desc, key asc) order so equal summaries are byte-equal.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

_MAGIC = 0x4D475331  # "MGS1"


class MisraGries:
    def __init__(self, k: int = 256):
        if k < 1:
            raise ValueError("capacity k must be >= 1")
        self.k = k
        self.counts: dict[str, int] = {}
        self.n_items = 0
        self.offset = 0  # cumulative decrement: est <= true <= est + offset

    # -- update ---------------------------------------------------------------
    def update(self, values) -> "MisraGries":
        """Add a batch of items (any sequence; coerced to str)."""
        s = pd.Series(values)
        if not len(s):
            return self
        vc = s.astype(str).value_counts()
        c = self.counts
        for item, cnt in vc.items():
            c[item] = c.get(item, 0) + int(cnt)
        self.n_items += int(len(s))
        self._prune()
        return self

    def update_counts(self, items, counts) -> "MisraGries":
        """Add pre-aggregated (item, count) pairs — the map-side-combined
        form (e.g. one Arrow ``value_counts`` per batch): the Python loop
        runs over DISTINCT items, not rows. Equivalent to repeating each
        item count times (counts must be >= 1)."""
        c = self.counts
        total = 0
        for item, cnt in zip(items, counts):
            cnt = int(cnt)
            if cnt < 1:
                raise ValueError("update_counts requires counts >= 1")
            key = str(item)
            c[key] = c.get(key, 0) + cnt
            total += cnt
        self.n_items += total
        self._prune()
        return self

    def _prune(self) -> None:
        if len(self.counts) <= self.k:
            return
        arr = np.fromiter(self.counts.values(), dtype=np.int64)
        # (k+1)-th largest count: subtracting it empties at least
        # len - k counters, so at most k strictly-positive ones remain
        d = int(np.partition(arr, len(arr) - (self.k + 1))[len(arr) - (self.k + 1)])
        self.counts = {x: n - d for x, n in self.counts.items() if n > d}
        self.offset += d

    # -- merge ----------------------------------------------------------------
    def merge(self, other: "MisraGries") -> "MisraGries":
        if self.k != other.k:
            raise ValueError("cannot merge MG summaries with different k")
        c = self.counts
        for item, cnt in other.counts.items():
            c[item] = c.get(item, 0) + cnt
        self.n_items += other.n_items
        self.offset += other.offset
        self._prune()
        return self

    # -- query ----------------------------------------------------------------
    def estimate(self, item) -> int:
        """Lower-bound count; true count is in [est, est + offset]."""
        return self.counts.get(str(item), 0)

    def items(self) -> list[tuple[str, int]]:
        """(item, lower-bound count), count desc then key asc."""
        return sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))

    def top(self, n: int) -> list[tuple[str, int]]:
        return self.items()[:n]

    @property
    def error_bound(self) -> int:
        """Every absent item has true count <= offset <= n/(k+1)."""
        return self.offset

    # -- serialization ----------------------------------------------------------
    def to_bytes(self) -> bytes:
        parts = [
            struct.pack(
                "<IIQQI", _MAGIC, self.k, self.n_items, self.offset,
                len(self.counts),
            )
        ]
        for item, cnt in self.items():
            b = item.encode("utf-8")
            parts.append(struct.pack("<I", len(b)) + b + struct.pack("<Q", cnt))
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, data: bytes) -> "MisraGries":
        if len(data) < 28:
            raise ValueError("MG blob too short")
        magic, k, n_items, offset, n = struct.unpack_from("<IIQQI", data, 0)
        if magic != _MAGIC:
            raise ValueError("bad MG magic")
        s = cls(k)
        s.n_items, s.offset = n_items, offset
        pos = 28
        for _ in range(n):
            if pos + 4 > len(data):
                raise ValueError("truncated MG blob")
            (blen,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if pos + blen + 8 > len(data):
                raise ValueError("truncated MG blob")
            item = data[pos : pos + blen].decode("utf-8")
            pos += blen
            (cnt,) = struct.unpack_from("<Q", data, pos)
            pos += 8
            if cnt < 1:
                raise ValueError("non-positive counter in MG blob")
            s.counts[item] = cnt
        if len(s.counts) != n:
            raise ValueError("duplicate keys in MG blob")
        if pos != len(data):
            raise ValueError("trailing bytes after MG blob")
        return s
