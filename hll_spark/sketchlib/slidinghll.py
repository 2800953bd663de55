"""Sliding-window HyperLogLog: distinct counts over ANY trailing time
window from one pass.

Published construct: Chabchoub & Hebrail, "Sliding HyperLogLog:
Estimating cardinality in a data stream over a sliding window"
(ICDMW 2010); also Fusy & Giroire's "future possible maxima" idea for
sliding MinCount. Per register we keep not one max rank but the List of
Future Possible Maxima (LFPM): the pairs ``(t, r)`` such that no item
with a LATER-or-equal timestamp reached rank >= r. For any window start
``T0``, the register value "max rank among items with t >= T0" is
recoverable from the LFPM alone, so ONE sketch built in ONE pass answers
every trailing window after the fact. Expected LFPM length per register
is O(ln n) — the whole sketch stays O(m ln n).

The register-index / rank derivation reuses the reference HLL semantics
(j = h & (m-1); r = 1 + lsb(h >> log2m | pwMaxMask); w == 0 dropped —
hll.go:428-462, mirrored from hll.py:_registers_from_hashes) and the
estimator regimes are shared with :mod:`.hll` via
``_estimate_from_indicator``, so window estimates carry the same
published 1.04/sqrt(m) bound as the base sketch.

Exactness tier (mirrors the reference's ``expthresh`` EXPLICIT design,
hll.go:88-131): below ``explicit_threshold`` distinct hashes the sketch
stores hash -> latest-timestamp exactly, so window counts are EXACT and
oracle-comparable; past the threshold it promotes to the LFPM register
form. Promotion is one-way and merge-compatible both ways.

Merge = multiset union of LFPM entries followed by dominance pruning.
Pruning is a closure operator compatible with union, so the merge is
associative, commutative and idempotent — serialized bytes are canonical
(sorted, pruned) and byte-equal regardless of merge order.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from .hll import HllConfig, _estimate_from_indicator

_MAGIC = b"SWH1"
_EXPLICIT = 0
_LFPM = 1

# prune the append buffer when it exceeds this multiple of m, so update
# cost stays amortized O(1) per item and memory stays O(m ln n)
_PRUNE_SLACK = 4


def _derive(h: np.ndarray, cfg: HllConfig) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(j, p_w, keep_mask) register derivation, keeping the row mask so
    the caller can align timestamps (hll.py drops w==0 rows internally).
    """
    pw_mask = np.array(cfg.pw_max_mask, dtype=np.uint64)
    j_mask = np.array(cfg.m_bits_mask, dtype=np.uint64)
    h = np.ascontiguousarray(h, dtype=np.uint64)
    w = h >> np.array(cfg.log2m, dtype=np.uint64)
    keep = w != 0
    h = h[keep]
    w = w[keep] | pw_mask
    lowest = w & (np.uint64(0) - w)
    pw = (
        (lowest.astype(np.float64).view(np.uint64) >> np.array(52, np.uint64))
        - np.array(1022, np.uint64)
    ).astype(np.uint8)
    j = (h & j_mask).astype(np.int64)
    return j, pw, keep


def _dominance_prune(
    reg: np.ndarray, ts: np.ndarray, rank: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Keep, per register, only the future possible maxima.

    Entry (t, r) survives iff no entry in the same register has
    timestamp >= t AND rank >= r (other than itself; exact duplicates
    collapse to one). Vectorized: sort by (reg asc, ts desc, rank desc);
    because rank < 64, ``combined = reg*64 + rank`` strictly increases at
    every register boundary, so a single running cumulative max of
    ``combined`` implements the per-register "rank must exceed every
    later-timestamp rank" test with no Python loop.
    """
    if reg.size == 0:
        return reg, ts, rank
    order = np.lexsort((-rank.astype(np.int64), -ts, reg))
    reg = reg[order]
    ts = ts[order]
    rank = rank[order]
    combined = reg * np.int64(64) + rank
    cmax = np.maximum.accumulate(combined)
    keep = np.empty(len(combined), dtype=bool)
    keep[0] = True
    keep[1:] = combined[1:] > cmax[:-1]
    return reg[keep], ts[keep], rank[keep]


class SlidingHll:
    """One-pass mergeable distinct-counter answering arbitrary trailing
    windows. Timestamps are int64 (any monotone unit: epoch micros in
    the Spark operator)."""

    __slots__ = ("cfg", "explicit_threshold", "mode", "explicit", "reg", "ts", "rank", "max_ts")

    def __init__(self, cfg: HllConfig | None = None, explicit_threshold: int = 0):
        self.cfg = cfg or HllConfig()
        self.explicit_threshold = int(explicit_threshold)
        self.mode = _EXPLICIT if self.explicit_threshold > 0 else _LFPM
        self.explicit: dict[int, int] = {}
        self.reg = np.empty(0, dtype=np.int64)
        self.ts = np.empty(0, dtype=np.int64)
        self.rank = np.empty(0, dtype=np.uint8)
        self.max_ts: int | None = None

    # -- update ---------------------------------------------------------------

    def add_hashed(self, hashes: np.ndarray, ts: np.ndarray) -> "SlidingHll":
        hashes = np.asarray(hashes).view(np.uint64).ravel()
        ts = np.asarray(ts, dtype=np.int64).ravel()
        if hashes.size != ts.size:
            raise ValueError("hashes and ts must align")
        if hashes.size == 0:
            return self
        mt = int(ts.max())
        self.max_ts = mt if self.max_ts is None else max(self.max_ts, mt)
        if self.mode == _EXPLICIT:
            # latest timestamp per hash, vectorized: sort by (hash, ts)
            # and take the last row of each hash run
            order = np.lexsort((ts, hashes))
            h_s, t_s = hashes[order], ts[order]
            last = np.empty(len(h_s), dtype=bool)
            last[:-1] = h_s[1:] != h_s[:-1]
            last[-1] = True
            for h, t in zip(h_s[last].tolist(), t_s[last].tolist()):
                prev = self.explicit.get(h)
                if prev is None or t > prev:
                    self.explicit[h] = t
            if len(self.explicit) > self.explicit_threshold:
                self._promote()
            return self
        j, pw, keep = _derive(hashes, self.cfg)
        self.reg = np.concatenate([self.reg, j])
        self.ts = np.concatenate([self.ts, ts[keep]])
        self.rank = np.concatenate([self.rank, pw])
        if len(self.reg) > _PRUNE_SLACK * self.cfg.m + 64:
            self._prune()
        return self

    def _promote(self) -> None:
        h = np.fromiter(self.explicit.keys(), dtype=np.uint64, count=len(self.explicit))
        t = np.fromiter(self.explicit.values(), dtype=np.int64, count=len(self.explicit))
        self.mode = _LFPM
        self.explicit = {}
        j, pw, keep = _derive(h, self.cfg)
        self.reg = np.concatenate([self.reg, j])
        self.ts = np.concatenate([self.ts, t[keep]])
        self.rank = np.concatenate([self.rank, pw])
        self._prune()

    def _prune(self) -> None:
        self.reg, self.ts, self.rank = _dominance_prune(self.reg, self.ts, self.rank)

    # -- query ----------------------------------------------------------------

    def registers_at(self, window_start: int | None) -> np.ndarray:
        """Dense register array for the window [window_start, +inf)."""
        if self.mode == _EXPLICIT:
            raise ValueError("explicit mode has no registers; use estimate()")
        self._prune()
        if window_start is None:
            sel = slice(None)
        else:
            sel = self.ts >= np.int64(window_start)
        regs = np.zeros(self.cfg.m, dtype=np.uint8)
        np.maximum.at(regs, self.reg[sel], self.rank[sel])
        return regs

    def estimate_float(self, window_start: int | None = None) -> float:
        if self.mode == _EXPLICIT:
            if window_start is None:
                return float(len(self.explicit))
            w = np.int64(window_start)
            return float(sum(1 for t in self.explicit.values() if t >= w))
        regs = self.registers_at(window_start)
        indicator = float(np.exp2(-regs.astype(np.float64)).sum())
        zeroes = int(np.count_nonzero(regs == 0))
        if zeroes == self.cfg.m:
            return 0.0
        return _estimate_from_indicator(self.cfg, indicator, zeroes)

    def estimate(self, window_start: int | None = None) -> int:
        return int(math.ceil(self.estimate_float(window_start)))

    # -- merge ----------------------------------------------------------------

    def merge(self, other: "SlidingHll") -> "SlidingHll":
        if (self.cfg.log2m, self.cfg.regwidth) != (other.cfg.log2m, other.cfg.regwidth):
            raise ValueError("sliding-hll merge requires equal (log2m, regwidth)")
        if other.max_ts is not None:
            self.max_ts = other.max_ts if self.max_ts is None else max(self.max_ts, other.max_ts)
        if self.mode == _EXPLICIT and other.mode == _EXPLICIT:
            for h, t in other.explicit.items():
                prev = self.explicit.get(h)
                if prev is None or t > prev:
                    self.explicit[h] = t
            if len(self.explicit) > self.explicit_threshold:
                self._promote()
            return self
        if self.mode == _EXPLICIT:
            self._promote()
        if other.mode == _EXPLICIT:
            o = SlidingHll(other.cfg, other.explicit_threshold)
            o.explicit = dict(other.explicit)
            o.max_ts = other.max_ts
            o._promote()
            other = o
        self.reg = np.concatenate([self.reg, other.reg])
        self.ts = np.concatenate([self.ts, other.ts])
        self.rank = np.concatenate([self.rank, other.rank])
        self._prune()
        return self

    # -- serialization ----------------------------------------------------------

    def to_bytes(self) -> bytes:
        """Canonical bytes: pruned, sorted — byte-equal across any merge
        order (the union+prune closure makes the pruned set canonical)."""
        head = struct.pack(
            ">4sBBBIq",
            _MAGIC,
            self.mode,
            self.cfg.log2m,
            self.cfg.regwidth,
            self.explicit_threshold,
            -1 if self.max_ts is None else self.max_ts,
        )
        if self.mode == _EXPLICIT:
            n = len(self.explicit)
            h = np.fromiter(self.explicit.keys(), dtype=np.uint64, count=n)
            t = np.fromiter(self.explicit.values(), dtype=np.int64, count=n)
            order = np.argsort(h, kind="stable")
            return (
                head
                + struct.pack(">I", n)
                + h[order].astype(">u8").tobytes()
                + t[order].astype(">i8").tobytes()
            )
        self._prune()
        order = np.lexsort((-self.rank.astype(np.int64), -self.ts, self.reg))
        reg, ts, rank = self.reg[order], self.ts[order], self.rank[order]
        return (
            head
            + struct.pack(">I", len(reg))
            + reg.astype(">i4").tobytes()
            + ts.astype(">i8").tobytes()
            + rank.tobytes()
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "SlidingHll":
        magic, mode, log2m, regwidth, expl, max_ts = struct.unpack_from(">4sBBBIq", data, 0)
        if magic != _MAGIC:
            raise ValueError("not a sliding-hll blob")
        off = struct.calcsize(">4sBBBIq")
        (n,) = struct.unpack_from(">I", data, off)
        off += 4
        s = cls(HllConfig(log2m=log2m, regwidth=regwidth), explicit_threshold=expl)
        s.mode = mode
        s.max_ts = None if max_ts == -1 else max_ts
        if mode == _EXPLICIT:
            h = np.frombuffer(data, dtype=">u8", count=n, offset=off)
            off += 8 * n
            t = np.frombuffer(data, dtype=">i8", count=n, offset=off)
            s.explicit = dict(zip(h.astype(np.uint64).tolist(), t.astype(np.int64).tolist()))
            return s
        s.reg = np.frombuffer(data, dtype=">i4", count=n, offset=off).astype(np.int64)
        off += 4 * n
        s.ts = np.frombuffer(data, dtype=">i8", count=n, offset=off).astype(np.int64)
        off += 8 * n
        s.rank = np.frombuffer(data, dtype=np.uint8, count=n, offset=off).copy()
        return s
