"""MurmurHash3 x64-128 parity tests.

The scalar model is an independent straight-line implementation of Austin
Appleby's public-domain MurmurHash3_x64_128 used to cross-check the
vectorized version on arbitrary lengths; plus a published golden vector
from the mmh3 library docs: mmh3.hash64('foo') ==
(-2129773440516405919, 9128664383759220103).
"""

import numpy as np
import pandas as pd
import pytest

from hll_spark.sketchlib.hashing import (
    hash64_long,
    murmur3_finalizer_u64,
    murmur3_x64_128_low64,
)

MASK = (1 << 64) - 1


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & MASK


def _fmix(k):
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & MASK
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & MASK
    k ^= k >> 33
    return k


def scalar_murmur3_x64_128(data: bytes, seed: int = 0):
    """Independent scalar MurmurHash3_x64_128; returns (h1, h2) unsigned."""
    length = len(data)
    nblocks = length // 16
    h1 = h2 = seed
    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    for i in range(nblocks):
        k1 = int.from_bytes(data[i * 16 : i * 16 + 8], "little")
        k2 = int.from_bytes(data[i * 16 + 8 : i * 16 + 16], "little")
        k1 = (k1 * c1) & MASK
        k1 = _rotl(k1, 31)
        k1 = (k1 * c2) & MASK
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & MASK
        h1 = (h1 * 5 + 0x52DCE729) & MASK
        k2 = (k2 * c2) & MASK
        k2 = _rotl(k2, 33)
        k2 = (k2 * c1) & MASK
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & MASK
        h2 = (h2 * 5 + 0x38495AB5) & MASK
    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    if len(tail) > 8:
        k2 = int.from_bytes(tail[8:].ljust(8, b"\0"), "little")
        k2 = (k2 * c2) & MASK
        k2 = _rotl(k2, 33)
        k2 = (k2 * c1) & MASK
        h2 ^= k2
    if len(tail) > 0:
        k1 = int.from_bytes(tail[:8].ljust(8, b"\0"), "little")
        k1 = (k1 * c1) & MASK
        k1 = _rotl(k1, 31)
        k1 = (k1 * c2) & MASK
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & MASK
    h2 = (h2 + h1) & MASK
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & MASK
    h2 = (h2 + h1) & MASK
    return h1, h2


def test_published_golden_vector_foo():
    h1, _ = scalar_murmur3_x64_128(b"foo")
    assert h1 == (-2129773440516405919) % 2**64
    got = murmur3_x64_128_low64(pd.Series(["foo"]))
    assert int(got[0]) == h1


def test_empty_string_hashes_to_zero():
    assert int(murmur3_x64_128_low64(pd.Series([""]))[0]) == 0


@pytest.mark.parametrize("length", [1, 7, 8, 9, 15, 16, 17, 31, 32, 33, 100])
def test_vectorized_matches_scalar_all_tail_lengths(length):
    rng = np.random.default_rng(length)
    rows = [bytes(rng.integers(0, 256, size=length, dtype=np.uint8)) for _ in range(20)]
    got = murmur3_x64_128_low64(pd.Series(rows))
    for i, row in enumerate(rows):
        assert int(got[i]) == scalar_murmur3_x64_128(row)[0]


def test_mixed_lengths_bucketing():
    rng = np.random.default_rng(0)
    rows = []
    for _ in range(200):
        n = int(rng.integers(0, 50))
        rows.append(bytes(rng.integers(0, 256, size=n, dtype=np.uint8)))
    got = murmur3_x64_128_low64(pd.Series(rows))
    for i, row in enumerate(rows):
        assert int(got[i]) == scalar_murmur3_x64_128(row)[0]


def test_string_utf8_encoding():
    s = pd.Series(["héllo wörld", "日本語テキスト"])
    got = murmur3_x64_128_low64(s)
    for i, v in enumerate(s):
        assert int(got[i]) == scalar_murmur3_x64_128(v.encode("utf-8"))[0]


def test_seed_parameter():
    got = murmur3_x64_128_low64(pd.Series([b"abcdef"]), seed=12345)
    assert int(got[0]) == scalar_murmur3_x64_128(b"abcdef", seed=12345)[0]


def test_finalizer_matches_reference_semantics():
    # util.go:244-252: xor-shift-multiply avalanche; spot-check vs scalar
    def scalar_fin(x):
        x ^= x >> 33
        x = (x * 0xFF51AFD7ED558CCD) & MASK
        x ^= x >> 33
        x = (x * 0xC4CEB9FE1A85EC53) & MASK
        x ^= x >> 33
        return x

    vals = np.array([0, 1, 42, 2**63, 2**64 - 1], dtype=np.uint64)
    got = murmur3_finalizer_u64(vals)
    for v, g in zip(vals.tolist(), got.tolist()):
        assert g == scalar_fin(v)


def test_hash64_long_is_deterministic_and_spread():
    vals = np.arange(10_000, dtype=np.int64)
    h = hash64_long(vals)
    assert len(np.unique(h)) == 10_000  # bijective finalizer: no collisions
    np.testing.assert_array_equal(h, hash64_long(vals))


def test_workspace_cache_capped_for_wide_strings():
    """A batch with one huge string must not pin a rows x width cache
    (ADVICE r2: worker-OOM hazard); hashes stay identical either way."""
    from hll_spark.sketchlib.hashing import (
        _WORKSPACE,
        _WS_MAX_BYTES,
        murmur3_x64_128_low64,
    )

    wide = ["x" * 100_000] + [f"doc{i}" for i in range(99)]
    h_wide = murmur3_x64_128_low64(wide)
    buf = _WORKSPACE.get("buf")
    assert buf is None or buf.nbytes <= _WS_MAX_BYTES
    # per-value hashes equal the narrow-batch path's answers
    np.testing.assert_array_equal(
        h_wide[1:], murmur3_x64_128_low64(wide[1:])
    )


def test_murmur3_finalizer_u32_scalar_model_and_avalanche():
    """fmix32 parity with an independent scalar model of the published
    finalizer (reference util.go:262-269), plus the properties the
    reference relies on: bijectivity (no collisions over a large sample)
    and ~50% avalanche on single-bit flips."""
    from hll_spark.sketchlib.hashing import murmur3_finalizer_u32

    def scalar_fmix32(x: int) -> int:
        x &= 0xFFFFFFFF
        x ^= x >> 16
        x = (x * 0x85EBCA6B) & 0xFFFFFFFF
        x ^= x >> 13
        x = (x * 0xC2B2AE35) & 0xFFFFFFFF
        x ^= x >> 16
        return x

    vals = np.array([0, 1, 2, 0xDEADBEEF, 0xFFFFFFFF, 12345678], dtype=np.uint32)
    got = murmur3_finalizer_u32(vals)
    assert got.tolist() == [scalar_fmix32(int(v)) for v in vals]
    assert scalar_fmix32(0) == 0 and got[0] == 0

    sample = np.arange(100_000, dtype=np.uint32)
    h = murmur3_finalizer_u32(sample)
    assert len(np.unique(h)) == len(sample)  # bijective: no collisions

    flipped = murmur3_finalizer_u32(sample ^ np.uint32(1))
    diff_bits = np.unpackbits((h ^ flipped).view(np.uint8)).mean() * 32
    assert 14 <= diff_bits <= 18  # ~16 of 32 bits flip on average


def test_murmur3_finalizer_u32_rejects_wrong_width():
    from hll_spark.sketchlib.hashing import murmur3_finalizer_u32

    import pytest as _pytest

    with _pytest.raises(ValueError, match="32-bit"):
        murmur3_finalizer_u32(np.array([1, 2], dtype=np.int64))
    # int32 is fine (same width, viewed)
    assert murmur3_finalizer_u32(np.array([0], dtype=np.int32))[0] == 0
