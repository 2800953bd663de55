"""Bloom filter tests: zero false negatives, FPR tolerance, OR-merge."""

import numpy as np
import pytest

from hll_spark.sketchlib.bloom import BloomFilter, optimal_params
from hll_spark.sketchlib.hashing import hash64_long


def test_no_false_negatives():
    rng = np.random.default_rng(0)
    members = rng.choice(10**9, size=20_000, replace=False).astype(np.int64)
    bf = BloomFilter.for_items(20_000, fpr=0.01)
    bf.add_hashed(hash64_long(members))
    assert bf.might_contain_hashed(hash64_long(members)).all()


def test_fpr_within_tolerance():
    rng = np.random.default_rng(1)
    members = np.arange(20_000, dtype=np.int64)
    bf = BloomFilter.for_items(20_000, fpr=0.01)
    bf.add_hashed(hash64_long(members))
    non_members = np.arange(10**6, 10**6 + 50_000, dtype=np.int64)
    fp = bf.might_contain_hashed(hash64_long(non_members)).mean()
    assert fp <= 3 * 0.01, f"observed FPR {fp:.4f}"


def test_optimal_params_sane():
    m, k = optimal_params(10_000, 0.01)
    assert 90_000 < m < 110_000  # ~9.6 bits/item at 1% FPR
    assert 5 <= k <= 9


def test_merge_is_bitwise_or_byte_equal():
    a_vals = np.arange(0, 5000, dtype=np.int64)
    b_vals = np.arange(2500, 7500, dtype=np.int64)
    a = BloomFilter(1 << 16, 5)
    a.add_hashed(hash64_long(a_vals))
    b = BloomFilter(1 << 16, 5)
    b.add_hashed(hash64_long(b_vals))
    both = BloomFilter(1 << 16, 5)
    both.add_hashed(hash64_long(np.concatenate([a_vals, b_vals])))
    merged = a.merge(b)
    np.testing.assert_array_equal(merged.bits, both.bits)
    assert merged.might_contain_hashed(hash64_long(b_vals)).all()


def test_serialization_roundtrip():
    bf = BloomFilter(1 << 12, 4)
    bf.add_hashed(hash64_long(np.arange(100, dtype=np.int64)))
    back = BloomFilter.from_bytes(bf.to_bytes())
    np.testing.assert_array_equal(back.bits, bf.bits)
    assert (back.m_bits, back.k, back.n_added) == (bf.m_bits, bf.k, bf.n_added)


def test_merge_rejects_mismatched_params():
    with pytest.raises(ValueError):
        BloomFilter(1 << 10, 3).merge(BloomFilter(1 << 11, 3))
