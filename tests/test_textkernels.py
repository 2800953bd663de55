"""Batch-flattened text kernels vs straightforward per-document
reference implementations — guards the reduceat/offset bookkeeping in
operators/textkernels.py (doc boundaries, short docs, empty docs)."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

from hll_spark.operators.textkernels import (
    _POS_C,
    _fmix64,
    fingerprint_values,
    flat_shingle_hashes,
    minhash_matrix,
    simhash_values,
)
from hll_spark.sketchlib.hashing import murmur3_x64_128_low64

_SEED_MIX = np.uint64(0x9E3779B97F4A7C15)


def ref_shingles(t, n):
    """Per-doc reference: same definition, no batch flattening."""
    toks = (t or "").split()
    if not toks:
        return np.zeros(0, np.uint64)
    th = murmur3_x64_128_low64(pd.Series(toks))
    if len(toks) < n:
        acc = np.bitwise_xor.reduce(th * _POS_C[: len(toks)])
        return _fmix64(np.array([acc], np.uint64))
    w = len(toks) - n + 1
    acc = th[:w] * _POS_C[0]
    for k in range(1, n):
        acc = acc ^ (th[k : w + k] * _POS_C[k])
    return _fmix64(acc)


FIXED_CORPUS = pd.Series(
    [
        "the quick brown fox jumps over the lazy dog",
        "",
        "one",
        "two words",
        "a b c d e f g h i j k",
        None,
        "quick brown fox",
        "x " * 200,
        "   ",  # whitespace-only
    ]
)


@pytest.mark.parametrize("n", [2, 3, 8])
def test_flat_shingles_match_per_doc_reference(n):
    sh, n_sh = flat_shingle_hashes(FIXED_CORPUS, n)
    off = np.concatenate([[0], np.cumsum(n_sh)])
    for i, t in enumerate(FIXED_CORPUS):
        r = ref_shingles(t, n)
        got = sh[off[i] : off[i + 1]]
        assert np.array_equal(np.sort(r), np.sort(got)), (n, i)


def test_minhash_matrix_matches_per_doc():
    k = 16
    sigs = minhash_matrix(FIXED_CORPUS, k, 3)
    seeds = np.arange(1, k + 1, dtype=np.uint64) * _SEED_MIX
    for i, t in enumerate(FIXED_CORPUS):
        r = ref_shingles(t, 3)
        if r.size == 0:
            assert (sigs[i] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()
        else:
            exp = _fmix64(r[None, :] ^ seeds[:, None]).min(axis=1)
            assert np.array_equal(sigs[i], exp), i


def test_simhash_matches_per_doc_majority_vote():
    sv = simhash_values(FIXED_CORPUS)
    for i, t in enumerate(FIXED_CORPUS):
        toks = (t or "").split()
        if not toks:
            assert sv[i] == 0
            continue
        h = murmur3_x64_128_low64(pd.Series(toks))
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
        val = 0
        for b in np.nonzero(acc > 0)[0].tolist():
            val |= 1 << b
        val = val - (1 << 64) if val >= (1 << 63) else val
        assert sv[i] == val, i


def test_fingerprint_matches_per_doc_min():
    fp = fingerprint_values(FIXED_CORPUS, 8)
    for i, t in enumerate(FIXED_CORPUS):
        r = ref_shingles(t, 8)
        exp = 0 if r.size == 0 else int(r.min().astype(np.uint64).view(np.int64))
        assert fp[i] == exp, i


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(st.integers(0, 60), min_size=0, max_size=30),
        min_size=1,
        max_size=25,
    ),
    st.integers(2, 9),
)
def test_flat_shingles_random_corpora(token_counts, n):
    texts = pd.Series(
        [" ".join(f"t{v}" for v in doc) for doc in token_counts]
    )
    sh, n_sh = flat_shingle_hashes(texts, n)
    off = np.concatenate([[0], np.cumsum(n_sh)])
    assert sh.size == off[-1]
    for i, t in enumerate(texts):
        r = ref_shingles(t, n)
        got = sh[off[i] : off[i + 1]]
        assert np.array_equal(np.sort(r), np.sort(got))
