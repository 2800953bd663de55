"""Count-min sketch bound tests (SURVEY.md §5.2(5), §2.3)."""

import numpy as np
import pytest

from hll_spark.sketchlib.cms import CountMinSketch
from hll_spark.sketchlib.hashing import hash64_long


def zipf_stream(n, n_keys, seed=0):
    rng = np.random.default_rng(seed)
    keys = rng.zipf(1.3, size=n) % n_keys
    return hash64_long(keys.astype(np.int64)), keys


def test_never_underestimates_and_eps_bound():
    hashed, keys = zipf_stream(100_000, 5000)
    cms = CountMinSketch(depth=5, width=2048)
    cms.add_hashed(hashed)
    uniq, true_counts = np.unique(keys, return_counts=True)
    est = cms.query_hashed(hash64_long(uniq.astype(np.int64)))
    assert (est.astype(np.int64) >= true_counts).all(), "CMS underestimated"
    # eps*N overestimate bound, allow the delta failure slack generously
    bound = cms.epsilon * cms.n_items
    over = est.astype(np.int64) - true_counts
    assert (over <= bound).mean() >= 1 - 2 * cms.delta


def test_merge_is_exact_addition():
    h1, _ = zipf_stream(10_000, 500, seed=1)
    h2, _ = zipf_stream(10_000, 500, seed=2)
    a = CountMinSketch(4, 1024)
    a.add_hashed(h1)
    b = CountMinSketch(4, 1024)
    b.add_hashed(h2)
    both = CountMinSketch(4, 1024)
    both.add_hashed(np.concatenate([h1, h2]))
    merged = a.merge(b)
    np.testing.assert_array_equal(merged.table, both.table)
    assert merged.to_bytes() == both.to_bytes()


def test_merge_associative_byte_equal():
    parts = [zipf_stream(5000, 300, seed=s)[0] for s in range(4)]
    import itertools

    blobs = set()
    for perm in itertools.permutations(range(4)):
        acc = CountMinSketch(4, 512)
        for i in perm:
            other = CountMinSketch(4, 512)
            other.add_hashed(parts[i])
            acc.merge(other)
        blobs.add(acc.to_bytes())
    assert len(blobs) == 1


def test_weighted_updates():
    cms = CountMinSketch(4, 256)
    h = hash64_long(np.array([7], dtype=np.int64))
    cms.add_hashed(h, counts=np.array([42], dtype=np.uint64))
    assert int(cms.query_hashed(h)[0]) == 42
    assert cms.n_items == 42


def test_serialization_roundtrip():
    hashed, _ = zipf_stream(5000, 100)
    cms = CountMinSketch(3, 128)
    cms.add_hashed(hashed)
    back = CountMinSketch.from_bytes(cms.to_bytes())
    np.testing.assert_array_equal(back.table, cms.table)
    assert back.n_items == cms.n_items
    assert back.to_bytes() == cms.to_bytes()


def test_merge_rejects_mismatched_params():
    with pytest.raises(ValueError):
        CountMinSketch(4, 256).merge(CountMinSketch(4, 512))
