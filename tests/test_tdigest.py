"""t-digest accuracy tests: tail quantiles, merge permutations."""

import itertools

import numpy as np
import pytest

from hll_spark.sketchlib.tdigest import TDigest


def quantile_close(sketch, data, q, rank_tol):
    v = sketch.quantile(q)
    data_sorted = np.sort(data)
    true_rank = np.searchsorted(data_sorted, v, side="right") / len(data)
    assert abs(true_rank - q) <= rank_tol, (
        f"q={q}: est {v:.4f} has rank {true_rank:.4f}"
    )


@pytest.mark.parametrize("dist", ["uniform", "normal", "lognormal"])
def test_quantile_accuracy(dist):
    rng = np.random.default_rng(abs(hash(dist)) % 2**32)
    n = 200_000
    data = {
        "uniform": lambda: rng.uniform(0, 1, n),
        "normal": lambda: rng.normal(0, 1, n),
        "lognormal": lambda: rng.lognormal(0, 2, n),
    }[dist]()
    t = TDigest(delta=200)
    for i in range(0, n, 10_000):
        t.update(data[i : i + 10_000])
    # tails are t-digest's strength: tighter tolerance there
    quantile_close(t, data, 0.01, 0.005)
    quantile_close(t, data, 0.99, 0.005)
    quantile_close(t, data, 0.5, 0.02)


def test_centroid_count_bounded():
    rng = np.random.default_rng(1)
    t = TDigest(delta=100)
    t.update(rng.normal(0, 1, 500_000))
    t._flush()
    assert t.means.size <= 2 * 100  # ~delta centroids, 2x slack


def test_merge_bound_under_permuted_orders():
    rng = np.random.default_rng(2)
    parts = [rng.normal(i * 2, 1, 40_000) for i in range(3)]
    data = np.concatenate(parts)
    for perm in itertools.permutations(range(3)):
        acc = TDigest(delta=200)
        for i in perm:
            o = TDigest(delta=200)
            o.update(parts[i])
            acc.merge(o)
        assert acc.n == pytest.approx(len(data))
        quantile_close(acc, data, 0.5, 0.03)
        quantile_close(acc, data, 0.99, 0.01)


def test_weight_conserved():
    rng = np.random.default_rng(3)
    t = TDigest(delta=150)
    t.update(rng.uniform(0, 1, 77_777))
    t._flush()
    assert t.weights.sum() == pytest.approx(77_777)


def test_exact_on_tiny_input():
    t = TDigest(delta=200)
    t.update(np.array([1.0, 2.0, 3.0]))
    assert 1.0 <= t.quantile(0.5) <= 3.0
    assert t.quantile(0.0) == 1.0
    assert t.quantile(1.0) == 3.0


def test_serialization_roundtrip():
    rng = np.random.default_rng(4)
    t = TDigest(delta=120)
    t.update(rng.normal(5, 3, 60_000))
    blob = t.to_bytes()
    back = TDigest.from_bytes(blob)
    assert back.to_bytes() == blob
    assert back.quantile(0.9) == t.quantile(0.9)


def test_merge_rejects_mismatched_delta():
    with pytest.raises(ValueError):
        TDigest(100).merge(TDigest(200))
