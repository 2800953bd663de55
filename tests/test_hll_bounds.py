"""Error-bound tests — the north_rule accuracy criterion (SURVEY.md §5.2(2)).

Assert |est/n - 1| <= 3 * 1.04/sqrt(m) on seeded streams at p=14
(published HLL bound: /root/reference/README.md:14-16)."""

import numpy as np
import pytest

from hll_spark.sketchlib.hll import EXPLICIT, HllConfig, HllSketch


@pytest.mark.parametrize("n", [10_000, 100_000, 1_000_000])
def test_full_tier_error_bound_p14(n):
    cfg = HllConfig(log2m=14, regwidth=5)
    rng = np.random.default_rng(42 + n)
    # draw from a huge space: collisions negligible, so n == true distinct
    vals = rng.integers(1, 2**64, size=n, dtype=np.uint64)
    true_n = len(np.unique(vals))
    s = HllSketch.empty(cfg)
    s.add_hashed(vals)
    bound = 3 * 1.04 / np.sqrt(cfg.m)  # 3 sigma ≈ 2.44% at p=14
    rel_err = abs(s.estimate() / true_n - 1.0)
    assert rel_err <= bound, f"n={n}: rel_err={rel_err:.4%} > {bound:.4%}"


def test_explicit_tier_is_exact():
    cfg = HllConfig(log2m=14, regwidth=5)  # explicit threshold 1280
    rng = np.random.default_rng(9)
    vals = rng.integers(1, 2**64, size=1000, dtype=np.uint64)
    s = HllSketch.empty(cfg)
    s.add_hashed(np.concatenate([vals, vals]))  # duplicates ignored
    assert s.kind == EXPLICIT
    assert s.estimate() == len(np.unique(vals))


@pytest.mark.parametrize("log2m", [11, 16])
def test_error_bound_other_precisions(log2m):
    cfg = HllConfig(log2m=log2m, regwidth=5)
    rng = np.random.default_rng(log2m)
    n = 200_000
    vals = rng.integers(1, 2**64, size=n, dtype=np.uint64)
    s = HllSketch.empty(cfg)
    s.add_hashed(vals)
    bound = 3 * 1.04 / np.sqrt(cfg.m)
    assert abs(s.estimate() / n - 1.0) <= bound
