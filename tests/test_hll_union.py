"""Union semantics: 4x4 type matrix, commutativity, associativity,
idempotence (SURVEY.md §5.2(1); reference hll.go:568-809)."""

import itertools

import numpy as np
import pytest

from hll_spark.sketchlib.hll import (
    EMPTY,
    EXPLICIT,
    FULL,
    SPARSE,
    HllConfig,
    HllSketch,
    hll_intersect_estimate,
    hll_union_all,
)

RNG = np.random.default_rng(123)
CFG = HllConfig(log2m=11, regwidth=5)  # explicit@160, sparse@512

# element counts that land each sketch in the wanted tier
TIER_N = {EMPTY: 0, EXPLICIT: 50, SPARSE: 300, FULL: 5000}


def make(kind, seed):
    rng = np.random.default_rng(seed)
    s = HllSketch.empty(CFG)
    n = TIER_N[kind]
    if n:
        s.add_hashed(rng.integers(1, 2**64, size=n, dtype=np.uint64))
    assert s.kind == kind
    return s


def reference_build(*value_arrays):
    """Ground truth: single sketch over the concatenated values."""
    s = HllSketch.empty(CFG)
    if value_arrays:
        s.add_hashed(np.concatenate(value_arrays))
    return s


@pytest.mark.parametrize(
    "kind_a,kind_b", list(itertools.product(TIER_N.keys(), TIER_N.keys()))
)
def test_union_matrix_matches_single_build(kind_a, kind_b):
    rng_a, rng_b = np.random.default_rng(1), np.random.default_rng(2)
    va = rng_a.integers(1, 2**64, size=TIER_N[kind_a], dtype=np.uint64)
    vb = rng_b.integers(1, 2**64, size=TIER_N[kind_b], dtype=np.uint64)
    a = HllSketch.empty(CFG)
    a.add_hashed(va)
    b = HllSketch.empty(CFG)
    b.add_hashed(vb)
    assert a.kind == kind_a and b.kind == kind_b
    a.union(b)
    expected = reference_build(va, vb)
    # unions replay/max-merge, so the result must byte-equal a single
    # build over the union of the inputs (exact associativity)
    assert a.to_bytes() == expected.to_bytes()


def test_union_commutative_byte_equal():
    for ka, kb in itertools.product(TIER_N, TIER_N):
        a1, b1 = make(ka, 10), make(kb, 20)
        a2, b2 = make(ka, 10), make(kb, 20)
        ab = a1.union(b1).to_bytes()
        ba = b2.union(a2).to_bytes()
        assert ab == ba, f"{ka} ∪ {kb} not commutative"


def test_union_associative_byte_equal():
    vals = [
        np.random.default_rng(s).integers(1, 2**64, size=n, dtype=np.uint64)
        for s, n in [(1, 10), (2, 400), (3, 3000)]
    ]
    sketches = []
    for v in vals:
        s = HllSketch.empty(CFG)
        s.add_hashed(v)
        sketches.append(s.to_bytes())
    import itertools as it

    results = set()
    for perm in it.permutations(sketches):
        results.add(hll_union_all(list(perm)))
    assert len(results) == 1


def test_union_idempotent():
    s = make(FULL, 99)
    blob = s.to_bytes()
    s.union(HllSketch.from_bytes(blob))
    assert s.to_bytes() == blob


def test_union_rejects_mismatched_params():
    a = HllSketch.empty(HllConfig(log2m=11, regwidth=5))
    b = HllSketch.empty(HllConfig(log2m=14, regwidth=5))
    with pytest.raises(ValueError, match="different"):
        a.union(b)


def test_union_all_empty_input():
    blob = hll_union_all([], CFG)
    assert HllSketch.from_bytes(blob).estimate() == 0


def test_intersect_estimate_inclusion_exclusion():
    rng = np.random.default_rng(5)
    shared = rng.integers(1, 2**64, size=60, dtype=np.uint64)
    only_a = rng.integers(1, 2**64, size=40, dtype=np.uint64)
    only_b = rng.integers(1, 2**64, size=30, dtype=np.uint64)
    a = HllSketch.empty(CFG)
    a.add_hashed(np.concatenate([shared, only_a]))
    b = HllSketch.empty(CFG)
    b.add_hashed(np.concatenate([shared, only_b]))
    est = hll_intersect_estimate(a.to_bytes(), b.to_bytes())
    assert est == pytest.approx(60, abs=1)  # EXPLICIT tier: exact-ish
