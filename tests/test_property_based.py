"""Hypothesis property tests over the full parameter grid (SURVEY.md §5.2)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from hll_spark.sketchlib.hll import HllConfig, HllSketch

params = st.tuples(
    st.integers(4, 18),            # log2m kept moderate so tests stay fast
    st.integers(1, 8),             # regwidth
    st.sampled_from([-1, 0, 1, 5, 12, 18]),  # expthresh
    st.booleans(),                 # sparse_on
)


@settings(max_examples=40, deadline=None)
@given(params, st.integers(0, 2**32 - 1), st.integers(0, 3000))
def test_serialize_roundtrip_any_params(p, seed, n):
    log2m, regwidth, expthresh, sparse_on = p
    cfg = HllConfig(log2m, regwidth, expthresh, sparse_on)
    s = HllSketch.empty(cfg)
    if n:
        rng = np.random.default_rng(seed)
        s.add_hashed(rng.integers(0, 2**64, size=n, dtype=np.uint64))
    blob = s.to_bytes()
    back = HllSketch.from_bytes(blob)
    assert back.kind == s.kind
    assert back.cfg == cfg
    assert back.to_bytes() == blob
    assert back.estimate() == s.estimate()


@settings(max_examples=500, deadline=None)
@given(
    st.integers(4, 16),
    st.integers(1, 8),
    st.integers(0, 2**32 - 1),
    st.integers(0, 800),
    st.integers(0, 800),
)
def test_union_commutes_any_params(log2m, regwidth, seed, na, nb):
    cfg = HllConfig(log2m, regwidth)
    rng = np.random.default_rng(seed)
    va = rng.integers(0, 2**64, size=na, dtype=np.uint64)
    vb = rng.integers(0, 2**64, size=nb, dtype=np.uint64)

    def sk(vals):
        s = HllSketch.empty(cfg)
        if len(vals):
            s.add_hashed(vals)
        return s

    ab = sk(va).union(sk(vb)).to_bytes()
    ba = sk(vb).union(sk(va)).to_bytes()
    both = sk(np.concatenate([va, vb]) if na + nb else va)
    assert ab == ba == both.to_bytes()


@settings(max_examples=30, deadline=None)
@given(st.integers(4, 30), st.integers(1, 8), st.sampled_from([-1, 0, 3, 18]), st.booleans())
def test_header_roundtrip_everything(log2m, regwidth, expthresh, sparse_on):
    cfg = HllConfig(log2m, regwidth, expthresh, sparse_on)
    for kind in (1, 2, 3, 4):
        parsed, k = HllConfig.from_header(cfg.header_bytes(kind))
        assert k == kind and parsed == cfg


def test_union_commutes_regression_near_threshold():
    """Round-1 Hypothesis falsifier: log2m=4, regwidth=4, seed=0, na=1, nb=8.

    The batch EXPLICIT-overflow fast-path used to promote straight to FULL
    (header 0x14) while the sequential path stayed SPARSE (header 0x13); the
    promotion decision must use non-zero-register count (hll.go:381-390).
    """
    cfg = HllConfig(4, 4)
    rng = np.random.default_rng(0)
    va = rng.integers(0, 2**64, size=1, dtype=np.uint64)
    vb = rng.integers(0, 2**64, size=8, dtype=np.uint64)

    def sk(vals):
        s = HllSketch.empty(cfg)
        if len(vals):
            s.add_hashed(vals)
        return s

    ab = sk(va).union(sk(vb)).to_bytes()
    ba = sk(vb).union(sk(va)).to_bytes()
    both = sk(np.concatenate([va, vb])).to_bytes()
    assert ab == ba == both

    # batch insert == sequential one-at-a-time insert, byte-for-byte
    seq = HllSketch.empty(cfg)
    for v in np.concatenate([va, vb]):
        seq.add_hashed(np.array([v], dtype=np.uint64))
    assert seq.to_bytes() == both


@settings(max_examples=200, deadline=None)
@given(
    st.integers(4, 16),
    st.integers(1, 8),
    st.integers(0, 2**32 - 1),
    st.integers(0, 400),
    st.integers(0, 400),
    st.integers(0, 400),
)
def test_union_associates_any_params(log2m, regwidth, seed, na, nb, nc):
    """union(union(a,b),c) == union(a,union(b,c)) == build(a+b+c),
    byte-for-byte — the invariant the distributed tree merge and
    checkpoint resume are built on (north_rule: merge associativity)."""
    cfg = HllConfig(log2m, regwidth)
    rng = np.random.default_rng(seed)
    va, vb, vc = (
        rng.integers(0, 2**64, size=n, dtype=np.uint64) for n in (na, nb, nc)
    )

    def sk(vals):
        s = HllSketch.empty(cfg)
        if len(vals):
            s.add_hashed(vals)
        return s

    left = sk(va).union(sk(vb)).union(sk(vc)).to_bytes()
    right = sk(va).union(sk(vb).union(sk(vc))).to_bytes()
    allv = np.concatenate([va, vb, vc])
    direct = sk(allv).to_bytes()
    assert left == right == direct
