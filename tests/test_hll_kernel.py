"""HLL kernel reference-parity tests (SURVEY.md §5.2(1-2)).

The scalar model below is an independent straight-line re-implementation
of the register math in /root/reference/hll.go:428-507, used to verify
the vectorized kernel.
"""

import math

import numpy as np
import pytest

from hll_spark.sketchlib.hll import (
    EMPTY,
    EXPLICIT,
    FULL,
    SPARSE,
    HllConfig,
    HllSketch,
    _registers_from_hashes,
)

RNG = np.random.default_rng(42)


def scalar_register_update(hashes, log2m, regwidth):
    """Straightforward scalar model of hll.go:428-462."""
    m = 1 << log2m
    regs = [0] * m
    pw_max_mask_lsb = (1 << regwidth) - 2  # lsb position capped here
    for h in hashes:
        h = int(h) & 0xFFFFFFFFFFFFFFFF
        w = h >> log2m
        if w == 0:
            continue
        lsb = (w & -w).bit_length() - 1
        lsb = min(lsb, pw_max_mask_lsb)
        p_w = 1 + lsb
        j = h & (m - 1)
        regs[j] = max(regs[j], p_w)
    return np.array(regs, dtype=np.uint8)


@pytest.mark.parametrize("log2m,regwidth", [(4, 5), (11, 5), (14, 5), (10, 4), (6, 1), (5, 8)])
def test_register_math_matches_scalar_model(log2m, regwidth):
    cfg = HllConfig(log2m=log2m, regwidth=regwidth, expthresh=0, sparse_on=False)
    hashes = RNG.integers(0, 2**64, size=5000, dtype=np.uint64)
    # force some zero-substream values (w == 0 ignore path, hll.go:439-456)
    hashes[:10] = RNG.integers(0, 1 << log2m, size=10, dtype=np.uint64)
    s = HllSketch.empty(cfg)
    s.add_hashed(hashes)
    assert s.kind == FULL
    np.testing.assert_array_equal(s.regs, scalar_register_update(hashes, log2m, regwidth))


def test_pw_max_mask_clamps_register_value():
    # values with >= 2^rw-1 trailing zeros after the index bits must clamp
    cfg = HllConfig(log2m=4, regwidth=2, expthresh=0, sparse_on=False)
    s = HllSketch.empty(cfg)
    # h = 1 << 60 -> w = 1 << 56, lsb=56, but regwidth=2 caps p_w at 3
    s.add_hashed(np.array([1 << 60], dtype=np.uint64))
    assert s.regs[0] == 3  # 1 + (2^2 - 2)


def test_zero_hash_is_ignored_probabilistically():
    cfg = HllConfig(log2m=4, regwidth=5, expthresh=0, sparse_on=False)
    s = HllSketch.empty(cfg)
    s.add_hashed(np.array([0], dtype=np.uint64))
    assert s.estimate() == 0  # w == 0 never sets a register
    # ... but EXPLICIT stores raw value 0 as a real element
    cfg2 = HllConfig(log2m=11, regwidth=5)
    s2 = HllSketch.empty(cfg2)
    s2.add_hashed(np.array([0], dtype=np.uint64))
    assert s2.kind == EXPLICIT and s2.estimate() == 1


# -- thresholds (hll.go:260-294, SURVEY.md §1.3) ---------------------------


@pytest.mark.parametrize(
    "log2m,expected", [(11, 160), (14, 1280), (16, 5120)]
)
def test_explicit_auto_threshold(log2m, expected):
    assert HllConfig(log2m=log2m, regwidth=5).explicit_threshold == expected


@pytest.mark.parametrize(
    "log2m,expected", [(11, 512), (14, 4096), (16, 8192)]
)
def test_sparse_threshold_intended_formula(log2m, expected):
    # java-hll intended formula, NOT the Go port's integer-division bug
    assert HllConfig(log2m=log2m, regwidth=5).sparse_threshold == expected


def test_explicit_threshold_expthresh_modes():
    assert HllConfig(expthresh=0).explicit_threshold == 0
    assert HllConfig(expthresh=5).explicit_threshold == 16
    assert HllConfig(expthresh=18).explicit_threshold == 131072
    with pytest.raises(ValueError):
        HllConfig(expthresh=19)
    with pytest.raises(ValueError):
        HllConfig(log2m=3)
    with pytest.raises(ValueError):
        HllConfig(regwidth=9)


# -- promotion hierarchy ----------------------------------------------------


def test_promotion_chain_explicit_sparse_full():
    cfg = HllConfig(log2m=11, regwidth=5)  # explicit@160, sparse@512
    s = HllSketch.empty(cfg)
    vals = RNG.integers(1, 2**64, size=2000, dtype=np.uint64)
    s.add_hashed(vals[:100])
    assert s.kind == EXPLICIT and s.estimate() == len(set(vals[:100].tolist()))
    s.add_hashed(vals[100:300])  # past 160 -> SPARSE (<=512 registers)
    assert s.kind == SPARSE
    s.add_hashed(vals[300:])  # push register count past 512 -> FULL
    assert s.kind == FULL
    # final registers identical to a straight FULL build of the same data
    np.testing.assert_array_equal(s.regs, scalar_register_update(vals, 11, 5))


def test_promotion_skips_sparse_when_disabled():
    cfg = HllConfig(log2m=11, regwidth=5, sparse_on=False)
    s = HllSketch.empty(cfg)
    s.add_hashed(RNG.integers(1, 2**64, size=200, dtype=np.uint64))
    assert s.kind == FULL


def test_presized_constructor():
    cfg = HllConfig(log2m=11, regwidth=5)
    assert HllSketch.presized(cfg, 0).kind == EMPTY
    assert HllSketch.presized(cfg, 100).kind == EXPLICIT
    assert HllSketch.presized(cfg, 300).kind == SPARSE
    assert HllSketch.presized(cfg, 10**6).kind == FULL


def test_big_batch_fast_path_matches_incremental():
    cfg = HllConfig(log2m=11, regwidth=5)
    vals = RNG.integers(1, 2**64, size=50_000, dtype=np.uint64)
    one_shot = HllSketch.empty(cfg)
    one_shot.add_hashed(vals)  # triggers the direct-to-FULL shortcut
    incremental = HllSketch.empty(cfg)
    for i in range(0, len(vals), 97):
        incremental.add_hashed(vals[i : i + 97])
    assert one_shot.kind == incremental.kind == FULL
    np.testing.assert_array_equal(one_shot.regs, incremental.regs)


# -- estimator regimes (hll.go:517-560, util.go:117-233) --------------------


def test_small_range_correction():
    cfg = HllConfig(log2m=8, regwidth=5, expthresh=0, sparse_on=False)
    s = HllSketch.empty(cfg)
    s._init_storage(FULL)
    s.regs[:4] = 1  # V = 252 zero registers, estimator < 5m/2
    m = cfg.m
    expected = m * math.log(m / (m - 4))
    assert s.estimate_float() == pytest.approx(expected)


def test_raw_estimator_regime():
    cfg = HllConfig(log2m=8, regwidth=5, expthresh=0, sparse_on=False)
    s = HllSketch.empty(cfg)
    s._init_storage(FULL)
    s.regs[:] = 5  # no zeroes -> raw regime (if below large cutoff)
    indicator = cfg.m * 2.0**-5
    assert s.estimate_float() == pytest.approx(cfg.alpha_m_squared / indicator)


def test_large_range_correction():
    cfg = HllConfig(log2m=4, regwidth=5, expthresh=0, sparse_on=False)
    s = HllSketch.empty(cfg)
    s._init_storage(FULL)
    s.regs[:] = 27  # pushes estimator past 2^L/30 but below 2^L
    est = cfg.alpha_m_squared / (cfg.m * 2.0**-27)
    assert cfg.large_estimator_cutoff < est < cfg.two_to_l
    expected = -cfg.two_to_l * math.log(1 - est / cfg.two_to_l)
    assert s.estimate_float() == pytest.approx(expected)


def test_alpha_m_squared_constants():
    assert HllConfig(log2m=4).alpha_m_squared == pytest.approx(0.673 * 16 * 16)
    assert HllConfig(log2m=5).alpha_m_squared == pytest.approx(0.697 * 32 * 32)
    assert HllConfig(log2m=6).alpha_m_squared == pytest.approx(0.709 * 64 * 64)
    m = 2**14
    assert HllConfig(log2m=14).alpha_m_squared == pytest.approx(
        0.7213 / (1 + 1.079 / m) * m * m
    )


def test_sparse_estimator_equals_full_estimator():
    cfg = HllConfig(log2m=11, regwidth=5, expthresh=0)
    vals = RNG.integers(1, 2**64, size=400, dtype=np.uint64)
    sp = HllSketch.empty(cfg)
    sp.add_hashed(vals)
    assert sp.kind == SPARSE
    fu = HllSketch.presized(HllConfig(log2m=11, regwidth=5, expthresh=0, sparse_on=False), 10**6)
    fu.add_hashed(vals)
    assert sp.estimate_float() == pytest.approx(fu.estimate_float())


def test_ceil_semantics():
    # Cardinality() applies ceil to the float estimate (hll.go:413-415)
    cfg = HllConfig(log2m=11, regwidth=5, expthresh=0)
    s = HllSketch.empty(cfg)
    s.add_hashed(RNG.integers(1, 2**64, size=50, dtype=np.uint64))
    assert s.estimate() == math.ceil(s.estimate_float())


def test_registers_from_hashes_drops_zero_substream():
    cfg = HllConfig(log2m=8, regwidth=5)
    h = np.array([5, 256, 0], dtype=np.uint64)  # 5 -> w=0 dropped; 0 dropped
    j, pw = _registers_from_hashes(h, cfg)
    assert j.tolist() == [0] and pw.tolist() == [1]
