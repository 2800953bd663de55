"""Mirror of the reference's example benchmark (example/main.go:32-89):
40M random uint64 adds at log2m=14/regwidth=5, then estimate, serialize,
roundtrip, and union — with assertions the reference never had.

The reference publishes "millions of inserts per second" for the FULL
representation (README.md:52); we assert a conservative floor that holds
even under this sandbox's noisy CPU.
"""

import time

import numpy as np
import pytest

from hll_spark.sketchlib.hll import FULL, HllConfig, HllSketch

N = 40_000_000
CFG = HllConfig(log2m=14, regwidth=5)


@pytest.fixture(scope="module")
def stream():
    rng = np.random.default_rng(2016)
    return rng.integers(0, 2**63, size=N, dtype=np.uint64)


def test_40m_adds_throughput_and_accuracy(stream):
    s = HllSketch.presized(CFG, N)
    t0 = time.perf_counter()
    for i in range(0, N, 1_000_000):
        s.add_hashed(stream[i : i + 1_000_000])
    wall = time.perf_counter() - t0
    rate = N / wall
    assert rate >= 5_000_000, f"insert rate {rate/1e6:.1f}M/s below floor"
    assert s.kind == FULL
    est = s.estimate()
    # 40M draws from 2^63: distinct ≈ N; bound 3*1.04/sqrt(2^14)
    assert abs(est / N - 1) <= 3 * 1.04 / np.sqrt(CFG.m)
    # serialize (10240+3 bytes, example/main.go:44) -> roundtrip -> union
    blob = s.to_bytes()
    assert len(blob) == 3 + (CFG.regwidth * CFG.m) // 8
    twin = HllSketch.from_bytes(blob)
    assert twin.estimate() == est
    s.union(twin)
    assert s.to_bytes() == blob  # self-union idempotent (hll_test.go:98-101)


def test_union_of_independent_40m_streams_accuracy(stream):
    # mirrors the second half of the reference example: union of two
    # independent streams estimates the combined cardinality
    half = N // 8  # 5M each keeps the test quick
    a = HllSketch.presized(CFG, half)
    a.add_hashed(stream[:half])
    rng2 = np.random.default_rng(99)
    other = rng2.integers(0, 2**63, size=half, dtype=np.uint64)
    b = HllSketch.presized(CFG, half)
    b.add_hashed(other)
    a.union(b)
    assert abs(a.estimate() / (2 * half) - 1) <= 3 * 1.04 / np.sqrt(CFG.m)
