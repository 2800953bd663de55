"""Misra-Gries frequent-items summary: exactness regime, mergeable error
bounds, heavy-hitter guarantee, serialization, and the Spark agg path."""

import numpy as np
import pandas as pd
import pytest

from hll_spark.sketchlib.mg import MisraGries


def _zipf_stream(rng, n, n_distinct=10_000, a=1.3):
    vals = rng.zipf(a, size=n) % n_distinct
    return pd.Series(vals).astype(str)


def test_exact_when_under_capacity():
    s = MisraGries(k=64)
    data = [f"item{i % 20}" for i in range(10_000)]
    s.update(data)
    assert s.offset == 0
    for i in range(20):
        assert s.estimate(f"item{i}") == 500


def test_never_overestimates_and_error_bounded():
    rng = np.random.default_rng(3)
    stream = _zipf_stream(rng, 200_000)
    true = stream.value_counts()
    s = MisraGries(k=128)
    for i in range(0, len(stream), 10_000):
        s.update(stream.iloc[i : i + 10_000])
    assert s.offset <= len(stream) / (s.k + 1)
    for item, est in s.items():
        t = int(true.get(item, 0))
        assert est <= t <= est + s.offset, (item, est, t)


def test_heavy_hitters_always_present():
    """Any item with true frequency > n/(k+1) must survive pruning."""
    rng = np.random.default_rng(4)
    stream = _zipf_stream(rng, 300_000)
    s = MisraGries(k=64)
    s.update(stream)
    true = stream.value_counts()
    thresh = len(stream) / (s.k + 1)
    for item, t in true.items():
        if t > thresh:
            assert s.estimate(item) > 0, (item, t, thresh)


def test_merge_matches_single_pass_bounds():
    """Partition-wise build + merges keeps the mergeability bound:
    offset <= n/(k+1) and per-item sandwich holds for ANY split."""
    rng = np.random.default_rng(5)
    stream = _zipf_stream(rng, 120_000)
    true = stream.value_counts()
    for n_parts in (2, 7, 16):
        parts = np.array_split(stream, n_parts)
        merged = MisraGries(k=96)
        for p in parts:
            merged.merge(MisraGries(k=96).update(p))
        assert merged.n_items == len(stream)
        assert merged.offset <= len(stream) / (merged.k + 1)
        for item, est in merged.items():
            t = int(true.get(item, 0))
            assert est <= t <= est + merged.offset


def test_bytes_roundtrip_and_determinism():
    rng = np.random.default_rng(6)
    s = MisraGries(k=32).update(_zipf_stream(rng, 50_000))
    blob = s.to_bytes()
    back = MisraGries.from_bytes(blob)
    assert back.counts == s.counts
    assert (back.k, back.n_items, back.offset) == (s.k, s.n_items, s.offset)
    assert back.to_bytes() == blob  # canonical ordering -> byte-stable


def test_from_bytes_rejects_corrupt():
    s = MisraGries(k=8).update(["a", "b", "a"])
    blob = s.to_bytes()
    with pytest.raises(ValueError):
        MisraGries.from_bytes(blob[:10])
    with pytest.raises(ValueError):
        MisraGries.from_bytes(b"\x00" * len(blob))
    with pytest.raises(ValueError):
        MisraGries.from_bytes(blob[:-4])


def test_mismatched_k_raises():
    with pytest.raises(ValueError):
        MisraGries(k=8).merge(MisraGries(k=16))


def test_spark_mg_matches_kernel(spark):
    """Distributed MG over 8 partitions == driver-side kernel result in
    the exact regime; estimation regime keeps the bound."""
    from hll_spark.operators.sketches import mg_top_items

    pdf = pd.DataFrame(
        {"w": [f"tok{i % 40}" for i in range(40_000)]}
    )
    df = spark.createDataFrame(pdf).repartition(8)
    got = {
        r.item: (r.count_lb, r.error_bound)
        for r in mg_top_items(df, "w", top_n=40, k=64).collect()
    }
    assert got == {f"tok{i}": (1000, 0) for i in range(40)}

    # estimation regime: k=16 < 40 distinct — bounds still hold
    rows = mg_top_items(df, "w", top_n=16, k=16).collect()
    for r in rows:
        assert r.count_lb <= 1000 <= r.count_lb + r.error_bound
        assert r.error_bound <= 40_000 / (16 + 1)


def test_spark_mg_grouped(spark):
    """Per-group MG summaries: one summary per key, each exact in the
    under-capacity regime."""
    from hll_spark.operators.sketches import mg_top_items

    pdf = pd.DataFrame(
        {
            "grp": ["a"] * 6000 + ["b"] * 3000,
            "w": [f"x{i % 3}" for i in range(6000)]
            + [f"y{i % 2}" for i in range(3000)],
        }
    )
    df = spark.createDataFrame(pdf).repartition(6)
    rows = mg_top_items(df, "w", top_n=5, k=32, by=["grp"]).collect()
    got = {(r.grp, r.item): (r.count_lb, r.error_bound) for r in rows}
    assert got == {
        ("a", "x0"): (2000, 0), ("a", "x1"): (2000, 0), ("a", "x2"): (2000, 0),
        ("b", "y0"): (1500, 0), ("b", "y1"): (1500, 0),
    }


def test_from_bytes_rejects_trailing_garbage_and_zero_counts():
    import struct

    s = MisraGries(k=8).update(["a", "b", "a"])
    blob = s.to_bytes()
    with pytest.raises(ValueError, match="trailing"):
        MisraGries.from_bytes(blob + b"junk")
    # hand-craft a blob with a zero counter
    bad = struct.pack("<IIQQI", 0x4D475331, 8, 1, 0, 1)
    bad += struct.pack("<I", 1) + b"z" + struct.pack("<Q", 0)
    with pytest.raises(ValueError, match="non-positive"):
        MisraGries.from_bytes(bad)
