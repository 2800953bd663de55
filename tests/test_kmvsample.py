"""Bottom-k distinct sample (KMV with payload): exactness regime,
partition/duplication invariance, byte-exact merges, serialization."""

import numpy as np
import pandas as pd
import pytest

from hll_spark.sketchlib.kmvsample import BottomKSample


def test_exact_when_distinct_under_k():
    s = BottomKSample(k=64).update([f"v{i % 20}" for i in range(5000)])
    assert s.is_exact
    assert sorted(s.sample()) == sorted(f"v{i}" for i in range(20))


def test_duplication_cannot_bias():
    """A value repeated 10^5 times has the same standing as a singleton."""
    a = BottomKSample(k=16).update([f"v{i}" for i in range(1000)])
    b = BottomKSample(k=16).update(
        ["v0"] * 100_000 + [f"v{i}" for i in range(1, 1000)]
    )
    assert a.to_bytes() == b.to_bytes()
    assert not a.is_exact and len(a.sample()) == 16


def test_split_merge_matches_single_pass_bytes():
    vals = [f"item{i}" for i in range(5000)]
    single = BottomKSample(k=128).update(vals)
    for n_parts in (2, 7, 16):
        merged = BottomKSample(k=128)
        for part in np.array_split(np.array(vals), n_parts):
            merged.merge(BottomKSample(k=128).update(part))
        assert merged.to_bytes() == single.to_bytes()


def test_sample_is_uniform_over_distinct():
    """Inclusion frequency across disjoint universes is ~k/N each (the
    hash permutation argument): chi-square-ish tolerance check."""
    per_bucket = []
    for bucket in range(5):
        vals = [f"u{bucket}_{i}" for i in range(2000)]
        s = BottomKSample(k=500).update(
            [v for v in vals for _ in range(1 + bucket)]  # skewed dup counts
        )
        per_bucket.append(len(s.sample()))
    assert all(n == 500 for n in per_bucket)
    # pooled universe: each bucket contributes ~1/5 of the pooled sample
    pooled = BottomKSample(k=500).update(
        [f"u{b}_{i}" for b in range(5) for i in range(2000)]
    )
    from collections import Counter

    by_bucket = Counter(it.split("_")[0] for it in pooled.sample())
    for b in range(5):
        assert 60 <= by_bucket[f"u{b}"] <= 140  # expect 100 +- 4 sigma


def test_bytes_roundtrip_and_corrupt_rejection():
    s = BottomKSample(k=32).update([f"x{i}" for i in range(100)])
    blob = s.to_bytes()
    back = BottomKSample.from_bytes(blob)
    assert back.sample() == s.sample() and back.full == s.full
    assert back.to_bytes() == blob
    for bad in (blob[:8], blob[:-2], blob + b"z", b"\x00" * len(blob)):
        with pytest.raises(ValueError):
            BottomKSample.from_bytes(bad)


def test_mismatched_k_raises():
    with pytest.raises(ValueError):
        BottomKSample(k=8).merge(BottomKSample(k=16))


def test_spark_distinct_sample_partition_invariance(spark):
    from hll_spark.operators.sketches import distinct_sample

    pdf = pd.DataFrame({"w": [f"tok{i % 300}" for i in range(30_000)]})
    outs = []
    for parts in (2, 16):
        df = spark.createDataFrame(pdf).repartition(parts)
        rows = distinct_sample(df, "w", k=50).collect()
        assert all(not r.is_exact for r in rows)
        outs.append(sorted(r.item for r in rows))
    assert outs[0] == outs[1] and len(outs[0]) == 50

    # exact regime: k above distinct count -> the full distinct set
    df = spark.createDataFrame(pdf).repartition(8)
    rows = distinct_sample(df, "w", k=512).collect()
    assert sorted(r.item for r in rows) == sorted(f"tok{i}" for i in range(300))
    assert all(r.is_exact for r in rows)
