"""Theta (KMV) sketch: exact tier, KMV bound, byte-associative merges,
direct set-op estimates, and the Spark aggregation path."""

import numpy as np
import pandas as pd
import pytest

from hll_spark.sketchlib.theta import ThetaSketch


def _hashes(rng, n):
    return rng.integers(0, 2**64, size=n, dtype=np.uint64)


def test_exact_below_k():
    rng = np.random.default_rng(0)
    vals = _hashes(rng, 3000)
    s = ThetaSketch(k=4096).add_hashed(np.concatenate([vals, vals]))
    assert not s.full
    assert s.estimate() == len(np.unique(vals))


def test_kmv_bound_above_k():
    rng = np.random.default_rng(1)
    k = 4096
    for n in (50_000, 500_000):
        s = ThetaSketch(k=k).add_hashed(_hashes(rng, n))
        true_n = n  # 64-bit collisions negligible
        rel = abs(s.estimate_float() / true_n - 1)
        assert rel <= 4 / np.sqrt(k - 2), (n, rel)


def test_merge_byte_associative_any_order():
    rng = np.random.default_rng(2)
    parts = [_hashes(rng, n) for n in (10, 5000, 80, 12000)]

    def sk(vals):
        return ThetaSketch(k=1024).add_hashed(vals)

    all_vals = np.concatenate(parts)
    direct = sk(all_vals).to_bytes()
    left = sk(parts[0])
    for p in parts[1:]:
        left = left.union(sk(p))
    right = sk(parts[3]).union(sk(parts[2])).union(sk(parts[1]).union(sk(parts[0])))
    assert left.to_bytes() == right.to_bytes() == direct


def test_roundtrip_bytes():
    rng = np.random.default_rng(3)
    for n in (0, 10, 9000):
        s = ThetaSketch(k=512).add_hashed(_hashes(rng, n))
        back = ThetaSketch.from_bytes(s.to_bytes())
        assert back.k == s.k and back.full == s.full
        assert np.array_equal(back.values, s.values)
        assert back.to_bytes() == s.to_bytes()


def test_intersect_exact_when_not_full():
    rng = np.random.default_rng(4)
    common = _hashes(rng, 500)
    only_a, only_b = _hashes(rng, 700), _hashes(rng, 900)
    a = ThetaSketch(k=4096).add_hashed(np.concatenate([common, only_a]))
    b = ThetaSketch(k=4096).add_hashed(np.concatenate([common, only_b]))
    assert a.intersect_estimate(b) == len(np.unique(common))
    assert a.difference_estimate(b) == len(np.unique(only_a))


def test_intersect_beats_inclusion_exclusion_for_small_overlap():
    """Large disjoint-ish sets, tiny true intersection: theta's direct
    estimate must land near truth where HLL-style inclusion-exclusion
    error (driven by the union size) would swamp it."""
    rng = np.random.default_rng(5)
    k = 4096
    common = _hashes(rng, 2000)
    a = ThetaSketch(k=k).add_hashed(np.concatenate([common, _hashes(rng, 400_000)]))
    b = ThetaSketch(k=k).add_hashed(np.concatenate([common, _hashes(rng, 400_000)]))
    est = a.intersect_estimate(b)
    # direct-estimate error scales with the union (theta sample), but is
    # unbiased; inclusion-exclusion at p=14 HLL on 800k unions has
    # sigma ~ 0.81% * 3 * 800k ~ 20k — assert we do far better than that
    assert abs(est - 2000) < 6000


def test_mismatched_k_raises():
    a, b = ThetaSketch(k=512), ThetaSketch(k=1024)
    with pytest.raises(ValueError):
        a.union(b)


def test_spark_theta_agg_matches_kernel(spark):
    from hll_spark.operators.sketches import theta_estimate_udf, theta_sketch_agg

    pdf = pd.DataFrame({"v": [f"item-{i % 1200}" for i in range(20_000)]})
    df = spark.createDataFrame(pdf).repartition(8)
    row = (
        theta_sketch_agg(df, "v", k=4096)
        .withColumn("est", theta_estimate_udf()("sketch"))
        .collect()[0]
    )
    assert row["est"] == 1200.0  # exact tier
    assert row["rows_seen"] == 20_000


def test_spark_theta_partition_invariance(spark):
    from hll_spark.operators.sketches import theta_sketch_agg

    pdf = pd.DataFrame({"v": [f"u{i % 50_000}" for i in range(120_000)]})
    blobs = []
    for parts in (2, 16):
        df = spark.createDataFrame(pdf).repartition(parts)
        blobs.append(bytes(theta_sketch_agg(df, "v", k=1024).collect()[0]["sketch"]))
    assert blobs[0] == blobs[1]  # byte-identical at any partitioning


def test_error_bound_properties():
    from hll_spark.sketchlib.hll import HllConfig

    assert abs(HllConfig(log2m=14).error_bound - 1.04 / 128) < 1e-12
    assert abs(ThetaSketch(k=4096).error_bound - (4094 ** -0.5)) < 1e-12


def test_from_bytes_rejects_corrupt_input():
    import pytest as _pytest

    s = ThetaSketch(k=64).add_hashed(
        np.arange(10, dtype=np.uint64) * np.uint64(7919)
    )
    blob = s.to_bytes()
    with _pytest.raises(ValueError):
        ThetaSketch.from_bytes(b"\x00\x01\x02\x03" + blob[4:])  # bad magic
    # truncated payload: frombuffer must fail loudly, not mis-read
    with _pytest.raises(ValueError):
        ThetaSketch.from_bytes(blob[: len(blob) - 5])


def test_kmv_bound_large_n_real_hashes():
    """Estimation-tier accuracy at n >= 10^6 with REAL hash values (the
    pipeline's own 64-bit finalizer over sequential ids), mirroring the
    rigor of test_hll_bounds.py: |est/n - 1| <= 4*rse, with the sketch
    built incrementally in partition-shaped chunks as the Spark
    aggregation path does."""
    from hll_spark.sketchlib.hashing import hash64_long

    n = 2_000_000
    h = hash64_long(np.arange(n, dtype=np.int64))
    for k in (1024, 4096):
        s = ThetaSketch(k=k)
        for i in range(0, n, 250_000):
            s.add_hashed(h[i : i + 250_000])
        assert s.full
        rel = abs(s.estimate_float() / n - 1)
        assert rel <= 4 / np.sqrt(k - 2), (k, rel)


def test_theta_jaccard_udf(spark):
    import pyspark.sql.functions as F

    from hll_spark.operators.sketches import theta_jaccard_udf, theta_sketch_agg

    # exact tier: A = 0..99, B = 50..149 -> jaccard = 50/150
    a = theta_sketch_agg(spark.range(0, 100), "id", k=4096).select(
        F.col("sketch").alias("sa")
    )
    b = theta_sketch_agg(spark.range(50, 150), "id", k=4096).select(
        F.col("sketch").alias("sb")
    )
    got = (
        a.crossJoin(b)
        .select(theta_jaccard_udf()(F.col("sa"), F.col("sb")).alias("j"))
        .collect()[0]["j"]
    )
    assert abs(got - 50 / 150) < 1e-12

    # disjoint sets -> 0; identical sets -> 1
    c = theta_sketch_agg(spark.range(1000, 1100), "id", k=4096).select(
        F.col("sketch").alias("sb")
    )
    got0 = (
        a.crossJoin(c)
        .select(theta_jaccard_udf()(F.col("sa"), F.col("sb")).alias("j"))
        .collect()[0]["j"]
    )
    assert got0 == 0.0
    got1 = (
        a.crossJoin(a.select(F.col("sa").alias("sb")))
        .select(theta_jaccard_udf()(F.col("sa"), F.col("sb")).alias("j"))
        .collect()[0]["j"]
    )
    assert got1 == 1.0
