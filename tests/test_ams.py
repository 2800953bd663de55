"""Fast-AMS sketch: F2 / join-size accuracy bounds, mergeability,
serialization, and the Spark-level join planner."""

import numpy as np
import pytest

from hll_spark.sketchlib.ams import AmsSketch
from hll_spark.sketchlib.hashing import murmur3_finalizer_u64

_G = np.uint64(0x9E3779B97F4A7C15)


def _hashes(n, salt=1):
    k = np.arange(n, dtype=np.uint64)
    return murmur3_finalizer_u64(k * _G + np.uint64(salt))


def test_f2_uniform_within_bound():
    h = _hashes(200_000)
    s = AmsSketch(depth=7, width=1024, seed=3)
    s.add_hashed(h)
    F2 = 200_000.0
    assert abs(s.f2() - F2) <= 4 * s.error_bound()
    assert s.n_items == 200_000


def test_f2_zipf_weighted_within_bound():
    f = (50_000 / (np.arange(1, 10_001) ** 0.8)).astype(np.int64) + 1
    h = _hashes(10_000, salt=9)
    F2 = float((f.astype(np.float64) ** 2).sum())
    s = AmsSketch(depth=7, width=1024, seed=3)
    s.add_hashed(h, f)
    assert abs(s.f2() - F2) <= 4 * s.error_bound()


def test_weighted_equals_repeated_adds():
    h = _hashes(50, salt=4)
    f = np.arange(1, 51, dtype=np.int64)
    a = AmsSketch(5, 256, 1)
    a.add_hashed(h, f)
    b = AmsSketch(5, 256, 1)
    for hv, fv in zip(h, f):
        for _ in range(int(fv)):
            b.add_hashed(np.array([hv], dtype=np.uint64))
    assert a.to_bytes() == b.to_bytes()


def test_merge_associative_and_byte_stable():
    h = _hashes(30_000, salt=5)
    bulk = AmsSketch(5, 512, 2)
    bulk.add_hashed(h)
    parts = []
    for lo in range(0, 30_000, 7_000):
        p = AmsSketch(5, 512, 2)
        p.add_hashed(h[lo : lo + 7_000])
        parts.append(p)
    left = parts[0]
    for p in parts[1:]:
        left = left.merge(p)
    assert left.to_bytes() == bulk.to_bytes()


def test_serialization_roundtrip_and_magic():
    s = AmsSketch(3, 128, 11)
    s.add_hashed(_hashes(1000))
    r = AmsSketch.from_bytes(s.to_bytes())
    assert r.to_bytes() == s.to_bytes()
    assert (r.depth, r.width, r.seed, r.n_items) == (3, 128, 11, 1000)
    with pytest.raises(ValueError, match="magic"):
        AmsSketch.from_bytes(b"\x00" * 64)


def test_incompatible_params_raise():
    a, b = AmsSketch(5, 256, 0), AmsSketch(5, 256, 1)
    with pytest.raises(ValueError, match="differ"):
        a.merge(b)
    with pytest.raises(ValueError, match="differ"):
        a.inner(AmsSketch(5, 512, 0))


def test_inner_product_join_size_within_bound():
    rng = np.random.default_rng(0)
    h = _hashes(10_000, salt=9)
    f = (50_000 / (np.arange(1, 10_001) ** 0.8)).astype(np.int64) + 1
    g = rng.integers(1, 20, size=10_000).astype(np.int64)
    exact = float((f.astype(np.float64) * g).sum())
    a = AmsSketch(7, 1024, 3)
    a.add_hashed(h, f)
    b = AmsSketch(7, 1024, 3)
    b.add_hashed(h, g)
    assert abs(a.inner(b) - exact) <= 4 * a.error_bound(b)


def test_inner_disjoint_keys_near_zero():
    a = AmsSketch(7, 1024, 3)
    a.add_hashed(_hashes(20_000, salt=1))
    b = AmsSketch(7, 1024, 3)
    b.add_hashed(_hashes(20_000, salt=2))  # different key universe
    assert abs(a.inner(b)) <= 4 * a.error_bound(b)


# ---------------------------------------------------------------------------
# Spark level


def test_ams_sketch_agg_matches_local(spark):
    from hll_spark.operators.sketches import ams_sketch_agg

    df = spark.range(0, 20_000).selectExpr("id % 97 AS k")
    row = ams_sketch_agg(df, "k", depth=5, width=512, seed=7).collect()[0]
    s = AmsSketch.from_bytes(bytes(row["sketch"]))
    # 97 keys x ~206 rows each: F2 ~= 97 * 206^2
    exact = sum(
        c * c
        for c in (
            df.groupBy("k").count().toPandas()["count"].astype(float)
        )
    )
    assert row["rows_seen"] == 20_000
    assert abs(s.f2() - exact) <= 4 * s.error_bound()


def test_ams_partition_invariant(spark):
    from hll_spark.operators.sketches import ams_sketch_agg

    df = spark.range(0, 10_000).selectExpr("id % 31 AS k")
    a = bytes(ams_sketch_agg(df, "k", width=256).collect()[0]["sketch"])
    b = bytes(
        ams_sketch_agg(df.repartition(13), "k", width=256).collect()[0][
            "sketch"
        ]
    )
    assert a == b  # counter addition commutes; blobs byte-identical


def test_ams_join_size_spark(spark):
    from hll_spark.operators.sketches import ams_join_size

    left = spark.range(0, 30_000).selectExpr("id % 300 AS k")
    right = spark.range(0, 5_000).selectExpr("id % 500 AS k")
    exact = left.join(right, "k").count()
    row = ams_join_size(left, "k", right, "k", depth=7, width=1024).collect()[0]
    assert row["rows_left"] == 30_000 and row["rows_right"] == 5_000
    assert abs(row["est_join_rows"] - exact) <= 4 * row["sigma"]


def test_ams_join_size_type_mismatch_raises(spark):
    from hll_spark.operators.sketches import ams_join_size

    left = spark.range(10).selectExpr("id AS k")
    right = spark.range(10).selectExpr("CAST(id AS STRING) AS k")
    with pytest.raises(ValueError, match="types differ"):
        ams_join_size(left, "k", right, "k")


def test_join_plan_report_recommendations(spark):
    from hll_spark.operators.diagnostics import join_plan_report

    left = spark.range(0, 20_000).selectExpr("id % 1000 AS k")
    small = spark.range(0, 50).selectExpr("id AS k")
    rep = join_plan_report(
        left, small, "k", broadcast_threshold_rows=1_000
    ).collect()[0]
    assert rep["recommendation"] == "broadcast_right"
    exact = left.join(small, "k").count()
    assert abs(rep["est_join_rows"] - exact) <= 4 * rep["sigma"] + 1

    # skewed side: one key owns half the rows -> salted_join
    skew = spark.range(0, 20_000).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 0 ELSE id END AS k"
    )
    rep2 = join_plan_report(
        skew, left, "k", broadcast_threshold_rows=10
    ).collect()[0]
    assert rep2["recommendation"] == "salted_join"
    assert rep2["top_share_left"] > 0.4

    # big, uniform both sides -> shuffle_hash_join
    r3 = join_plan_report(
        left, left, "k", broadcast_threshold_rows=10
    ).collect()[0]
    assert r3["recommendation"] == "shuffle_hash_join"
