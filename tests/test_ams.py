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


def test_point_query_exact_when_no_collisions():
    # exact regime: width >> n, every counter holds at most one item's
    # mass per row? (not guaranteed — but every ROW's estimate for an
    # item that collides nowhere equals its true count, and the median
    # needs only depth//2+1 clean rows). At n=64, width=8192, depth=7
    # the seeded stream below has enough clean rows for every item.
    n = 64
    h = _hashes(n, salt=21)
    f = np.arange(1, n + 1, dtype=np.int64) * 10
    s = AmsSketch(depth=7, width=8192, seed=3)
    s.add_hashed(h, f)
    assert (s.query_hashed(h) == f).all()


def test_point_query_unbiased_and_bounded_under_collisions():
    # noisy regime: 20k distinct uniform items into width=1024 — heavy
    # collisions. The count-sketch estimator must stay (a) near-zero
    # mean error across items (unbiasedness) and (b) per-item bounded
    # by a few sqrt(F2/width) (the per-row sigma; the depth-7 median
    # concentrates harder).
    n, width = 20_000, 1024
    h = _hashes(n, salt=22)
    s = AmsSketch(depth=7, width=width, seed=5)
    s.add_hashed(h)
    est = s.query_hashed(h)
    err = est.astype(np.float64) - 1.0
    sigma = np.sqrt(n / width)  # F2 = n for unit counts
    assert abs(err.mean()) <= 0.2 * sigma  # unbiased across items
    assert np.abs(err).max() <= 6 * sigma  # median concentration


def test_point_query_beats_cms_on_zipf_tail():
    # the "why both sketches" story, asserted: identical (depth, width)
    # budgets on a Zipfian stream — CMS's min estimator is biased UP by
    # the colliding heavy mass, the count-sketch's signed median cancels
    # it. Compare mean absolute error on the tail (true count 1..3).
    from hll_spark.sketchlib.cms import CountMinSketch

    n = 30_000
    f = (3_000 / np.arange(1, n + 1) ** 1.1).astype(np.int64) + 1
    h = _hashes(n, salt=23)
    cs = AmsSketch(depth=5, width=512, seed=7)
    cs.add_hashed(h, f)
    cms = CountMinSketch(depth=5, width=512)
    cms.add_hashed(h, f.astype(np.uint64))
    tail = f <= 3
    cs_err = np.abs(cs.query_hashed(h[tail]).astype(np.float64) - f[tail])
    cms_err = np.abs(
        cms.query_hashed(h[tail]).astype(np.float64) - f[tail]
    )
    assert cs_err.mean() < cms_err.mean()


def test_point_query_turnstile_delete():
    # signed updates: insert a batch, delete half of it, point queries
    # see the net counts exactly (exact regime so medians are clean),
    # including zeros for fully-deleted items. CMS cannot represent
    # this stream at all (unsigned counters).
    h = _hashes(32, salt=24)
    f = np.full(32, 5, dtype=np.int64)
    s = AmsSketch(depth=7, width=4096, seed=9)
    s.add_hashed(h, f)
    s.add_hashed(h[:16], np.full(16, -5, dtype=np.int64))  # delete
    est = s.query_hashed(h)
    assert (est[:16] == 0).all()
    assert (est[16:] == 5).all()
    assert s.n_items == 32 * 5 - 16 * 5


def test_point_query_empty_input():
    s = AmsSketch(3, 64, 0)
    assert s.query_hashed(np.zeros(0, dtype=np.uint64)).shape == (0,)


def test_countsketch_frequencies_exact_regime(spark):
    # Spark surface: build over a 5-type events-like frame, probe the
    # distinct types — exact because width >> domain (the driver-query
    # regime; q_countsketch_event_counts mirrors this on real testdata)
    from pyspark.sql import functions as F

    from hll_spark.operators.sketches import countsketch_frequencies

    df = spark.range(10_000).select(
        F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias("k")
    )
    items = df.select("k").distinct()
    out = countsketch_frequencies(df, "k", items, depth=7, width=4096)
    got = {r["k"]: r["est_count"] for r in out.collect()}
    assert got == {f"t{i}": 2000 for i in range(5)}


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
