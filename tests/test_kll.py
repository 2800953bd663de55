"""KLL rank-error bound tests vs exact quantiles, incl. permuted merges."""

import itertools

import numpy as np
import pytest

from hll_spark.sketchlib.kll import KllSketch

QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def rank_error(sketch, data, qs=QS):
    data_sorted = np.sort(data)
    errs = []
    for q in qs:
        v = sketch.quantile(q)
        # with ties, a value occupies a rank interval [lo, hi]; the error
        # is the distance from q to that interval
        lo = np.searchsorted(data_sorted, v, side="left") / len(data)
        hi = np.searchsorted(data_sorted, v, side="right") / len(data)
        errs.append(max(lo - q, q - hi, 0.0))
    return max(errs)


@pytest.mark.parametrize("dist", ["uniform", "normal", "lognormal", "zipfish"])
def test_rank_error_bound_single_stream(dist):
    rng = np.random.default_rng(hash(dist) % 2**32)
    n = 200_000
    data = {
        "uniform": lambda: rng.uniform(0, 1, n),
        "normal": lambda: rng.normal(0, 1, n),
        "lognormal": lambda: rng.lognormal(0, 2, n),
        "zipfish": lambda: rng.zipf(1.5, n).astype(np.float64),
    }[dist]()
    k = 200
    s = KllSketch(k=k)
    for i in range(0, n, 10_000):
        s.update(data[i : i + 10_000])
    assert s.n == n
    assert rank_error(s, data) <= 5.0 / k


def test_merge_bound_under_permuted_orders():
    rng = np.random.default_rng(7)
    parts = [rng.normal(i, 1, 30_000) for i in range(4)]
    data = np.concatenate(parts)
    k = 200
    for perm in itertools.islice(itertools.permutations(range(4)), 6):
        acc = KllSketch(k=k)
        for i in perm:
            other = KllSketch(k=k)
            other.update(parts[i])
            acc.merge(other)
        assert acc.n == len(data)
        assert rank_error(acc, data) <= 5.0 / k, f"perm {perm}"


def test_deterministic_rebuild():
    rng = np.random.default_rng(3)
    data = rng.uniform(0, 100, 50_000)
    a = KllSketch(128)
    b = KllSketch(128)
    for i in range(0, len(data), 7000):
        a.update(data[i : i + 7000])
        b.update(data[i : i + 7000])
    assert a.to_bytes() == b.to_bytes()  # counter-based compaction


def test_total_weight_conserved():
    rng = np.random.default_rng(4)
    s = KllSketch(64)
    s.update(rng.uniform(0, 1, 123_457))
    items, weights = s._weighted_items()
    assert int(weights.sum()) == 123_457 == s.n


def test_small_exact():
    s = KllSketch(200)
    s.update(np.arange(100, dtype=np.float64))
    assert s.quantile(0.0) == 0.0
    assert s.quantile(1.0) == 99.0
    assert s.quantile(0.5) == pytest.approx(49, abs=1)


def test_nan_filtered_and_empty():
    s = KllSketch(64)
    s.update(np.array([np.nan, np.nan]))
    assert s.n == 0 and np.isnan(s.quantile(0.5))


def test_serialization_roundtrip():
    rng = np.random.default_rng(5)
    s = KllSketch(100)
    s.update(rng.normal(0, 1, 40_000))
    back = KllSketch.from_bytes(s.to_bytes())
    assert back.to_bytes() == s.to_bytes()
    assert back.quantile(0.5) == s.quantile(0.5)
    assert back.n == s.n


def test_merge_rejects_mismatched_k():
    with pytest.raises(ValueError):
        KllSketch(64).merge(KllSketch(128))


# ---------------------------------------------------------------------------
# kll_range_buckets (sketch-driven range bucketing)
# ---------------------------------------------------------------------------

import numpy as np  # noqa: E402
import pytest as _pytest  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from hll_spark.operators.sketches import kll_range_buckets  # noqa: E402


def test_range_buckets_exact_regime_boundaries(spark):
    part = spark.read.parquet("/root/testdata/sf0.01/part.parquet")
    vals = np.sort(
        np.array([r.p_retailprice for r in part.select("p_retailprice").collect()])
    )
    n = len(vals)
    _, bounds = kll_range_buckets(part, "p_retailprice", 8, k=65536)
    want = [
        float(vals[max(1, int(np.ceil(i / 8 * n))) - 1]) for i in range(1, 8)
    ]
    assert bounds == want


def test_range_buckets_balance_in_compacting_regime(spark):
    # k=200 boundaries are approximate (O(1/k) rank error) but buckets
    # must still be roughly balanced — each within 15% of n/8
    part = spark.read.parquet("/root/testdata/sf0.01/part.parquet")
    bucketed, bounds = kll_range_buckets(part, "p_retailprice", 8, k=200)
    n = part.count()
    sizes = {r.bucket: r["count"] for r in bucketed.groupBy("bucket").count().collect()}
    assert set(sizes) == set(range(8))
    for b, s in sizes.items():
        assert abs(s - n / 8) < 0.15 * n, (b, s, n)
    assert bounds == sorted(bounds)


def test_range_buckets_assignment_rule_ties_go_low(spark):
    df = spark.createDataFrame([(float(v),) for v in [1, 2, 2, 3, 4]], "x double")
    bucketed, bounds = kll_range_buckets(df, "x", 2, k=1024)
    # n=5, boundary = order stat at rank ceil(0.5*5)=3 -> value 2;
    # values <= 2 go to bucket 0
    assert bounds == [2.0]
    got = {(r.x, r.bucket) for r in bucketed.collect()}
    assert got == {(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)}


def test_range_buckets_validation(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    with _pytest.raises(ValueError):
        kll_range_buckets(df, "x", 1)
