"""Spark-level tests for companion sketches over /root/testdata tables."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hll_spark.operators.sketches import (
    bloom_filter_join,
    cms_frequencies,
    kll_quantiles,
    tdigest_quantiles,
)


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


@pytest.fixture(scope="module")
def part(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/part.parquet")


def test_cms_frequencies_on_event_types(spark, events):
    items = events.select("event_type").distinct()
    got = {
        r["event_type"]: r["est_count"]
        for r in cms_frequencies(events, "event_type", items, depth=5, width=4096).collect()
    }
    exact = {
        r["event_type"]: r["c"]
        for r in events.groupBy("event_type").agg(F.count("*").alias("c")).collect()
    }
    for k, v in exact.items():
        assert got[k] >= v  # never underestimates
        assert got[k] - v <= 0.01 * sum(exact.values())


def test_bloom_join_prefilter_keeps_all_matches(spark, lineitem, part):
    filtered = bloom_filter_join(lineitem, "l_partkey", part, "p_partkey")
    # every lineitem references an existing part -> nothing may be dropped
    assert filtered.count() == lineitem.count()
    # and a disjoint probe set is mostly rejected
    ghosts = spark.range(10**9, 10**9 + 20_000).withColumnRenamed("id", "l_partkey")
    kept = bloom_filter_join(ghosts, "l_partkey", part, "p_partkey").count()
    assert kept / 20_000 <= 0.05


@pytest.mark.parametrize("fn", [kll_quantiles, tdigest_quantiles])
def test_quantiles_vs_exact(spark, lineitem, fn):
    qs = [0.1, 0.5, 0.9]
    got = fn(lineitem, "l_extendedprice", qs).collect()[0]
    vals = lineitem.select("l_extendedprice").toPandas()["l_extendedprice"].to_numpy()
    vals_sorted = np.sort(vals)
    for q in qs:
        est = got[f"q{str(q).replace('.', '_')}"]
        lo = np.searchsorted(vals_sorted, est, "left") / len(vals)
        hi = np.searchsorted(vals_sorted, est, "right") / len(vals)
        assert max(lo - q, q - hi, 0.0) <= 0.03, f"q={q}"


def test_grouped_quantiles(spark, events):
    got = kll_quantiles(events, "value", [0.5], by=["event_type"]).collect()
    pdf = events.select("event_type", "value").toPandas()
    for r in got:
        grp = pdf[pdf.event_type == r["event_type"]]["value"].to_numpy()
        grp_sorted = np.sort(grp)
        est = r["q0_5"]
        lo = np.searchsorted(grp_sorted, est, "left") / len(grp)
        hi = np.searchsorted(grp_sorted, est, "right") / len(grp)
        assert max(lo - 0.5, 0.5 - hi, 0.0) <= 0.05


def test_small_domain_fast_builds_byte_equal_distributed(spark, sf_dir):
    """The driver-side small-domain fast paths must produce the SAME
    bytes as the distributed partial/merge builds (bloom: idempotent
    bit OR over distinct keys; cms: weighted add == n single adds)."""
    from hll_spark.operators.sketches import bloom_build, cms_build

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    assert bloom_build(part, "p_partkey") == bloom_build(
        part, "p_partkey", max_driver_keys=1
    )
    assert cms_build(events, "event_type") == cms_build(
        events, "event_type", max_driver_groups=1
    )
