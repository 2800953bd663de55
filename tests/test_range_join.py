"""Binned range join: correctness vs the naive inequality join, and the
plan guarantee (hash equi-join, never a nested loop)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hll_spark.operators.relational import range_join


@pytest.fixture(scope="module")
def frames(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    left = spark.createDataFrame(
        pd.DataFrame(
            {
                "lid": range(2000),
                "grp": rng.integers(0, 3, 2000),
                "point": np.round(rng.uniform(-50, 150, 2000), 3),
            }
        )
    )
    los = np.round(rng.uniform(-60, 140, 80), 3)
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "rid": range(80),
                "grp": rng.integers(0, 3, 80),
                "lo": los,
                # a few inverted (hi < lo) intervals: must match nothing
                "hi": np.where(
                    np.arange(80) % 11 == 0,
                    los - 1.0,
                    np.round(los + rng.uniform(0, 25, 80), 3),
                ),
            }
        )
    )
    return left, right


def _naive(left, right, on=None):
    cond = (F.col("point") >= F.col("lo")) & (F.col("point") <= F.col("hi"))
    if on:
        lr = left.withColumnRenamed("grp", "lgrp")
        out = lr.join(
            right, cond & (F.col("lgrp") == F.col("grp")), "inner"
        )
        return {(r["lid"], r["rid"]) for r in out.select("lid", "rid").collect()}
    out = left.drop("grp").join(right.drop("grp"), cond, "inner")
    return {(r["lid"], r["rid"]) for r in out.select("lid", "rid").collect()}


@pytest.mark.parametrize("bin_width", [1.0, 7.0, 40.0])
def test_matches_naive_inequality_join(spark, frames, bin_width):
    left, right = frames
    got = range_join(
        left.drop("grp"), right.drop("grp"), "point", "lo", "hi", bin_width
    )
    pairs = {(r["lid"], r["rid"]) for r in got.select("lid", "rid").collect()}
    assert pairs == _naive(left, right)
    assert pairs  # non-vacuous


def test_equi_key_variant(spark, frames):
    left, right = frames
    got = range_join(left, right, "point", "lo", "hi", 10.0, on=["grp"])
    pairs = {(r["lid"], r["rid"]) for r in got.select("lid", "rid").collect()}
    assert pairs == _naive(left, right, on=["grp"])
    assert pairs
    assert got.columns.count("grp") == 1  # key deduplicated in output


def test_each_pair_exactly_once(spark, frames):
    left, right = frames
    got = range_join(
        left.drop("grp"), right.drop("grp"), "point", "lo", "hi", 5.0
    )
    n = got.count()
    assert n == got.select("lid", "rid").distinct().count()


def test_plan_has_no_nested_loop(spark, frames):
    left, right = frames
    plan = (
        range_join(left.drop("grp"), right.drop("grp"), "point", "lo", "hi", 5.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_rejects_ambiguous_columns_and_bad_width(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="ambiguous"):
        range_join(left, right, "point", "lo", "hi", 5.0)  # grp collides
    with pytest.raises(ValueError, match="bin_width"):
        range_join(left.drop("grp"), right.drop("grp"), "point", "lo", "hi", 0)


def test_null_points_never_match(spark):
    left = spark.createDataFrame(
        [(1, None), (2, 5.0)], "lid long, point double"
    )
    right = spark.createDataFrame([(1, 0.0, 10.0)], "rid long, lo double, hi double")
    got = range_join(left, right, "point", "lo", "hi", 10.0)
    assert [r["lid"] for r in got.collect()] == [2]


def test_rejects_reserved_bin_column_on_either_side(spark):
    """A caller's __bin column used to be silently overwritten when it
    existed on only one side (ADVICE r3) — now a loud ValueError."""
    left = spark.createDataFrame([(1, 5.0)], "lid long, point double")
    right = spark.createDataFrame(
        [(1, 0.0, 10.0)], "rid long, lo double, hi double"
    )
    with pytest.raises(ValueError, match="__bin"):
        range_join(
            left.withColumn("__bin", F.lit(9)), right, "point", "lo", "hi", 5.0
        )
    with pytest.raises(ValueError, match="__bin"):
        range_join(
            left, right.withColumn("__bin", F.lit(9)), "point", "lo", "hi", 5.0
        )
