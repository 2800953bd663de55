"""salted_join: parity with the plain equi-join on a skewed corpus, the
hot/cold split mechanics, auto hot-key detection, and the plan shape."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hll_spark.operators.relational import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    # key 7 owns ~60% of the left side; 3 and null are edge keys
    keys = np.where(rng.random(5000) < 0.6, 7, rng.integers(0, 40, 5000))
    left = pd.DataFrame({"k": keys.astype("float"), "lval": np.arange(5000)})
    left.loc[left.index % 97 == 0, "k"] = None  # nulls on the left
    right = pd.DataFrame(
        {
            "k": np.concatenate([np.arange(0, 35), [7] * 5]).astype("float"),
            "rval": np.arange(40) * 10,
        }
    )
    right.loc[right.index % 13 == 0, "k"] = None
    ldf = spark.createDataFrame(left).withColumn("k", F.col("k").cast("long"))
    rdf = spark.createDataFrame(right).withColumn("k", F.col("k").cast("long"))
    return ldf, rdf


def _sorted_rows(df):
    from collections import Counter

    return Counter(tuple(r) for r in df.collect())


@pytest.mark.parametrize("how", ["inner", "left"])
def test_parity_with_plain_join(spark, skewed, how):
    left, right = skewed
    plain = left.join(right, "k", how)
    salted = salted_join(left, right, "k", hot_keys=[7], salt=8, how=how)
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_parity_multi_hot_and_salt1(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k", "inner")
    salted = salted_join(
        left, right, "k", hot_keys=[7, 3, 999], salt=1, how="inner"
    )
    assert _sorted_rows(salted) == _sorted_rows(plain)


def test_auto_hot_detection(spark, skewed):
    left, right = skewed
    # key 7 is ~60% of the left; min_share=0.3 must find exactly it
    out = salted_join(left, right, "k", hot_keys=None, min_share=0.3, salt=4)
    plain = left.join(right, "k", "inner")
    assert _sorted_rows(out) == _sorted_rows(plain)


def test_empty_hot_set_falls_back_to_plain(spark, skewed):
    left, right = skewed
    out = salted_join(left, right, "k", hot_keys=[])
    plain = left.join(right, "k", "inner")
    assert _sorted_rows(out) == _sorted_rows(plain)


def test_hot_rows_fan_out_across_salts(spark, skewed):
    """The mechanism itself: the hot key's left rows actually spread
    over multiple (key, salt) reducer cells."""
    left, _ = skewed
    salt_col = F.pmod(
        F.xxhash64(F.monotonically_increasing_id(), F.lit("k")), F.lit(8)
    )
    n_cells = (
        left.where(F.col("k") == 7)
        .withColumn("__salt", salt_col)
        .select("__salt")
        .distinct()
        .count()
    )
    assert n_cells >= 6  # ~3000 rows over 8 salts: all 8 w.h.p.


def test_guards(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError, match="inner"):
        salted_join(left, right, "k", hot_keys=[7], how="right")
    with pytest.raises(ValueError, match="salt"):
        salted_join(left, right, "k", hot_keys=[7], salt=0)
    with pytest.raises(ValueError, match="__salt"):
        salted_join(
            left.withColumn("__salt", F.lit(1)), right, "k", hot_keys=[7]
        )
    with pytest.raises(ValueError, match="ambiguous"):
        salted_join(
            left.withColumn("rval", F.lit(1)), right, "k", hot_keys=[7]
        )


def test_plan_has_no_nested_loop(spark, skewed):
    left, right = skewed
    plan = salted_join(
        left, right, "k", hot_keys=[7], salt=8
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
