"""key_skew_report / skew_stats vs hand-computed ground truth."""

import pytest
from pyspark.sql import Row

from hll_spark.operators.diagnostics import key_skew_report, skew_stats


@pytest.fixture(scope="module")
def skewed(spark):
    # key 'a' 6 rows, 'b' 3, 'c' 1  -> total 10, distinct 3
    rows = [Row(k="a", v=i) for i in range(6)]
    rows += [Row(k="b", v=i) for i in range(3)]
    rows += [Row(k="c", v=0)]
    return spark.createDataFrame(rows)


def test_report_values(skewed):
    out = key_skew_report(skewed, "k", top_n=2).collect()
    assert [(r["k"], r["n_rows"]) for r in out] == [("a", 6), ("b", 3)]
    assert out[0]["share"] == pytest.approx(0.6)
    # uniform spread = 10/3 rows per key; 'a' is 6/(10/3) = 1.8x
    assert out[0]["skew"] == pytest.approx(1.8)
    assert out[1]["skew"] == pytest.approx(0.9)


def test_report_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [Row(k=c, v=i) for c in ("z", "y", "x") for i in range(2)]
    )
    out = key_skew_report(df, ["k"], top_n=3).collect()
    assert [r["k"] for r in out] == ["x", "y", "z"]


def test_multi_column_key(spark):
    df = spark.createDataFrame(
        [Row(a=1, b="p"), Row(a=1, b="p"), Row(a=1, b="q"), Row(a=2, b="p")]
    )
    out = key_skew_report(df, ["a", "b"], top_n=1).collect()
    assert (out[0]["a"], out[0]["b"], out[0]["n_rows"]) == (1, "p", 2)


def test_stats(skewed):
    r = skew_stats(skewed, "k").collect()[0]
    assert r["distinct_keys"] == 3
    assert r["max_key_rows"] == 6
    assert r["avg_key_rows"] == pytest.approx(10 / 3)
    assert r["skew_factor"] == pytest.approx(1.8)


def test_empty_cols_raise(skewed):
    with pytest.raises(ValueError):
        key_skew_report(skewed, [])
    with pytest.raises(ValueError):
        skew_stats(skewed, [])


def test_plan_has_no_collect_or_cartesian(skewed):
    # broadcast of the 1-row totals frame: plan must show a broadcast
    # join, not a cartesian product over data-sized inputs
    plan = key_skew_report(skewed, "k")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the 1-row totals frame must arrive via a broadcast (without the
    # hint this compiles to a BroadcastNestedLoopJoin too, but assert
    # positively so losing the broadcast entirely cannot pass)
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
