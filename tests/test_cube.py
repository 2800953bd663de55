"""Sketch-cube tests: build once, answer slices/rollups from the cube
alone, with partition pruning doing the file skipping."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hll_spark.operators.agg import hll_estimate_udf, hll_spec
from hll_spark.plans.cube import build_sketch_cube, query_sketch_cube
from hll_spark.sketchlib.hll import HllConfig

CFG = HllConfig(log2m=14, regwidth=5, expthresh=18)  # exact tier


@pytest.fixture(scope="module")
def cube(spark, tmp_path_factory):
    rng = np.random.default_rng(9)
    n = 60_000
    pdf = pd.DataFrame(
        {
            "day": rng.choice(["d1", "d2", "d3"], n),
            "lang": rng.choice(["en", "de", "fr"], n, p=[0.6, 0.25, 0.15]),
            "user_id": rng.integers(0, 8000, n),
        }
    )
    path = str(tmp_path_factory.mktemp("cube") / "users_by_day_lang")
    df = spark.createDataFrame(pdf).repartition(8)
    build_sketch_cube(df, "user_id", ["day", "lang"], path, spec=hll_spec(CFG))
    return path, pdf


def test_cube_slice_matches_exact(spark, cube):
    path, pdf = cube
    est = hll_estimate_udf()
    got = {
        r.lang: r.est
        for r in query_sketch_cube(
            spark, path, spec=hll_spec(CFG), where="day = 'd2'", group_by=["lang"]
        )
        .withColumn("est", est("sketch"))
        .collect()
    }
    exact = pdf[pdf.day == "d2"].groupby("lang")["user_id"].nunique().to_dict()
    assert got == exact  # exact tier: slice answers == COUNT(DISTINCT)


def test_cube_rollup_merges_cells(spark, cube):
    path, pdf = cube
    est = hll_estimate_udf()
    row = (
        query_sketch_cube(spark, path, spec=hll_spec(CFG))
        .withColumn("est", est("sketch"))
        .collect()[0]
    )
    assert row.est == pdf["user_id"].nunique()
    assert row.rows_seen == len(pdf)


def test_cube_query_prunes_partitions(spark, cube):
    path, _ = cube
    cells = spark.read.parquet(path).where("day = 'd1' AND lang = 'en'")
    plan = cells._jdf.queryExecution().executedPlan().toString()
    # dimension predicates must be PartitionFilters (directory pruning),
    # not data filters — the raw fact table is never touched at all
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "day" in pf and "lang" in pf


def test_cube_answers_without_raw_data(spark, cube):
    # the cube directory alone is sufficient: nothing references the
    # original fact rows (the DataFrame lineage starts at the cube path)
    path, pdf = cube
    est = hll_estimate_udf()
    per_day = {
        r.day: r.est
        for r in query_sketch_cube(spark, path, spec=hll_spec(CFG), group_by=["day"])
        .withColumn("est", est("sketch"))
        .collect()
    }
    exact = pdf.groupby("day")["user_id"].nunique().to_dict()
    assert per_day == exact


def test_cube_is_sketch_generic_theta(spark, tmp_path):
    """The cube works with ANY SketchSpec: theta cells support slice
    estimates AND direct cross-slice set operations."""
    from hll_spark.operators.sketches import theta_intersect_udf, theta_spec
    from hll_spark.sketchlib.theta import ThetaSketch

    pdf = pd.DataFrame(
        {
            "day": ["d1"] * 1000 + ["d2"] * 1000,
            "user_id": list(range(1000)) + list(range(500, 1500)),
        }
    )
    path = str(tmp_path / "theta_cube")
    build_sketch_cube(
        spark.createDataFrame(pdf), "user_id", ["day"], path,
        spec=theta_spec(k=4096),
    )
    cells = query_sketch_cube(spark, path, spec=theta_spec(k=4096), group_by=["day"])
    cells.createOrReplaceTempView("tc")
    inter = theta_intersect_udf()
    row = (
        spark.sql("SELECT a.sketch AS sa, b.sketch AS sb FROM tc a JOIN tc b "
                  "ON a.day = 'd1' AND b.day = 'd2'")
        .select(inter(F.col("sa"), F.col("sb")).alias("retained"))
        .collect()[0]
    )
    assert row.retained == 500.0  # users active BOTH days, exact tier


def test_rollup_cube_to_coarser_grain(spark, cube, tmp_path):
    path, pdf = cube
    coarse = str(tmp_path / "by_lang")
    from hll_spark.plans.cube import rollup_cube

    rollup_cube(spark, path, coarse, ["lang"], spec=hll_spec(CFG))
    est = hll_estimate_udf()
    got = {
        r.lang: r.est
        for r in spark.read.parquet(coarse).withColumn("est", est("sketch")).collect()
    }
    exact = pdf.groupby("lang")["user_id"].nunique().to_dict()
    assert got == exact  # exact tier: rollup == recompute from raw
