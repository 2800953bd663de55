"""Edge cases: empty inputs, all-null columns, unicode, skewed keys,
spark-submit packaging."""

import subprocess
import sys

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hll_spark.operators.agg import hll_distinct, hll_sketch_agg
from hll_spark.sketchlib.hll import HllConfig

CFG = HllConfig(log2m=12, regwidth=5)


def test_empty_dataframe(spark):
    df = spark.createDataFrame([], schema="v long")
    assert hll_distinct(df, "v", cfg=CFG).collect()[0]["distinct_v"] == 0


def test_all_null_column(spark):
    df = spark.createDataFrame([(None,), (None,), (None,)], schema="v double")
    assert hll_distinct(df, "v", cfg=CFG).collect()[0]["distinct_v"] == 0


def test_unicode_urls_murmur3(spark):
    urls = [f"https://例え.jp/ページ/{i % 50}" for i in range(500)]
    df = spark.createDataFrame(pd.DataFrame({"u": urls}))
    got = hll_distinct(df, "u", cfg=CFG, hash_mode="murmur3").collect()[0]
    assert got["distinct_u"] == 50


def test_single_row(spark):
    df = spark.createDataFrame(pd.DataFrame({"v": ["only"]}))
    assert hll_distinct(df, "v", cfg=CFG).collect()[0]["distinct_v"] == 1


def test_skewed_groups_exact_with_and_without_salt(spark):
    # one hot key holding 90% of rows (the skewed-host scenario)
    rng = np.random.default_rng(0)
    n = 50_000
    hot = rng.random(n) < 0.9
    pdf = pd.DataFrame(
        {
            "host": np.where(hot, "hot.example.com", "cold" + pd.Series(rng.integers(0, 50, n)).astype(str) + ".com"),
            "url": [f"u{i % 7000}" for i in range(n)],
        }
    )
    df = spark.createDataFrame(pdf).repartition(8)
    cfg = HllConfig(log2m=14, regwidth=5, expthresh=18)  # exact tier
    exact = pdf.groupby("host")["url"].nunique().to_dict()
    plain = {
        r["host"]: r["distinct_url"]
        for r in hll_distinct(df, "url", by=["host"], cfg=cfg).collect()
    }
    salted = {
        r["host"]: r["distinct_url"]
        for r in hll_distinct(
            df, "url", by=["host"], cfg=cfg, salt_partitions=16
        ).collect()
    }
    assert plain == exact == salted


def test_partials_bounded_under_skew(spark):
    # level-0 pre-combine: per (partition, group) at most ONE blob, so a
    # hot group contributes <= n_partitions rows to the shuffle
    from hll_spark.operators.agg import hll_spec, sketch_partials

    pdf = pd.DataFrame({"g": ["hot"] * 30_000, "v": range(30_000)})
    df = spark.createDataFrame(pdf).repartition(8)
    partials = sketch_partials(df, "v", hll_spec(CFG), by=["g"]).collect()
    assert len(partials) <= 8


def test_pyfiles_packaging():
    out = subprocess.run(
        [sys.executable, "scripts/package_pyfiles.py"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=60,
    )
    assert out.returncode == 0
    import zipfile

    with zipfile.ZipFile(out.stdout.strip()) as zf:
        names = zf.namelist()
    assert "hll_spark/sketchlib/hll.py" in names
    assert "hll_spark/operators/agg.py" in names
