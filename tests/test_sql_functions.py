"""SQL function surface: the postgresql-hll-style query UX over
spark.sql (functions/__init__.py register_sql_functions)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hll_spark.functions import register_sql_functions
from hll_spark.operators.agg import hll_sketch_agg
from hll_spark.sketchlib.hll import HllConfig

CFG = HllConfig(log2m=14, regwidth=5, expthresh=18)  # exact tier


@pytest.fixture(scope="module")
def lang_sketches(spark):
    register_sql_functions(spark)
    pdf = pd.DataFrame(
        {
            "lang": ["en"] * 600 + ["de"] * 400,
            "text": [f"en-{i}" for i in range(600)]
            + [f"de-{i % 300}" for i in range(400)],  # de: 300 distinct
        }
    )
    df = spark.createDataFrame(pdf)
    hll_sketch_agg(df, "text", by=["lang"], cfg=CFG).createOrReplaceTempView(
        "lang_sketches"
    )
    return pdf


def test_sql_cardinality(spark, lang_sketches):
    rows = spark.sql(
        "SELECT lang, hll_cardinality(sketch) AS n FROM lang_sketches"
    ).collect()
    got = {r.lang: r.n for r in rows}
    assert got == {"en": 600, "de": 300}


def test_sql_union_and_intersect(spark, lang_sketches):
    row = spark.sql(
        """
        SELECT hll_cardinality(hll_union(a.sketch, b.sketch)) AS u,
               hll_intersect(a.sketch, b.sketch) AS i
        FROM lang_sketches a JOIN lang_sketches b
          ON a.lang = 'en' AND b.lang = 'de'
        """
    ).collect()[0]
    assert row.u == 900          # disjoint value spaces
    assert abs(row.i) < 1e-6     # inclusion-exclusion intersection ~ 0


def test_sql_hash_matches_public_vector(spark, lang_sketches):
    import numpy as np

    got = spark.sql("SELECT hll_hash_text('hello') AS h").collect()[0].h
    # public murmur3 x64-128 low64 vector (see test_external_golden.py)
    assert got == int(np.uint64(0xCBD8A7B341BD9B02).astype(np.int64))


def test_sql_theta_functions(spark, lang_sketches):
    from hll_spark.operators.sketches import theta_sketch_agg

    pdf = pd.DataFrame(
        {
            "grp": ["a"] * 500 + ["b"] * 500,
            "v": [f"x{i}" for i in range(500)] + [f"x{i}" for i in range(300, 800)],
        }
    )  # |a|=500, |b|=500, common=200
    df = spark.createDataFrame(pdf)
    theta_sketch_agg(df, "v", k=4096, by=["grp"]).createOrReplaceTempView("tsk")
    row = spark.sql(
        """
        SELECT theta_cardinality(a.sketch) AS ca,
               theta_intersect(a.sketch, b.sketch) AS i,
               theta_difference(a.sketch, b.sketch) AS d,
               theta_jaccard(a.sketch, b.sketch) AS j
        FROM tsk a JOIN tsk b ON a.grp = 'a' AND b.grp = 'b'
        """
    ).collect()[0]
    assert (row.ca, row.i, row.d) == (500.0, 200.0, 300.0)  # exact tier
    assert abs(row.j - 200.0 / 800.0) < 1e-9


def test_sql_extract_text(spark, lang_sketches):
    """extract_text callable from spark.sql, same bytes as the JVM
    column chain."""
    import pandas as pd

    from hll_spark.sources.tables import generate_pages_pdf

    pdf = generate_pages_pdf(n_rows=50, seed=21)
    spark.createDataFrame(pdf[["html", "text"]]).createOrReplaceTempView(
        "pages_sqlfn"
    )
    bad = spark.sql(
        "SELECT count(*) AS n FROM pages_sqlfn WHERE extract_text(html) != text"
    ).collect()[0]["n"]
    assert bad == 0
