"""HTML -> text extraction: the input-hint per-row invariant.

Contract: extract_text(wrap_html(t)) == normalize_ws(t) byte-exactly for
ANY t, and exactly t for already-normalized t (the synthetic pages
fixture) — "byte-identical extracted text per url".
"""

import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from hll_spark.operators.extract import (
    escape_html_py,
    extract_pages,
    extract_text,
    normalize_ws_py,
    wrap_html,
    wrap_html_py,
)
from hll_spark.sources.tables import generate_pages


def _extract_spark(spark, htmls):
    df = spark.createDataFrame(pd.DataFrame({"html": htmls}))
    return [
        r["t"] for r in df.select(extract_text("html").alias("t")).collect()
    ]


# Adversarial alphabet: markup metachars, entity-lookalikes, whitespace
# runs (ASCII only: Java's default \s is ASCII, and the python mirror
# matches that).
_texts = st.lists(
    st.sampled_from(
        list("abz <>&\"'/;#\t\n") + ["&amp;", "&nbsp;", "&#160;", "<script>"]
    ),
    max_size=40,
).map("".join)


@settings(max_examples=30, deadline=None)
@given(t=_texts, lang=st.sampled_from(["en", "a&b", '<x">']))
def test_roundtrip_property(spark, t, lang):
    got = _extract_spark(spark, [wrap_html_py(t, lang=lang)])[0]
    assert got == normalize_ws_py(t)


def test_wrap_html_spark_matches_python(spark):
    texts = ["hello world", "a & b < c > d", 'quote " here', ""]
    df = spark.createDataFrame(pd.DataFrame({"text": texts}))
    got = [
        r["h"]
        for r in df.select(
            wrap_html("text", lang=F.lit("de"), title=F.lit("T&T")).alias("h")
        ).collect()
    ]
    assert got == [wrap_html_py(t, lang="de", title="T&T") for t in texts]


def test_escape_decode_single_pass_semantics(spark):
    # "&lt;" must survive a round trip as the five chars, not become "<"
    t = "a&lt;b and &amp;nbsp; and <real> tag"
    got = _extract_spark(spark, [wrap_html_py(t)])[0]
    assert got == t
    assert escape_html_py(t).count("&amp;") == 2


def test_extraction_rules_on_handwritten_pages(spark):
    pages = [
        # multiline page, uppercase tags, attributes, entity whitespace
        b"<HTML><BODY class='x'>\n <P>one</P>\n<p>two&nbsp;three</p> "
        b"<!-- hidden --></BODY></HTML>",
        # script/style bodies (with '>' and braces inside) are dropped
        b"<body><script>if (1 > 0) { x('</b>'); }</script>keep"
        b"<style>p { color: red }</style></body>",
        # no <body>: fragment fallback still strips tags
        b"<div>frag</div> ment",
        # present-but-empty body must NOT leak head text
        b"<html><head><title>leak</title></head><body></body></html>",
        # adjacent block tags keep the word boundary
        b"<body>a</p><p>b</body>",
        # in-the-wild apostrophe entities decode; escaped forms survive
        b"<body>it&#39;s &apos;ok&apos; and &amp;#39; stays</body>",
    ]
    got = _extract_spark(spark, pages)
    assert got == [
        "one two three", "keep", "frag ment", "", "a b",
        "it's 'ok' and &#39; stays",
    ]


def test_null_html_stays_null(spark):
    df = spark.createDataFrame([(None,)], "html binary")
    assert df.select(extract_text("html").alias("t")).collect()[0]["t"] is None


def test_generated_pages_invariant(spark):
    """The input-hint invariant on the fixture itself: extracting the
    stored html reproduces the stored text byte-identically."""
    pages = extract_pages(generate_pages(spark, 3000, n_partitions=4),
                          out_col="etext")
    bad = pages.where(
        (F.col("etext") != F.col("text")) | F.col("etext").isNull()
    ).count()
    assert bad == 0


def test_extract_plan_shapes(spark):
    """engine='jvm' stays inside codegen (no Python in the plan);
    engine='arrow' is exactly one mapInPandas over the scan (no
    shuffle, no per-row Python)."""
    df = generate_pages(spark, 100, n_partitions=1)
    # plan the extraction over a parquet-backed frame to mimic the real
    # scan (the generator itself is mapInPandas, so split the lineage)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.mode("overwrite").parquet(d + "/p")
        scan = spark.read.parquet(d + "/p")

        def planned(engine):
            return (
                extract_pages(scan, out_col="etext", engine=engine)
                .select("url", "etext")
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )

        jvm_plan = planned("jvm")
        arrow_plan = planned("arrow")
    assert "EvalPython" not in jvm_plan and "InPandas" not in jvm_plan
    assert arrow_plan.count("MapInPandas") == 1
    assert "Exchange" not in arrow_plan
    assert "BatchEvalPython" not in arrow_plan  # never per-row Python
