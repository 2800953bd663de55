"""URL normalization: rule tests + Spark<->DuckDB mirror differential."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hll_spark.operators.url import (
    duckdb_normalize_expr,
    normalize_url,
    strip_fragment,
    url_host,
)

CASES = [
    # (input, normalized, host)
    ("HTTP://Example.COM:80/a", "http://example.com/a", "example.com"),
    ("https://Example.com:443/", "https://example.com/", "example.com"),
    ("https://example.com:8443/x", "https://example.com:8443/x", "example.com"),
    ("http://example.com", "http://example.com/", "example.com"),
    ("http://EXAMPLE.com#frag", "http://example.com/", "example.com"),
    ("https://h.io/p?b=2&a=1", "https://h.io/p?b=2&a=1", "h.io"),  # query kept
    ("https://h.io/p#a#b", "https://h.io/p", "h.io"),
    ("ftp://Files.example.com:21/f", "ftp://files.example.com:21/f",
     "files.example.com"),  # only http/https default ports dropped
    ("no-scheme/path#frag", "no-scheme/path", ""),
    ("", "", ""),
    ("https://User@Host.com/x", "https://user@host.com/x", "user@host.com"),
    ("HTTPS://h.io:443", "https://h.io/", "h.io"),
    ("http://h.io:080/x", "http://h.io:080/x", "h.io"),  # literal, not 80
    ("http://h.io:80?q=1", "http://h.io?q=1", "h.io"),
    ("https://h.io/a/b/../c", "https://h.io/a/b/../c", "h.io"),  # no dot-segment removal
]


def test_normalization_rules(spark):
    df = spark.createDataFrame(pd.DataFrame({"u": [c[0] for c in CASES]}))
    rows = df.select(
        normalize_url("u").alias("n"), url_host("u").alias("h")
    ).collect()
    for (u, want_n, want_h), r in zip(CASES, rows):
        assert r["n"] == want_n, u
        assert r["h"] == want_h, u


def test_duckdb_mirror_matches_spark(spark):
    """The oracle expression must track the Spark implementation on
    adversarial inputs, not just the driver query's synthesized shape."""
    urls = [c[0] for c in CASES] + [
        "https://h.io:443:443/x",   # double port-ish authority
        "http://:80/x",             # empty host
        "http://h.io:/x",           # colon, no digits
        "scheme+x.y-z://MiXeD.Case/Path",
        "https://h.io/#",
        "https://h.io/?#f",
        "a#b#c",
        "http://h.io/path with space",
        "https://h.io/\u00e9",      # non-ascii path
    ]
    df = spark.createDataFrame(pd.DataFrame({"u": urls}))
    got = [
        r["n"]
        for r in df.select(normalize_url(strip_fragment("u")).alias("n")).collect()
    ]
    # normalize_url strips the fragment itself; feeding a pre-stripped
    # column must be idempotent, which the mirror relies on
    got2 = [r["n"] for r in df.select(normalize_url("u").alias("n")).collect()]
    assert got == got2

    con = duckdb.connect()
    con.register("t", pd.DataFrame({"u": urls}))
    expr = duckdb_normalize_expr("regexp_replace(u, '(?s)#.*', '')")
    oracle = [r[0] for r in con.execute(f"SELECT {expr} FROM t").fetchall()]
    assert got == oracle


def test_null_passthrough(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"u": pd.array([None, "http://A.b/x"], dtype=object)})
    )
    rows = df.select(
        normalize_url("u").alias("n"), url_host("u").alias("h")
    ).collect()
    assert rows[0]["n"] is None and rows[0]["h"] is None
    assert rows[1]["n"] == "http://a.b/x"


def test_plan_is_jvm_only(spark):
    df = spark.range(10).select(
        F.concat(F.lit("https://h"), F.col("id").cast("string")).alias("u")
    )
    plan = (
        df.select(normalize_url("u"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "InPandas" not in plan
