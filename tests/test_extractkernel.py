"""Differential tests for the Arrow extraction kernel.

Three independent implementations of the same chain are cross-checked:

1. the JVM column-expression chain (operators/extract.py) — the
   semantics of record,
2. the batch numpy kernel (operators/extractkernel.py) — the fast path
   under test,
3. a Python ``re`` mirror written here from the chain's patterns —
   an oracle cheap enough for hypothesis to hammer (no JVM round trip
   per example).

The kernel must agree with BOTH on every input: with (3) under
hypothesis-generated adversarial markup, and with (1) on a fixed
adversarial corpus plus fixture pages via Spark.
"""

import re

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from hll_spark.operators.extract import (
    extract_pages,
    extract_sketch_agg,
    extract_text,
    wrap_html_py,
)
from hll_spark.operators.extractkernel import extract_text_batch
from hll_spark.sources.tables import generate_pages_pdf

# re.A: Java's CASE_INSENSITIVE (without UNICODE_CASE) is ASCII-only;
# Python's default IGNORECASE would also fold 'ſ'/'K' onto s/k.
_BODY = re.compile(r"(?is)<body[^>]*>(.*)</body>", re.A)
_BLOCKS = re.compile(
    r"(?is)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>|<!--.*?-->", re.A
)
_TAGS = re.compile(r"(?i)<[^>]+>|&nbsp;|&#160;", re.A)
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def reference_chain(doc: bytes) -> str:
    """Python mirror of extract.py's JVM chain (independent oracle)."""
    s = doc.decode("utf-8", "replace")
    if "<body" in s.lower():
        m = _BODY.search(s)
        x = m.group(1) if m else ""
    else:
        x = s
    x = _BLOCKS.sub(" ", x)
    x = _TAGS.sub(" ", x)
    x = _WS.sub(" ", x).strip(" ")
    for pat, rep in [
        ("&#39;", "'"),
        ("&apos;", "'"),
        ("&quot;", '"'),
        ("&gt;", ">"),
        ("&lt;", "<"),
        ("&amp;", "&"),
    ]:
        x = x.replace(pat, rep)
    return x


ADVERSARIAL = [
    b"",
    b"plain text no markup",
    b"<html><body>hi</body></html>",
    b"a < b and c > d",
    b"x < y <!-- > --> z",                      # literal '<' + block priority
    b"if a < b <script>alert(1)</script> end",  # block removed before tags
    b"<script>no close tag here",               # unterminated block -> tag
    b"<script src='x'>body</script>tail",
    b"<ScRiPt>UPPER</sCrIpT>ok",
    b"<style>p { color: red > blue }</style>text",
    b"<!-- <script>inside comment</script> -->after",
    b"<script><!-- --></script>x",              # block order within pass 1
    b"<body>A</body><body>B</body>",            # greedy: last </body>
    b"<body>never closed",                      # '<body' but no match -> ''
    b"</body>before<body>after</body>",
    b"<bodyguard>x</bodyguard>",                # '<body' prefix quirk
    b"<body foo=bar>inner</body>trailing</body>",
    b"text &nbsp; and &#160; entities",
    b"&amp;lt; stays &lt; decodes &quot;q&quot; &#39;a&apos;",
    b"<a>&nbsp;</a>",                           # entity inside stripped tag
    b"<a &nbsp;>x",                             # entity inside tag span
    b"<>empty tag<> <a>real</a>",
    b"<a<b> nested lt",
    b"<<<<<a> many lt",
    b"<unclosed",
    b"tag<p>break</p>word",
    b"  \t\n lots \r\n of \x0b space  ",
    b"<!--->",                                  # too short to close
    b"<!-- unterminated comment with > inside",
    b"\xe4\xb8\xad\xe6\x96\x87<p>\xc3\xa9</p>", # multibyte utf-8
    b"<body><script>s</script>keep<!--c--></body>",
    b"<script>a</script><script>b</script>mid",
    b"&NBSP; case insensitive entity",
    b"a<script >sp in tag</script>b",
    b"<script</script>x",                       # open tag missing '>'
    b"<!--a--><!--b-->adjacent",
    b"<bo",                                     # pattern prefix at doc end
    b"x<body",                                  # '<body' at very end
]


def test_kernel_matches_reference_on_adversarial_corpus():
    got = extract_text_batch(ADVERSARIAL)
    for doc, g in zip(ADVERSARIAL, got):
        assert g == reference_chain(doc), doc


_markup_atoms = st.sampled_from(
    list("ab z<>&\"'/;#!-\t\n")
    + [
        "&amp;", "&nbsp;", "&#160;", "&lt;", "&#39;",
        "<script>", "</script>", "<style>", "</style>",
        "<!--", "-->", "<body>", "</body>", "<body", "<p>", "</p>",
        "<BODY>", "</BODY>", "<SCRIPT>", "</SCRIPT>", "中",
    ]
)
_pages = st.lists(_markup_atoms, max_size=30).map(
    lambda parts: "".join(parts).encode("utf-8")
)


@settings(max_examples=400, deadline=None)
@given(docs=st.lists(_pages, max_size=6))
def test_kernel_matches_reference_property(docs):
    got = extract_text_batch(docs)
    for doc, g in zip(docs, got):
        assert g == reference_chain(doc), doc


def test_reference_matches_jvm_chain(spark):
    """Anchor the Python oracle itself against the JVM chain once, on
    the same adversarial corpus plus real fixture pages."""
    pages = [bytes(h) for h in generate_pages_pdf(n_rows=300, seed=5)["html"]]
    docs = ADVERSARIAL + pages
    df = spark.createDataFrame(pd.DataFrame({"html": docs}))
    jvm = [
        r["t"] for r in df.select(extract_text("html").alias("t")).collect()
    ]
    assert jvm == [reference_chain(d) for d in docs]


def test_kernel_null_and_empty():
    assert extract_text_batch([]) == []
    assert extract_text_batch([None, b"", b"<p>x</p>", None]) == [
        None, "", "x", None
    ]


def test_extract_pages_engines_agree(spark):
    pdf = generate_pages_pdf(n_rows=400, seed=9)
    df = spark.createDataFrame(pdf[["url", "html"]])
    a = extract_pages(df, engine="arrow").select("url", "text")
    j = extract_pages(df, engine="jvm").select("url", "text")
    ra = {r["url"]: r["text"] for r in a.collect()}
    rj = {r["url"]: r["text"] for r in j.collect()}
    assert ra == rj
    with pytest.raises(ValueError):
        extract_pages(df, engine="nope")


def test_extract_sketch_agg_exact_tier(spark):
    """Fused extract+hash+sketch: in the EXPLICIT tier the estimate is
    the exact distinct count of the EXTRACTED texts."""
    pdf = generate_pages_pdf(n_rows=500, seed=13)
    df = spark.createDataFrame(pdf[["html"]])
    from hll_spark.operators.agg import hll_estimate_udf

    row = (
        extract_sketch_agg(df, "html")
        .withColumn("est", hll_estimate_udf()(F.col("sketch")))
        .collect()[0]
    )
    exact = len({reference_chain(bytes(h)) for h in pdf["html"]})
    assert row["rows_seen"] == 500
    assert row["est"] == exact


def test_kernel_many_empty_and_null_docs():
    """Hundreds of empty docs at one buffer offset must not overflow the
    int8 slice-delta accumulation (they are excluded, not stacked)."""
    docs = [b""] * 300 + [b"<p>a</p>"] + [None] * 300 + [b"<body>b</body>"]
    got = extract_text_batch(docs)
    assert got[:300] == [""] * 300
    assert got[300] == "a"
    assert got[301:601] == [None] * 300
    assert got[601] == "b"


@settings(max_examples=150, deadline=None)
@given(docs=st.lists(st.binary(max_size=80), max_size=5))
def test_kernel_never_crashes_on_arbitrary_bytes(docs):
    """Invalid UTF-8 relaxes the byte-level parity guarantee (FFFD
    counts may differ from the JVM decoder) but never the contract
    that the kernel returns a string per doc, deterministically."""
    a = extract_text_batch(docs)
    b = extract_text_batch(docs)
    assert a == b
    assert all(isinstance(x, str) for x in a)


def test_extract_sketch_agg_null_rows_excluded(spark):
    """rows_seen counts sketched texts, not raw rows — null html rows
    are filtered exactly like sketch_partials' null filter."""
    pdf = generate_pages_pdf(n_rows=50, seed=3)
    rows = [(bytes(h),) for h in pdf["html"]] + [(None,)] * 7
    df = spark.createDataFrame(rows, "html binary")
    out = extract_sketch_agg(df, "html").collect()[0]
    assert out["rows_seen"] == 50


def test_kernel_accepts_str_inputs(spark):
    """The JVM chain accepts string html columns; the kernel (and the
    SQL UDF / arrow engine built on it) must too."""
    docs = ["<p>hello</p>", "<body>x</body>", None]
    assert extract_text_batch(docs) == ["hello", "x", None]
    from hll_spark.functions import register_sql_functions

    register_sql_functions(spark)
    spark.createDataFrame(
        [("<p>s</p>",)], "html string"
    ).createOrReplaceTempView("strpages")
    got = spark.sql("SELECT extract_text(html) AS t FROM strpages").collect()
    assert got[0]["t"] == "s"


def test_flat_entry_matches_batch_and_bytes_mode():
    """extract_text_flat over an Arrow-layout flat corpus (zero-copy,
    read-only buffer) must equal extract_text_batch element-wise, and
    as_bytes=True must return exactly the utf-8 encoding of the str
    results (the fused sketch path hashes those bytes)."""
    import numpy as np

    from hll_spark.operators.extractkernel import (
        extract_text_batch,
        extract_text_flat,
    )

    docs = [
        b"<html><body>Hello &amp; welcome</body></html>",
        None,
        b"<body>a<script>x</script>b</body>",
        b"no body tag at all",
        b"",
        b"<body  class=x>sp\t\nace   runs</body>trailing<body>ignored</body>",
    ]
    want = extract_text_batch(docs)
    byte_docs = [d if d is not None else b"" for d in docs]
    lens = np.array([len(d) for d in byte_docs], dtype=np.int64)
    offs = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    flat = np.frombuffer(b"".join(byte_docs), dtype=np.uint8)  # read-only
    null_mask = [d is None for d in docs]
    got = extract_text_flat(flat, offs, null_mask)
    assert got == want
    got_b = extract_text_flat(flat, offs, null_mask, as_bytes=True)
    assert got_b == [None if s is None else s.encode("utf-8") for s in want]
    assert extract_text_flat(flat[:0], offs[:1], [], True) == []


def test_spans_reconstruct_flat_output():
    """extract_text_spans is the zero-materialization view of the same
    extraction: slicing its (out, starts, ends) and running the decode
    passes on has_amp docs must reproduce extract_text_flat exactly."""
    from hll_spark.operators.extractkernel import (
        _DECODE_PASSES,
        extract_text_flat,
        extract_text_spans,
    )

    docs = [
        b"<body>plain text</body>",
        b"<body>fish &amp; chips &lt;now&gt;</body>",
        b"<body>it&#39;s &apos;quoted&apos;</body>",
        b"<body>&amp;amp; stays entity-text</body>",
        b"<body>bare & ampersand</body>",  # has_amp but decode no-op
        b"",
        b"<body></body>",
        b"<p>no body tag</p>",
        b"<body><script>x</script>  </body>",  # whitespace-only -> ''
    ]
    lens = np.array([len(d) for d in docs], dtype=np.int64)
    offs = np.zeros(len(docs) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    buf = np.frombuffer(b"".join(docs), dtype=np.uint8)
    null_mask = [False] * len(docs)

    flat = extract_text_flat(buf, offs, null_mask, as_bytes=True)
    out, starts, ends, empty, has_amp = extract_text_spans(buf, offs)
    big = out.tobytes()
    rebuilt = []
    for d in range(len(docs)):
        b = b"" if empty[d] else big[starts[d]:ends[d]]
        if has_amp[d]:
            for pat, rep in _DECODE_PASSES:
                if pat in b:
                    b = b.replace(pat, rep)
        rebuilt.append(b)
    assert rebuilt == flat
    # the docs constructed with entities must actually take the amp path
    assert list(has_amp[:5]) == [False, True, True, True, True]


def test_extract_sketch_agg_entity_docs(spark):
    """Entity-bearing docs route through the fused agg's per-doc decode
    branch; the estimate must still equal the exact distinct count of
    the (decoded) extracted texts."""
    from hll_spark.operators.agg import hll_estimate_udf

    htmls = [
        f"<body>doc {i} fish &amp; chips &#39;n &lt;mushy&gt; peas</body>".encode()
        for i in range(40)
    ] + [
        f"<body>plain doc {i}</body>".encode() for i in range(40)
    ] + [
        b"<body>fish &amp; chips &#39;n &lt;mushy&gt; peas dup</body>",
        b"<body>fish &amp; chips &#39;n &lt;mushy&gt; peas dup</body>",
    ]
    df = spark.createDataFrame([(h,) for h in htmls], "html binary")
    row = (
        extract_sketch_agg(df, "html")
        .withColumn("est", hll_estimate_udf()(F.col("sketch")))
        .collect()[0]
    )
    exact = len(set(extract_text_batch(htmls, as_bytes=True)))
    assert row["rows_seen"] == len(htmls)
    assert row["est"] == exact == 81
