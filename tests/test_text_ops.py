"""Text-analysis operator tests over the documents table + pages synth."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hll_spark.operators.text import (
    add_quality_columns,
    detect_language,
    fingerprint_documents,
    token_count,
)
from hll_spark.sources.tables import generate_pages, generate_pages_pdf


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_token_count_matches_python_split(spark, docs):
    got = docs.select("doc_id", token_count("text").alias("n")).toPandas()
    texts = docs.select("doc_id", "text").toPandas()
    merged = got.merge(texts, on="doc_id")
    for _, row in merged.iterrows():
        assert row["n"] == len(row["text"].split()), row["text"][:50]


def test_quality_columns_schema_and_ranges(spark, docs):
    out = add_quality_columns(docs).toPandas()
    assert set(["n_tokens", "punct_ratio", "quality"]) <= set(out.columns)
    assert ((out["quality"] >= 0) & (out["quality"] <= 1)).all()
    assert ((out["punct_ratio"] >= 0) & (out["punct_ratio"] <= 1)).all()


def test_lang_id_deterministic_and_plausible(spark):
    pdf = pd.DataFrame(
        {
            "id": range(6),
            "text": [
                "the quick brown fox jumps over the lazy dog and the cat",
                "der schnelle braune fuchs springt über den faulen hund und",
                "le renard brun rapide saute par dessus le chien paresseux les",
                "这是一段中文文本用来测试语言识别的功能是否正常工作",
                "это русский текст для проверки определения языка",
                "",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    got = {r["id"]: r["lang_pred"] for r in detect_language(df).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "fr"
    assert got[3] == "zh"
    assert got[4] == "ru"
    assert got[5] == "other"
    # deterministic across runs
    again = {r["id"]: r["lang_pred"] for r in detect_language(df).collect()}
    assert got == again


def test_fingerprint_identical_for_identical_text(spark):
    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3],
            "text": ["alpha beta " * 20, "alpha beta " * 20, "gamma delta " * 20],
        }
    )
    rows = fingerprint_documents(spark.createDataFrame(pdf)).collect()
    fp = {r["id"]: r["fingerprint"] for r in rows}
    assert fp[1] == fp[2] != fp[3]


def test_pages_generator_deterministic_invariant(spark):
    a = generate_pages_pdf(500, seed=42)
    b = generate_pages_pdf(500, seed=42)
    pd.testing.assert_frame_equal(a, b)
    # per-row invariant: text is a function of url only
    joined = a.merge(b[["url", "text"]].drop_duplicates(), on="url")
    assert (joined["text_x"] == joined["text_y"]).all()
    # duplicates exist and langs are skewed toward en
    assert a["url"].nunique() < len(a)
    assert (a["lang"] == "en").mean() > 0.25


def test_pages_distributed_generator(spark):
    df = generate_pages(spark, 2000, n_partitions=4)
    assert df.count() == 2000
    assert df.schema.fieldNames() == ["url", "warc_ts", "html", "text", "lang"]
    # same url -> same text across the whole distributed table
    dup_check = (
        df.groupBy("url").agg(F.countDistinct("text").alias("nt")).where("nt > 1")
    )
    assert dup_check.count() == 0


def test_scrub_pii_redacts_and_counts(spark):
    from hll_spark.operators.text import pii_match_count, scrub_pii

    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3, 4],
            "text": [
                "contact alice.smith+x@corp-mail.co.uk or bob@ex.io now",
                "server at 192.168.001.42 went down",
                "call 415-555-0199 22 or card 4111 1111 1111 1111",
                "clean text with number 42 and v1.2.3 left intact",
            ],
        }
    )
    df = spark.createDataFrame(pdf)
    out = {
        r.id: r.clean
        for r in df.select("id", scrub_pii("text").alias("clean")).collect()
    }
    assert out[1] == "contact <EMAIL> or <EMAIL> now"
    assert out[2] == "server at <IP> went down"
    assert "<NUM>" in out[3] and "4111" not in out[3]
    assert out[4] == pdf.text[3]  # short numbers and versions untouched
    counts = df.select(
        "id", pii_match_count("text", "email").alias("n")
    ).collect()
    assert {r.id: r.n for r in counts} == {1: 2, 2: 0, 3: 0, 4: 0}


def test_gopher_filters_flag_boilerplate(spark):
    from hll_spark.operators.text import gopher_quality_filters

    good = ("the quick brown fox jumps over a lazy dog and then walks "
            "away toward the old stone bridge near town") * 1
    dup_lines = "\n".join(["same boilerplate line here"] * 8 + ["one more"])
    symbol_soup = "#tag " * 30 + "word"
    repetitive = "buy now " * 60
    pdf = pd.DataFrame(
        {
            "id": [1, 2, 3, 4],
            "text": [good, dup_lines, symbol_soup, repetitive],
        }
    )
    out = {
        r.id: r
        for r in gopher_quality_filters(spark.createDataFrame(pdf)).collect()
    }
    assert out[1].gopher_pass
    assert not out[2].gopher_pass and out[2].dup_line_frac > 0.5
    assert not out[3].gopher_pass and out[3].symbol_word_ratio > 0.1
    assert not out[4].gopher_pass and out[4].top_bigram_frac > 0.2


def test_strip_boilerplate_lines(spark):
    """Lines in > max_line_df docs are stripped; rare lines and blank
    lines survive in original order; within-doc duplicates of a rare
    line are kept (DF counts distinct DOCS, not occurrences)."""
    from hll_spark.operators.text import strip_boilerplate_lines

    boiler = "SUBSCRIBE TO OUR NEWSLETTER"
    rows = []
    for i in range(10):
        body = f"unique body {i}\n\nrepeated rare {i % 5}\nrepeated rare {i % 5}"
        rows.append((i, f"{boiler}\n{body}\n{boiler}"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r.text
        for r in strip_boilerplate_lines(
            df, "text", "doc_id", max_line_df=5
        ).collect()
    }
    for i in range(10):
        assert out[i] == (
            f"unique body {i}\n\nrepeated rare {i % 5}\nrepeated rare {i % 5}"
        )


def test_strip_boilerplate_all_boilerplate_doc_survives_empty(spark):
    """A doc made ENTIRELY of boilerplate keeps its row (empty text) —
    it must not silently vanish from the corpus."""
    from hll_spark.operators.text import strip_boilerplate_lines

    b = "COOKIE BANNER"
    rows = [(i, f"{b}\ncontent {i}") for i in range(8)] + [(99, b)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r.text
        for r in strip_boilerplate_lines(df, "text", "doc_id", 5).collect()
    }
    assert out[99] == ""
    assert all(out[i] == f"content {i}" for i in range(8))
    assert len(out) == 9


def test_strip_boilerplate_regex_metachar_delim(spark):
    """Delimiters that are regex metacharacters split literally."""
    from hll_spark.operators.text import strip_boilerplate_lines

    rows = [(i, f"BOILER|content {i}") for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: r.text
        for r in strip_boilerplate_lines(
            df, "text", "doc_id", max_line_df=5, delim="|"
        ).collect()
    }
    assert all(out[i] == f"content {i}" for i in range(8))


# ---------------------------------------------------------------------------
# normalize_unicode
# ---------------------------------------------------------------------------

from hll_spark.operators.text import normalize_unicode  # noqa: E402


def test_normalize_unicode_nfc_composes(spark):
    import unicodedata

    rows = [
        (1, "caf" + "e\u0301"),    # e + combining acute -> U+00E9
        (2, "A\u030a" + "rhus"),   # A + combining ring -> U+00C5
        (3, "plain ascii"),
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.norm
        for r in df.select(
            "doc_id", normalize_unicode("text", "NFC").alias("norm")
        ).collect()
    }
    assert got[1] == "caf\u00e9"
    assert got[2] == "\u00c5rhus"
    assert got[3] == "plain ascii"
    assert got[4] is None
    assert got[5] == ""
    # NFC is idempotent and matches CPython's normalizer
    for i, t in rows:
        if t is not None:
            assert got[i] == unicodedata.normalize("NFC", t)


def test_normalize_unicode_nfkd_form(spark):
    df = spark.createDataFrame(
        [(1, "\ufb01ne \u00bd")], "id long, text string"
    )
    got = df.select(normalize_unicode("text", "NFKD").alias("n")).collect()[0].n
    # compatibility decomposition: fi ligature splits, vulgar half
    # becomes 1/2 (with FRACTION SLASH U+2044)
    assert got == "fine 1\u20442"


def test_normalize_unicode_invalid_form():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        normalize_unicode("text", "NFX")


# ---------------------------------------------------------------------------
# char_entropy
# ---------------------------------------------------------------------------

from hll_spark.operators.text import char_entropy  # noqa: E402


def test_char_entropy_hand_computed(spark):
    rows = [
        (0, "aab"),      # a:2/3, b:1/3
        (1, "abcd"),     # uniform quarter
        (2, "aaaa"),     # zero entropy
        (3, ""),
        (4, None),
        (5, "e\u0301"),  # 2 distinct codepoints (combining mark counts)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_chars, r.entropy_micro)
        for r in char_entropy(df).collect()
    }
    # micro(p) = floor(log10(p) * 1e6)
    assert got[0] == (3, -(2 * -176092 + 1 * -477122))
    assert got[1] == (4, 4 * 602060)
    assert got[2] == (4, 0)
    assert got[3] == (0, 0)
    assert got[4] == (0, 0)
    assert got[5] == (2, 2 * 301030)


def test_char_entropy_bits_scale(spark):
    df = spark.createDataFrame([(0, "abcd")], "doc_id long, text string")
    row = char_entropy(df).collect()[0]
    assert abs(row.entropy_bits - 2.0) < 1e-4  # 4 equiprobable symbols
    empty = spark.createDataFrame([(1, "")], "doc_id long, text string")
    assert char_entropy(empty).collect()[0].entropy_bits is None


def test_char_entropy_flags_repetitive_text(spark):
    rows = [(0, "aaaaaaaabbbbbbbb" * 8), (1, "The quick brown fox jumps!")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.entropy_bits for r in char_entropy(df).collect()}
    assert got[0] < 1.1 < got[1]


def test_char_entropy_matches_counter_reference(spark):
    import math
    from collections import Counter

    texts = [
        "mississippi", "aaa bbb ccc", "x", "", "the quick brown fox",
        "ababab", "é́e", "1234567890" * 3,
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_chars, r.entropy_micro)
        for r in char_entropy(df).collect()
    }
    for i, t in enumerate(texts):
        c = Counter(t)
        n = len(t)
        ent = -sum(
            cnt * math.floor(math.log10(cnt / n) * 1e6)
            for cnt in c.values()
        ) if n else 0
        assert got[i] == (n, ent), t


# -- sentence segmentation + page metadata (late r4) ------------------------


def test_split_sentences_semantics(spark):
    from hll_spark.operators.text import split_sentences

    docs = spark.createDataFrame(
        [
            (0, "One. Two!  Three? trailing tail"),
            (1, "Ellipsis wait... then more."),
            (2, "no terminator at all"),
            (3, ""),
            (4, None),
            (5, "..."),  # punctuation only -> no sentences
        ],
        "doc_id bigint, text string",
    )
    got = {}
    for r in split_sentences(docs, "text", "doc_id").collect():
        got.setdefault(r["doc_id"], []).append((r["sentence_no"], r["sentence"]))
    for v in got.values():
        v.sort()
    assert got[0] == [(0, "One."), (1, "Two!"), (2, "Three?"), (3, "trailing tail")]
    assert got[1] == [(0, "Ellipsis wait..."), (1, "then more.")]
    assert got[2] == [(0, "no terminator at all")]
    assert 3 not in got and 4 not in got and 5 not in got


def test_extract_page_meta_semantics(spark):
    from hll_spark.operators.extract import extract_page_meta

    pages = spark.createDataFrame(
        [
            (
                0,
                '<html lang="fr"><head><TITLE>Up</TITLE>'
                '<meta name="description" content="d0">'
                '<link rel="canonical" href="https://c/0"></head></html>',
            ),
            (1, "<html><head><title>T1</title></head><body></body></html>"),
            (2, "<html><meta name='description' content='single-quoted'>"),
        ],
        "page_id bigint, html string",
    )
    got = {r["page_id"]: r for r in extract_page_meta(pages, "html").collect()}
    assert got[0]["title"] == "Up"  # case-insensitive tag
    assert got[0]["meta_description"] == "d0"
    assert got[0]["html_lang"] == "fr"
    assert got[0]["canonical_url"] == "https://c/0"
    assert got[1]["title"] == "T1"
    assert got[1]["html_lang"] == "" and got[1]["canonical_url"] == ""
    # single-quoted attrs deliberately do not match the pinned form
    assert got[2]["meta_description"] == ""


def test_fix_mojibake_kernel_and_hypothesis():
    from hypothesis import given, settings, strategies as st

    from hll_spark.operators.text import _fix_mojibake_one

    # chars whose utf-8 bytes all exist in cp1252 (0x81/0x8d/0x8f/
    # 0x90/0x9d are unmapped) — the reversible mojibake domain
    def encodable(s):
        try:
            s.encode("utf-8").decode("cp1252")
            return True
        except UnicodeDecodeError:
            return False

    @given(
        st.text(
            alphabet=st.characters(
                min_codepoint=0x20, max_codepoint=0x2FFF
            ),
            min_size=1,
            max_size=40,
        )
    )
    @settings(max_examples=300, deadline=None)
    def roundtrip(s):
        if not encodable(s):
            return
        # restrict to originals that are NOT themselves mojibake-
        # shaped (a string like 'Ñ\\x91' legitimately unwinds one
        # level further — the repair cannot know it was intended)
        if _fix_mojibake_one(s) != s:
            return
        garbled = s.encode("utf-8").decode("cp1252")
        assert _fix_mojibake_one(garbled) == s

    roundtrip()


def test_fix_mojibake_spark(spark):
    from hll_spark.operators.text import fix_mojibake

    docs = spark.createDataFrame(
        [
            (0, "cafÃ© crÃ¨me"),
            (1, "already fine é ✓"),
            (2, "plain"),
            (3, None),
        ],
        "doc_id bigint, text string",
    )
    got = {
        r["doc_id"]: r["text"]
        for r in fix_mojibake(docs, "text").collect()
    }
    assert got == {
        0: "café crème",
        1: "already fine é ✓",
        2: "plain",
        3: None,
    }
