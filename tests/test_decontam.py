"""Unit tests for paragraph-level dedup and benchmark decontamination
(operators/dedup.py round-4 additions). Driver-level value parity vs
DuckDB is covered by test_entry_contract.py (paragraph_dedup_parity,
decontaminate_documents, decontaminate_ngrams); these tests pin the
operator edge cases the constructed driver corpora cannot reach."""

import pytest

from hll_spark.operators.dedup import (
    decontaminate_contains,
    decontaminate_ngrams,
    paragraph_dedup,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


# ---------------------------------------------------------------------------
# paragraph_dedup


def test_paragraph_dedup_keeps_first_occurrence(spark):
    df = _docs(
        spark,
        [
            (1, "alpha\nbeta"),
            (2, "beta\ngamma"),  # beta first seen in doc 1
            (3, "alpha\ngamma\ndelta"),
        ],
    )
    out = {
        r["doc_id"]: r["text"]
        for r in paragraph_dedup(df, "text", "doc_id").collect()
    }
    assert out == {1: "alpha\nbeta", 2: "gamma", 3: "delta"}


def test_paragraph_dedup_within_doc_repeat(spark):
    # a paragraph repeated INSIDE one document keeps only its first copy
    df = _docs(spark, [(1, "x\ny\nx\nx")])
    out = paragraph_dedup(df, "text", "doc_id").collect()[0]["text"]
    assert out == "x\ny"


def test_paragraph_dedup_blank_paragraphs_survive(spark):
    # blank paragraphs are structure, not content: never deduped, and
    # reassembly preserves their positions
    df = _docs(spark, [(1, "a\n\nb"), (2, "a\n\nc")])
    out = {
        r["doc_id"]: r["text"]
        for r in paragraph_dedup(df, "text", "doc_id").collect()
    }
    assert out == {1: "a\n\nb", 2: "\nc"}


def test_paragraph_dedup_fully_deduped_doc_stays(spark):
    # a doc whose every paragraph was seen earlier comes back as an
    # empty-text row, not a dropped row
    df = _docs(spark, [(1, "p\nq"), (2, "p\nq")])
    out = {
        r["doc_id"]: r["text"]
        for r in paragraph_dedup(df, "text", "doc_id").collect()
    }
    assert out == {1: "p\nq", 2: ""}


def test_paragraph_dedup_metachar_delimiter(spark):
    # the delimiter is literal, not a regex ('|' must not split
    # between every character)
    df = _docs(spark, [(1, "aa|bb"), (2, "bb|cc")])
    out = {
        r["doc_id"]: r["text"]
        for r in paragraph_dedup(df, "text", "doc_id", delim="|").collect()
    }
    assert out == {1: "aa|bb", 2: "cc"}


# ---------------------------------------------------------------------------
# decontaminate_contains


def test_contains_counts_and_flags(spark):
    docs = _docs(
        spark,
        [
            (1, "the quick brown fox"),
            (2, "lazy dog sleeps"),
            (3, "quick brown and lazy dog both"),
        ],
    )
    snips = spark.createDataFrame(
        [("quick brown",), ("lazy dog",)], ["snippet"]
    )
    out = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in decontaminate_contains(docs, snips).collect()
    }
    assert out == {1: (1, True), 2: (1, True), 3: (2, True)}


def test_contains_empty_snippet_set(spark):
    docs = _docs(spark, [(1, "anything")])
    snips = spark.createDataFrame([("x",)], ["snippet"]).where("snippet <> 'x'")
    out = decontaminate_contains(docs, snips).collect()
    assert [(r["n_hits"], r["contaminated"]) for r in out] == [(0, False)]


# ---------------------------------------------------------------------------
# decontaminate_ngrams


def test_ngrams_overlap_counts_distinct(spark):
    docs = _docs(
        spark,
        [
            (1, "a b c d e"),  # shares "a b c" and "b c d" with bench
            (2, "x y z w v"),
            (3, "a b c a b c d"),  # repeated gram counts once
        ],
    )
    bench = _docs(spark, [(100, "a b c d")])
    out = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in decontaminate_ngrams(docs, bench, n=3).collect()
    }
    assert out == {1: (2, True), 2: (0, False), 3: (2, True)}


def test_ngrams_short_doc_is_clean(spark):
    # docs (and bench docs) shorter than n words produce NO grams —
    # guards the sequence(1, 0)-descends Spark pitfall
    docs = _docs(spark, [(1, "a b"), (2, "")])
    bench = _docs(spark, [(100, "a b c d e")])
    out = decontaminate_ngrams(docs, bench, n=4).collect()
    assert all(r["n_hits"] == 0 and not r["contaminated"] for r in out)


def test_ngrams_invalid_n_raises(spark):
    docs = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        decontaminate_ngrams(docs, docs, n=0)


# ---------------------------------------------------------------------------
# repeated_span_stats (ExactSubstr-style repeated-span coverage)
# ---------------------------------------------------------------------------

from hll_spark.operators.dedup import repeated_span_stats  # noqa: E402


def test_repeated_span_stats_hand_corpus(spark):
    # n=3 word grams; duplicates both ACROSS docs (d1/d2 share
    # "a b c" + "b c d") and WITHIN one doc (d4 repeats its whole
    # period twice); d5 is shorter than n (no grams at all)
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "x a b c d y"),
            (3, "unique tokens only here"),
            (4, "p q r p q r p q"),
            (5, "too short"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.total_tokens, r.dup_ngrams, r.covered_tokens, r.coverage_frac)
        for r in repeated_span_stats(docs, n=3).collect()
    }
    # d1: grams [a b c][b c d][c d e][d e f]; first two duplicated ->
    # covered token positions 0..3 (union, NOT 2*3=6: overlap counted once)
    assert got[1] == (6, 2, 4, 4 / 6)
    # d2: [x a b][a b c][b c d][c d y] -> positions 1..4 covered
    assert got[2] == (6, 2, 4, 4 / 6)
    assert got[3] == (4, 0, 0, 0.0)
    # d4: every gram occurs twice within the doc -> full coverage
    assert got[4] == (8, 6, 8, 1.0)
    assert got[5] == (2, 0, 0, 0.0)


def test_repeated_span_stats_partition_invariant(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = repeated_span_stats(docs, n=5).collect()
    b = repeated_span_stats(docs.repartition(32), n=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_repeated_span_stats_validation(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        repeated_span_stats(docs, n=1)


# ---------------------------------------------------------------------------
# remove_repeated_spans (the removal half of ExactSubstr)
# ---------------------------------------------------------------------------

from hll_spark.operators.dedup import remove_repeated_spans  # noqa: E402


def test_remove_repeated_spans_hand_corpus(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),
            (2, "x a b c d y"),
            (4, "p q r p q r p q"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.text_clean, r.kept_tokens, r.removed_tokens)
        for r in remove_repeated_spans(docs, n=3).collect()
    }
    # d1 owns both shared grams (smallest (doc,pos)): untouched
    assert got[1] == ("a b c d e f", 6, 0)
    # d2 loses starts {1,2} -> tokens 1..4 cut, "x"/"y" survive
    assert got[2] == ("x y", 2, 4)
    # d4 repeats its own period: first occurrence of each gram
    # (starts 0..2) owns; starts 3..5 cut -> tokens 3..7 removed
    assert got[4] == ("p q r", 3, 5)


def test_remove_repeated_spans_keeps_clone_survivor_whole(spark):
    # exact clones: one doc must survive byte-identical (modulo the
    # documented single-space normalization), the other loses its
    # fully-covered span set
    docs = spark.createDataFrame(
        [(1, "one two three four five six"), (2, "one two three four five six")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in remove_repeated_spans(docs, n=3).collect()}
    assert got[1].text_clean == "one two three four five six"
    assert got[1].removed_tokens == 0
    assert got[2].text_clean == ""
    assert got[2].kept_tokens == 0


def test_remove_repeated_spans_partition_invariant(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = remove_repeated_spans(docs, n=5).collect()
    b = remove_repeated_spans(docs.repartition(32), n=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# decontaminate_ngrams_bloom (Bloom pre-filter + exact verify)
# ---------------------------------------------------------------------------

from hll_spark.operators.dedup import decontaminate_ngrams_bloom  # noqa: E402


def test_bloom_decontam_equals_exact_recipe(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where("doc_id % 10 = 3")
    exact = decontaminate_ngrams(docs, bench, n=5).collect()
    bloom = decontaminate_ngrams_bloom(docs, bench, n=5).collect()
    assert sorted(map(tuple, bloom)) == sorted(map(tuple, exact))


def test_bloom_decontam_exact_under_heavy_false_positives(spark):
    # a 64-bit bitmap over hundreds of bench grams saturates: nearly
    # every corpus gram is a Bloom HIT, so this passes only if the
    # verify join removes every false positive
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.where("doc_id % 10 = 3")
    exact = decontaminate_ngrams(docs, bench, n=5).collect()
    bloom = decontaminate_ngrams_bloom(
        docs, bench, n=5, m_bits=64, k=2
    ).collect()
    assert sorted(map(tuple, bloom)) == sorted(map(tuple, exact))


def test_bloom_decontam_validation(spark):
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        decontaminate_ngrams_bloom(docs, docs, n=0)


# ---------------------------------------------------------------------------
# remove_repeated_spans vs a plain-Python reference (Hypothesis)
# ---------------------------------------------------------------------------

import re as _re  # noqa: E402

from hypothesis import given, settings, strategies as st  # noqa: E402


def _ref_remove_spans(rows, n):
    """Transparent reference for the keep-first span election: global
    gram inventory, min((doc,pos)) ownership, per-doc interval union,
    token rebuild."""
    words = {d: _re.split(" +", t) for d, t in rows}
    grams = {}
    for d, t in rows:
        w = words[d]
        for i in range(len(w) - n + 1):
            grams.setdefault(" ".join(w[i : i + n]), []).append((d, i))
    cuts = {d: set() for d, _ in rows}
    for occ in grams.values():
        if len(occ) >= 2:
            owner = min(occ)
            for d, i in occ:
                if (d, i) != owner:
                    cuts[d].add(i)
    out = {}
    for d, t in rows:
        w = words[d]
        removed = set()
        for s in cuts[d]:
            removed.update(range(s, s + n))
        kept = [w[i] for i in range(len(w)) if i not in removed]
        out[d] = (" ".join(kept), len(kept), len(w) - len(kept))
    return out


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "ab"]), min_size=1, max_size=12
        ).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=2, max_value=3),
)
def test_remove_repeated_spans_matches_reference(spark, texts, n):
    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.text_clean, r.kept_tokens, r.removed_tokens)
        for r in remove_repeated_spans(docs, n=n).collect()
    }
    assert got == _ref_remove_spans(rows, n)
