"""vocab.py: corpus vocabulary, tf-idf ranking, and the pre-tokenizer.

Cross-engine value parity is driver-checked (top_vocab /
tfidf_top_terms oracles); these tests pin the operator contracts:
the pre-tokenizer split itself, hand-computed tf-idf scores, tie
determinism, partition invariance, and the top-k plan shape.
"""

import math

import pytest
from pyspark.sql import functions as F

from hll_spark.operators.vocab import (
    pretokenize,
    tfidf_top_terms,
    top_vocab,
)

SF = "/root/testdata/sf0.01"


def test_pretokenize_splits_like_a_bpe_trainer(spark):
    rows = (
        spark.createDataFrame(
            [("Hello world, 42 times!  x",)], "text string"
        )
        .select(pretokenize("text").alias("toks"))
        .collect()
    )
    # leading-space convention: every token after the first carries
    # its preceding single space; letter/digit/symbol runs separate
    assert rows[0].toks == [
        "Hello", " world", ",", " 42", " times", "!", " x"
    ]


def test_top_vocab_hand_corpus(spark):
    docs = spark.createDataFrame(
        [(1, "a b b"), (2, "b a a c")], "doc_id long, text string"
    )
    got = [(r.token, r.n_occurrences, r.rank) for r in top_vocab(docs, k=3).collect()]
    # counts: head tokens 'a'/'b' 1 each; ' a' 2, ' b' 2, ' c' 1 —
    # ties broken token-ascending (space sorts before letters, so
    # ' a' < ' b' and ' c' outranks 'a'/'b' at count 1)
    assert got == [(" a", 2, 1), (" b", 2, 2), (" c", 1, 3)]


def test_top_vocab_partition_invariant(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = [tuple(r) for r in top_vocab(docs, k=20).collect()]
    b = [tuple(r) for r in top_vocab(docs.repartition(23), k=20).collect()]
    assert a == b


def test_top_vocab_plan_is_take_ordered(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = top_vocab(docs, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # never a global sort


def test_tfidf_hand_corpus(spark):
    # 3 docs; 'x' appears in all (df=3), 'y' in one (df=1)
    docs = spark.createDataFrame(
        [(1, "x x y"), (2, "x z"), (3, "x q q")],
        "doc_id long, text string",
    )
    rows = tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    d1 = {r.term: (r.tf, r.df, r.score, r.rank) for r in by_doc[1]}
    # doc1: y -> tf=1, df=1, score=1*(3/1)=3; x -> tf=2, df=3, score=2
    assert d1["y"] == (1, 1, 3.0, 1)
    assert d1["x"] == (2, 3, 2.0, 2)
    d3 = {r.term: (r.tf, r.df, r.score, r.rank) for r in by_doc[3]}
    assert d3["q"] == (2, 1, 6.0, 1)
    assert d3["x"] == (1, 3, 1.0, 2)


def test_tfidf_rank_capped_and_deterministic(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = tfidf_top_terms(docs, k=3)
    per_doc = out.groupBy("doc_id").count().collect()
    assert all(r["count"] <= 3 for r in per_doc)
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, tfidf_top_terms(docs.repartition(29), k=3).collect()))
    assert a == b


def test_vocab_validation(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        top_vocab(docs, k=0)
    with pytest.raises(ValueError):
        tfidf_top_terms(docs, k=0)
