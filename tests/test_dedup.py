"""Dedup operator tests on documents + synthetic near-dup corpora."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hll_spark.operators.dedup import (
    duplicate_groups,
    embedding_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)


@pytest.fixture(scope="module")
def near_dup_corpus(spark):
    """Docs 0/1 identical, 2 near-dup of 0, 3-9 distinct."""
    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(500)]
    base = " ".join(rng.choice(words, 120).tolist())
    near = base.rsplit(" ", 6)[0] + " zz1 zz2 zz3 zz4 zz5 zz6"
    texts = [base, base, near] + [
        " ".join(np.random.default_rng(100 + i).choice(words, 120).tolist())
        for i in range(7)
    ]
    pdf = pd.DataFrame({"doc_id": range(10), "text": texts})
    return spark.createDataFrame(pdf), pdf


def test_exact_dedup_keeps_min_id(spark, near_dup_corpus):
    df, pdf = near_dup_corpus
    kept = exact_dedup(df, ["text"], "doc_id").select("doc_id").toPandas()
    assert sorted(kept["doc_id"]) == [0] + list(range(2, 10))  # doc 1 dropped
    groups = duplicate_groups(df, ["text"], "doc_id").collect()
    assert len(groups) == 1 and groups[0]["n_dupes"] == 2


def test_minhash_lsh_finds_near_dups(spark, near_dup_corpus):
    df, _ = near_dup_corpus
    pairs = minhash_lsh_pairs(df, "text", "doc_id", threshold=0.7).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in got  # identical
    assert (0, 2) in got and (1, 2) in got  # near-dup
    assert all(a in (0, 1, 2) and b in (0, 1, 2) for a, b in got)


def test_ngram_jaccard_exact_pairs(spark, near_dup_corpus):
    df, _ = near_dup_corpus
    pairs = ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.7).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert got[(0, 1)] == 1.0
    assert 0.7 <= got[(0, 2)] < 1.0
    assert set(got) == {(0, 1), (0, 2), (1, 2)}


def test_minhash_estimates_close_to_exact(spark, near_dup_corpus):
    df, _ = near_dup_corpus
    est = {
        (r["id_a"], r["id_b"]): r["jaccard_est"]
        for r in minhash_lsh_pairs(df, "text", "doc_id", threshold=0.5).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.5).collect()
    }
    for pair, j in exact.items():
        assert pair in est
        assert abs(est[pair] - j) <= 0.15  # k=128 minhash error


def test_simhash_near_dups(spark, near_dup_corpus):
    df, _ = near_dup_corpus
    pairs = simhash_pairs(df, "text", "doc_id", max_hamming=6).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 1) in got
    assert (0, 2) in got


def test_embedding_dup_pairs(spark):
    rng = np.random.default_rng(1)
    base = rng.standard_normal(16)
    vecs = [base, base + rng.standard_normal(16) * 0.01] + [
        rng.standard_normal(16) for _ in range(6)
    ]
    pdf = pd.DataFrame(
        {"vec_id": range(8), "embedding": [v.tolist() for v in vecs]}
    )
    df = spark.createDataFrame(pdf)
    pairs = embedding_dup_pairs(df, "embedding", "vec_id", threshold=0.95).collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(0, 1)}


def test_exact_dedup_on_documents_table(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = exact_dedup(docs, ["text"], "doc_id")
    n_distinct_text = docs.select("text").distinct().count()
    assert kept.count() == n_distinct_text
