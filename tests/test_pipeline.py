"""Composed cleaning pipeline (operators/pipeline.py)."""

import numpy as np
import pandas as pd
import pytest

from hll_spark.operators.pipeline import clean_corpus


@pytest.fixture(scope="module")
def messy_corpus(spark):
    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(400)]

    def doc(seed, n=120):
        return " ".join(np.random.default_rng(seed).choice(words, n).tolist())

    base = doc(1)
    near = base.rsplit(" ", 5)[0] + " zz1 zz2 zz3 zz4 zz5"
    texts = {
        0: base,                      # keeper
        1: base,                      # exact dup of 0 -> dropped
        2: near,                      # near-dup of 0 -> dropped
        3: doc(2),                    # clean -> kept
        4: "#x " * 80,                # symbol soup -> quality-dropped
        5: "\n".join(["same line"] * 9 + ["x y z"]),  # dup lines -> dropped
        6: doc(4),                    # clean -> kept
    }
    pdf = pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values()),
         "lang": ["en", "en", "en", "de", "en", "en", "fr"]}
    )
    return spark.createDataFrame(pdf)


def test_clean_corpus_end_to_end(spark, messy_corpus):
    kept = sorted(
        r.doc_id for r in clean_corpus(messy_corpus).select("doc_id").collect()
    )
    assert kept == [0, 3, 6]


def test_clean_corpus_minhash_variant_agrees(spark, messy_corpus):
    exact = sorted(
        r.doc_id for r in clean_corpus(messy_corpus).select("doc_id").collect()
    )
    scale = sorted(
        r.doc_id
        for r in clean_corpus(messy_corpus, exact_neardup=False)
        .select("doc_id")
        .collect()
    )
    assert exact == scale  # the at-scale path keeps the same corpus here
