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


# ---------------------------------------------------------------------------
# BPE learner / encoder
# ---------------------------------------------------------------------------

from hll_spark.operators.vocab import (  # noqa: E402
    _bpe_encode_word,
    _bpe_merge_loop,
    bpe_encode,
    bpe_learn,
)


def _naive_bpe(forms, counts, n_merges, min_pair_count=2):
    """Recount-from-scratch reference for the incremental merge loop."""
    def apply(s, a, b):
        out, j = [], 0
        while j < len(s):
            if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(s[j])
                j += 1
        return tuple(out)

    seqs = [tuple(f) for f in forms]
    merges = []
    for rank in range(1, n_merges + 1):
        pc = {}
        for s, c in zip(seqs, counts):
            for p in zip(s, s[1:]):
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append((rank, a, b, cnt))
        seqs = [apply(s, a, b) for s in seqs]
    return merges


def test_bpe_merge_loop_matches_naive_reference():
    import random

    rng = random.Random(7)
    for trial in range(20):
        n_forms = rng.randint(1, 40)
        forms = list({
            "".join(rng.choice("abcd ") for _ in range(rng.randint(1, 12)))
            for _ in range(n_forms)
        })
        counts = [rng.randint(1, 9) for _ in forms]
        got = _bpe_merge_loop(forms, counts, n_merges=25)
        want = _naive_bpe(forms, counts, n_merges=25)
        assert got == want, f"trial {trial}: {got} != {want}"


def test_bpe_learn_hand_corpus(spark):
    docs = spark.createDataFrame(
        [(1, "aaab aaab")], "doc_id long, text string"
    )
    got = [(r.rank, r.left, r.right, r.pair_count)
           for r in bpe_learn(docs, n_merges=10).orderBy("rank").collect()]
    # forms: 'aaab' x1, ' aaab' x1 -> (a,a) count 4 wins; then the
    # count-2 tie between (a,b) and (aa,a) breaks lexicographically to
    # (a,b); then (aa,ab); then nothing reaches min_pair_count=2
    assert got == [(1, "a", "a", 4), (2, "a", "b", 2), (3, "aa", "ab", 2)]


def test_bpe_encode_applies_merges_in_rank_order(spark):
    ranks = {("a", "a"): 1, ("a", "b"): 2, ("aa", "ab"): 3}
    assert _bpe_encode_word("aaab", ranks) == ["aaab"]
    assert _bpe_encode_word("ab", ranks) == ["ab"]
    assert _bpe_encode_word("ba", ranks) == ["b", "a"]
    assert _bpe_encode_word("xyz", ranks) == ["x", "y", "z"]


def test_bpe_encode_corpus_counts(spark):
    docs = spark.createDataFrame(
        [(1, "aaab aaab"), (2, "zzzz")], "doc_id long, text string"
    )
    merges = bpe_learn(docs, n_merges=10)
    out = {r.doc_id: (r.n_pretokens, r.n_bpe_tokens)
           for r in bpe_encode(docs, merges).collect()}
    # doc1: both pretokens collapse to one token each ('aaab'/' aaab'
    # via (a,a),(a,b),(aa,ab) — the leading-space form reaches
    # [' ','aaab'] = 2 symbols since (' ','aaab') never merged)
    assert out[1] == (2, 3)
    # doc2: 'zzzz' -> (z,z) count 3 in-form... learned? (z,z) count 3
    # >= 2 so it IS merged during learning: 'zzzz' -> [zz, zz] -> 1
    # if (zz,zz) also learned (count 1 < 2: not learned) -> 2 tokens
    assert out[2] == (1, 2)


def test_bpe_learn_respects_word_form_cap(spark):
    docs = spark.createDataFrame(
        [(1, "q q q q q q rare1 rare2")], "doc_id long, text string"
    )
    # cap=1 keeps only the most frequent form (' q', 5 occurrences —
    # the head 'q' form appears once); no adjacent pair inside a
    # 2-char form repeats >= 2 times... (' ', 'q') count 5 -> merged
    got = bpe_learn(docs, n_merges=5, max_word_forms=1).collect()
    assert [(r.left, r.right) for r in got] == [(" ", "q")]


def test_bpe_learn_deterministic_across_partitionings(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(500)
    a = [tuple(r) for r in bpe_learn(docs, n_merges=30).collect()]
    b = [tuple(r) for r in
         bpe_learn(docs.repartition(19), n_merges=30).collect()]
    assert a == b and len(a) == 30


def test_bpe_validation(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bpe_learn(docs, n_merges=0)
    with pytest.raises(ValueError):
        bpe_learn(docs, max_word_forms=0)
