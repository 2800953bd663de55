"""BM25 query->document retrieval (operators/vocab.bm25_retrieve).

The quantized log-free scoring is designed to be bit-identical across
engines (see the operator docstring), so the main test is exact parity
against an independent sequential reference implementation of the same
formula — every score_e9, not just the ranking.
"""

import math
import re

import pytest

from hll_spark.operators.vocab import bm25_retrieve

K1, B = 1.2, 0.75


def _tok(t):
    t = (t or "").strip()
    return re.split(r"\s+", t) if t else []


def ref_bm25(doc_rows, query_rows, k, k1=K1, b=B):
    """Sequential reference: same quantization, same tie-breaks."""
    dls = {d: len(_tok(t)) for d, t in doc_rows}
    n = len(doc_rows)
    avgdl = sum(dls.values()) / n
    qt = {q: set(_tok(t)) for q, t in query_rows}
    vocab = set().union(*qt.values()) if qt else set()
    tfs = {}
    for d, t in doc_rows:
        for w in _tok(t):
            if w in vocab:
                tfs[(d, w)] = tfs.get((d, w), 0) + 1
    dfm = {}
    for (_, w) in tfs:
        dfm[w] = dfm.get(w, 0) + 1
    out = set()
    for q, terms in qt.items():
        scores = {}
        for (d, w), tf in tfs.items():
            if w not in terms:
                continue
            idf = ((n - dfm[w]) + 0.5) / (dfm[w] + 0.5)
            tfn = (tf * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * (dls[d] / avgdl))
            )
            scores[d] = scores.get(d, 0) + math.floor(
                idf * tfn * 1000000000.0
            )
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out |= {(q, d, s, i + 1) for i, (d, s) in enumerate(ranked)}
    return out


def _run(spark, doc_rows, query_rows, k, **kw):
    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
    qs = spark.createDataFrame(query_rows, "query_id long, qtext string")
    got = bm25_retrieve(docs, qs, k=k, **kw)
    return {
        (r["query_id"], r["doc_id"], r["score_e9"], r["rank"])
        for r in got.collect()
    }


CORPUS = [
    (1, "hash join hash join hash"),
    (2, "window agg stream window"),
    (3, "hash scan filter value table row"),
    (4, "join join join join join join join join"),
    (5, "vector column scan vector"),
    (6, ""),
    (7, "the a of"),
]
QUERIES = [(0, "hash join"), (1, "window"), (2, "vector scan"), (3, "zzz")]


def test_bm25_matches_sequential_reference(spark):
    got = _run(spark, CORPUS, QUERIES, k=3)
    assert got == ref_bm25(CORPUS, QUERIES, 3)
    # absent-term query emits nothing; empty docs never score
    assert not {r for r in got if r[0] == 3}
    assert not {r for r in got if r[1] == 6}


def test_bm25_reference_parity_random_corpus(spark):
    import random

    rng = random.Random(41)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 40))))
        for i in range(60)
    ]
    queries = [(j, " ".join(rng.sample(vocab, rng.randrange(1, 4))))
               for j in range(5)]
    assert _run(spark, docs, queries, k=7) == ref_bm25(docs, queries, 7)


def test_bm25_tf_saturation_and_length_norm(spark):
    # same dl: more query-term mass ranks higher; k1 saturates tf so a
    # doc matching BOTH terms once beats one spamming a single term
    docs = [
        (1, "hash hash hash hash pad pad pad pad"),
        (2, "hash join pad pad pad pad pad pad"),
    ]
    got = sorted(_run(spark, docs, [(0, "hash join")], k=2))
    assert [(d, rk) for (_, d, _, rk) in got] == [(1, 2), (2, 1)]


def test_bm25_k_cut_and_tiebreak(spark):
    # identical docs -> identical scores; rank breaks ties by doc_id asc
    docs = [(i, "hash join") for i in range(1, 6)]
    got = _run(spark, docs, [(0, "hash")], k=3)
    assert {(d, rk) for (_, d, _, rk) in got} == {(1, 1), (2, 2), (3, 3)}
    scores = {s for (_, _, s, _) in got}
    assert len(scores) == 1


def test_bm25_shared_term_across_queries(spark):
    # one posting row fans out to every query containing the term
    docs = [(1, "hash hash"), (2, "join")]
    got = _run(spark, docs, [(0, "hash"), (1, "hash join")], k=2)
    assert got == ref_bm25(docs, [(0, "hash"), (1, "hash join")], 2)
    assert {r[0] for r in got} == {0, 1}


def test_bm25_validation(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    qs = spark.createDataFrame([(0, "a")], "query_id long, qtext string")
    with pytest.raises(ValueError, match="k must"):
        bm25_retrieve(docs, qs, k=0)
    with pytest.raises(ValueError, match="k1 > 0"):
        bm25_retrieve(docs, qs, k1=0.0)
    with pytest.raises(ValueError, match="k1 > 0"):
        bm25_retrieve(docs, qs, b=1.5)
    with pytest.raises(ValueError, match="unknown column"):
        bm25_retrieve(docs, qs, text_col="nope")
    with pytest.raises(ValueError, match="unknown column"):
        bm25_retrieve(docs, qs, qid_col="nope")


def test_bm25_plan_shape(spark):
    # the ONLY nested loop is the deliberately-1-row corpus-stats
    # broadcast crossJoin (the tfidf_top_terms idiom); every data-sized
    # join — vocab prune, df attach, query fan-out — is a broadcast
    # HASH join
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    qs = spark.createDataFrame(QUERIES, "query_id long, qtext string")
    plan = (
        bm25_retrieve(docs, qs, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1  # 1-row stats
    assert plan.count("BroadcastHashJoin") >= 3
