"""Bigram-LM perplexity scoring (operators/lm.py).

Hand-computed fixture: corpus {0: 'a A b', 1: 'a b b', 2: '', 3: 'c c'},
vocab_size=2 -> vocab {a, b} (counts a:3 b:3 c:2; (cnt DESC, w ASC)),
v_eff=3, bigrams with BOS:

  doc0 (s,a)(a,a)(a,b)   doc1 (s,a)(a,b)(b,b)   doc3 (s,u)(u,u)

model (s,a):2 (a,a):1 (a,b):2 (b,b):1 (s,u):1 (u,u):1;
ctx s:3 a:3 b:1 u:1. p=(cnt+1)/(ctx+3):

  (s,a) 1/2    (a,a) 1/3    (a,b) 1/2    (b,b) 1/2
  (s,u) 1/3    (u,u) 1/2

micro = floor(log10(p)*1e6): 1/2 -> -301030, 1/3 -> -477122.
"""

import pytest
from pyspark.sql import functions as F

from hll_spark.operators.lm import bigram_lm_perplexity, fit_bigram_lm

HALF = 301030  # -floor(log10(0.5) * 1e6)
THIRD = 477122  # -floor(log10(1/3) * 1e6)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(0, "a A b"), (1, "a b b"), (2, ""), (3, "c c")],
        "doc_id long, text string",
    )


def _scores(df, **kw):
    out = bigram_lm_perplexity(df, "text", "doc_id", **kw)
    return {r.doc_id: (r.n_tokens, r.nll_micro) for r in out.collect()}


def test_hand_computed_micro_logs(corpus):
    got = _scores(corpus, vocab_size=2)
    assert got[0] == (3, HALF + THIRD + HALF)
    assert got[1] == (3, 3 * HALF)
    assert got[2] == (0, 0)
    assert got[3] == (2, THIRD + HALF)


def test_empty_doc_ppl_is_null(corpus):
    row = (
        bigram_lm_perplexity(corpus, "text", "doc_id", vocab_size=2)
        .where(F.col("doc_id") == 2)
        .collect()[0]
    )
    assert row.ppl is None


def test_ppl_ranks_junk_above_fluent(spark):
    # 30 fluent docs sharing one phrase distribution + 2 junk docs of
    # unique gibberish: the junk docs must score the highest perplexity
    rows = [(i, "the cat sat on the mat and the dog sat too") for i in range(30)]
    rows += [(100, "zq xv qqj kpw vvz"), (101, "mmx wq zzk jjp qqv")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bigram_lm_perplexity(df, "text", "doc_id", vocab_size=50)
    top2 = {
        r.doc_id for r in out.orderBy(F.desc("ppl")).limit(2).collect()
    }
    assert top2 == {100, 101}


def test_cross_scoring_unseen_words(spark):
    train = spark.createDataFrame(
        [(0, "a a b"), (1, "a b b")], "doc_id long, text string"
    )
    target = spark.createDataFrame(
        [(9, "z z")], "doc_id long, text string"
    )
    got = _scores(target, train=train, vocab_size=2)
    # vocab {a,b}, v_eff=3; z -> unk. (s,unk): cnt 0, ctx(s)=2 ->
    # p=1/5; (unk,unk): cnt 0, ctx(unk)=0 -> p=1/3
    import math

    fifth = -math.floor(math.log10(1 / 5) * 1e6)
    assert got[9] == (2, fifth + THIRD)


def test_partitioning_invariance(corpus):
    base = _scores(corpus, vocab_size=2)
    shuffled = _scores(corpus.repartition(7), vocab_size=2)
    assert base == shuffled


def test_vocab_tiebreak_is_deterministic(spark):
    # all words count 1: vocab must be the lexicographically first V
    df = spark.createDataFrame(
        [(0, "d c b a")], "doc_id long, text string"
    )
    vocab, _, _, v_eff = fit_bigram_lm(df, "text", vocab_size=2)
    assert sorted(r.w for r in vocab.collect()) == ["a", "b"]
    assert v_eff == 3


def test_empty_corpus_scores_all_unk(spark):
    df = spark.createDataFrame([(0, ""), (1, "  ")], "doc_id long, text string")
    got = _scores(df, vocab_size=5)
    assert got == {0: (0, 0), 1: (0, 0)}


def test_vocab_size_validation(corpus):
    with pytest.raises(ValueError):
        bigram_lm_perplexity(corpus, "text", "doc_id", vocab_size=0)


# ---------------------------------------------------------------------------
# dsir_importance
# ---------------------------------------------------------------------------

from hll_spark.operators.lm import dsir_importance  # noqa: E402


def test_dsir_ranks_target_like_docs_higher(spark):
    target = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(10)],
        "doc_id long, text string",
    )
    pool = spark.createDataFrame(
        [(0, "the cat sat on the mat"), (1, "the mat the cat"),
         (2, "zz qq vv kk pp"), (3, "qq zz kk vv")],
        "doc_id long, text string",
    )
    out = dsir_importance(pool, target, "text", "doc_id", vocab_size=50)
    got = {r.doc_id: r.avg_logratio for r in out.collect()}
    assert min(got[0], got[1]) > max(got[2], got[3])


def test_dsir_decomposes_into_two_lm_scores(spark):
    # pool words are a subset of target words and vocab_size covers
    # all, so the target-fit and source-fit vocabularies are the SAME
    # SET -> logratio_micro must equal nll_source - nll_target from
    # two independent bigram_lm_perplexity runs
    target = spark.createDataFrame(
        [(0, "a b a"), (1, "b a"), (2, "a a b b")],
        "doc_id long, text string",
    )
    pool = spark.createDataFrame(
        [(0, "a b a"), (1, "a a a"), (2, "b b"), (3, "")],
        "doc_id long, text string",
    )
    lr = {
        r.doc_id: (r.n_tokens, r.logratio_micro)
        for r in dsir_importance(
            pool, target, "text", "doc_id", vocab_size=10
        ).collect()
    }
    nll_t = {
        r.doc_id: r.nll_micro
        for r in bigram_lm_perplexity(
            pool, "text", "doc_id", train=target, vocab_size=10
        ).collect()
    }
    nll_s = {
        r.doc_id: r.nll_micro
        for r in bigram_lm_perplexity(
            pool, "text", "doc_id", train=pool, vocab_size=10
        ).collect()
    }
    for i in lr:
        assert lr[i][1] == nll_s[i] - nll_t[i]
    assert lr[3] == (0, 0)


def test_dsir_partitioning_invariance(spark):
    target = spark.createDataFrame(
        [(0, "x y x y"), (1, "y x")], "doc_id long, text string"
    )
    pool = spark.createDataFrame(
        [(i, ["x y", "q r", "x q"][i % 3]) for i in range(12)],
        "doc_id long, text string",
    )
    a = sorted(
        (r.doc_id, r.logratio_micro)
        for r in dsir_importance(pool, target, vocab_size=5).collect()
    )
    b = sorted(
        (r.doc_id, r.logratio_micro)
        for r in dsir_importance(
            pool.repartition(7), target.repartition(3), vocab_size=5
        ).collect()
    )
    assert a == b


# ---------------------------------------------------------------------------
# property tests vs a pure-Python reference model
# ---------------------------------------------------------------------------

import math  # noqa: E402
from collections import Counter  # noqa: E402

from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

# the literal sentinels are IN the pool: text containing "<s>"/"<unk>"
# (stripped HTML tags are common in web text) must not be conflated
# with the BOS/UNK markers
_word = st.sampled_from(
    ["a", "b", "cc", "dd", "e1", "f2", "gg", "zz", "<s>", "<unk>"]
)
_doc = st.lists(_word, min_size=0, max_size=8).map(" ".join)


def _ref_bigram_scores(texts, vocab_size):
    """Independent plain-Python reimplementation of the LM contract."""
    toks = {i: t.split() for i, t in enumerate(texts)}
    wc = Counter(w for ws in toks.values() for w in ws)
    wc.pop("<s>", None)  # sentinels are reserved, never vocab members
    wc.pop("<unk>", None)
    vocab = set(
        w for w, _ in sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[
            :vocab_size
        ]
    )
    v_eff = len(vocab) + 1
    m = lambda w: w if w in vocab else "<unk>"
    grams = Counter()
    ctx = Counter()
    for ws in toks.values():
        prev = "<s>"
        for w in ws:
            grams[(prev, m(w))] += 1
            ctx[prev] += 1
            prev = m(w)
    out = {}
    for i, ws in toks.items():
        nll, prev = 0, "<s>"
        for w in ws:
            p = (grams[(prev, m(w))] + 1) / (ctx[prev] + v_eff)
            nll -= math.floor(math.log10(p) * 1e6)
            prev = m(w)
        out[i] = (len(ws), nll)
    return out


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_doc, min_size=1, max_size=12), v=st.integers(1, 9))
def test_lm_matches_pure_python_reference(spark, texts, v):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.nll_micro)
        for r in bigram_lm_perplexity(
            df, "text", "doc_id", vocab_size=v
        ).collect()
    }
    assert got == _ref_bigram_scores(texts, v)


def test_literal_sentinel_tokens_are_not_bos(spark):
    # "x <s> y" : the literal <s> is a vocab-excluded token, so the
    # model must score (x -> <unk>) and (<unk> -> y), NOT treat the
    # pair as a fresh document start. Regression for the value-compare
    # BOS rule (now positional).
    df = spark.createDataFrame(
        [(0, "x <s> y"), (1, "x q y")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_tokens, r.nll_micro)
        for r in bigram_lm_perplexity(
            df, "text", "doc_id", vocab_size=10
        ).collect()
    }
    assert got == _ref_bigram_scores(["x <s> y", "x q y"], 10)
    # and <s>/<unk> never enter the fitted vocabulary
    vocab, _, _, _ = fit_bigram_lm(df, "text", vocab_size=10)
    words = {r.w for r in vocab.collect()}
    assert "<s>" not in words and "<unk>" not in words
