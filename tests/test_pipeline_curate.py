"""curate_corpus composition (operators/pipeline.py): clean -> LM
perplexity gate -> DSIR selection -> shard assignment.

Fixture note: the fluent docs must stay DISTINCT (a "variant N" tail)
— if they were exact copies, stage 1's dedup would collapse them to
one row and the self-fit LM of stage 2 would see a corpus dominated
by junk, which is a property of the fixture, not the operator.
"""

import pytest
from pyspark.sql import functions as F

from hll_spark.operators.pipeline import curate_corpus

FLUENT = "the cat sat on the mat and the dog sat on the rug today"
JUNK = "zq xv qqj kpw vvz mxx wq zzk jjp qqv ry qy wz xj kv pz"
LOOSE = dict(
    min_quality=0.0,
    max_dup_line_fraction=1.0,
    max_symbol_word_ratio=1.0,
    word_len_bounds=(0.0, 1e3),
    neardup_threshold=1.0,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, f"{FLUENT} variant {i}") for i in range(20)]  # distinct, fluent
    rows += [(100, "an exact duplicate row"), (101, "an exact duplicate row")]
    rows += [(200, JUNK), (201, JUNK + " extra")]             # high-ppl junk
    rows += [(300, "und der ein ich nicht das sch " * 3)]     # off-target
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def target(spark):
    return spark.createDataFrame(
        [(i, f"{FLUENT} variant {i}") for i in range(8)],
        "doc_id long, text string",
    )


def _ids(df):
    return {r.doc_id for r in df.select("doc_id").collect()}


def test_exact_dups_collapse(corpus):
    kept = _ids(curate_corpus(corpus, **LOOSE))
    assert len(kept & {100, 101}) == 1  # one survivor of the exact pair
    assert set(range(20)) <= kept       # distinct fluent docs all survive


def test_lm_gate_drops_junk(corpus):
    base = _ids(curate_corpus(corpus, **LOOSE))
    gated = _ids(curate_corpus(corpus, max_ppl=10.0, **LOOSE))
    assert gated < base
    assert {200, 201} & gated == set()  # junk is the high-ppl tail
    assert set(range(20)) <= gated      # fluent docs pass the gate


def test_dsir_gate_drops_off_target(corpus, target):
    kept = _ids(
        curate_corpus(corpus, target=target, min_logratio=-0.5, **LOOSE)
    )
    assert 300 not in kept        # German text scores below the source LM
    assert kept & set(range(20))  # on-target docs survive


def test_sharding_and_determinism(corpus, target):
    out = curate_corpus(
        corpus, max_ppl=10.0, target=target, min_logratio=-0.5,
        n_shards=4, **LOOSE
    )
    assert "shard_id" in out.columns
    a = sorted((r.doc_id, r.shard_id) for r in out.collect())
    b = sorted(
        (r.doc_id, r.shard_id)
        for r in curate_corpus(
            corpus.repartition(7), max_ppl=10.0, target=target,
            min_logratio=-0.5, n_shards=4, **LOOSE
        ).collect()
    )
    assert a == b and len(a) > 0
    assert {s for _, s in a} <= set(range(4))


def test_min_logratio_requires_target(corpus):
    with pytest.raises(ValueError):
        curate_corpus(corpus, min_logratio=0.0)


def test_classifier_gate_drops_off_target(corpus, target):
    # target = fluent English; the junk and German docs score below
    # the 0.5 boundary once the classifier separates target-vs-pool
    gated = _ids(
        curate_corpus(
            corpus,
            target=target,
            min_clf_score_micro=500_000,
            clf_kwargs=dict(n_features=4096, iters=5, lr_micro=4_000_000),
            **LOOSE,
        )
    )
    assert set(range(20)) <= gated         # target-like docs survive
    assert {200, 201, 300} & gated == set()  # junk + off-target drop


def test_classifier_gate_requires_target(corpus):
    with pytest.raises(ValueError, match="min_clf_score_micro"):
        curate_corpus(corpus, min_clf_score_micro=500_000, **LOOSE)


def test_token_budget_caps_the_corpus(corpus):
    full = curate_corpus(corpus, **LOOSE)
    n_full = full.count()
    capped = curate_corpus(corpus, token_budget=40, **LOOSE)
    got = capped.count()
    assert 0 < got < n_full
    # greedy fill by doc_id: the kept set is a prefix of the id order
    kept = sorted(_ids(capped))
    assert kept == sorted(_ids(full))[: len(kept)]


def test_budget_orders_by_classifier_score(corpus, target):
    # with the classifier on, the budget keeps the HIGHEST-scoring
    # docs first — junk cannot enter before fluent docs
    out = curate_corpus(
        corpus,
        target=target,
        min_clf_score_micro=0,  # gate off (score >= 0 keeps all)
        clf_kwargs=dict(n_features=4096, iters=5, lr_micro=4_000_000),
        token_budget=120,
        **LOOSE,
    )
    kept = _ids(out)
    assert kept  # something was selected
    assert kept <= set(range(20))  # only target-like docs fit first
