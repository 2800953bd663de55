"""connected_components (large-star/small-star) vs a driver-side
union-find ground truth, plus the dedup-by-cluster wrapper."""

import random

import pytest
from pyspark.sql import Row, functions as F

from hll_spark.operators.components import (
    connected_components,
    dedup_by_components,
    node_components,
)


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in component
    comp = {}
    for x in range(n_nodes):
        comp.setdefault(find(x), []).append(x)
    return {x: min(members) for members in comp.values() for x in members}


def _spark_labels(spark, n_nodes, edges):
    edf = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in edges] or [Row(src=0, dst=0)],
        schema="src long, dst long",
    )
    ndf = spark.range(n_nodes).withColumnRenamed("id", "node")
    out = node_components(edf, ndf).collect()
    return {r["node"]: r["component"] for r in out}


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    n = 120
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(20, 150))
    ]
    assert _spark_labels(spark, n, edges) == _union_find(n, edges)


def test_path_graph_single_component(spark):
    # chains exercise the multi-round case (star rule alone fails here)
    n = 40
    edges = [(i, i + 1) for i in range(n - 1)]
    labels = _spark_labels(spark, n, edges)
    assert set(labels.values()) == {0}


def test_isolated_and_self_loops(spark):
    labels = _spark_labels(spark, 6, [(1, 1), (2, 3), (3, 2)])
    assert labels == {0: 0, 1: 1, 2: 2, 3: 2, 4: 4, 5: 5}


def test_orientation_and_duplicates_irrelevant(spark):
    base = [(4, 9), (9, 17), (2, 3)]
    noisy = base + [(b, a) for a, b in base] + base
    assert _spark_labels(spark, 20, noisy) == _spark_labels(spark, 20, base)


def test_two_large_stars_merge(spark):
    # two hubs sharing one leaf: classic case where per-node min-label
    # one-shot grouping is wrong
    edges = [(10, i) for i in range(5)] + [(11, i) for i in range(4, 9)]
    labels = _spark_labels(spark, 12, edges)
    assert set(labels[i] for i in list(range(9)) + [10, 11]) == {0}


def test_dedup_by_components_keeps_cluster_minimum(spark):
    rows = [Row(doc_id=i, text=f"doc {i}") for i in range(8)]
    df = spark.createDataFrame(rows)
    # clusters: {0,1,2} (chain), {5,7}; isolated: 3,4,6
    pairs = spark.createDataFrame(
        [Row(left_id=1, right_id=0), Row(left_id=1, right_id=2),
         Row(left_id=7, right_id=5)]
    )
    kept = sorted(
        r["doc_id"]
        for r in dedup_by_components(df, pairs, "doc_id").collect()
    )
    assert kept == [0, 3, 4, 5, 6]


def test_connected_components_non_isolated_only(spark):
    edf = spark.createDataFrame([Row(src=3, dst=8)])
    rows = {r["node"]: r["component"] for r in connected_components(edf).collect()}
    assert rows == {3: 3, 8: 3}


def test_clean_corpus_cluster_dedup_one_survivor_per_cluster(spark):
    # Chain corpus where the pairwise id_b drop rule keeps TWO
    # survivors in one cluster (see pipeline.clean_corpus docstring):
    # docs 0,1,2 with exact-Jaccard edges (0,2) and (1,2) only —
    # doc 1 has no smaller neighbor, so the pairwise rule keeps {0,1};
    # cluster_dedup must keep exactly {0} (the component minimum).
    # tokens: doc0 = a0..a59, doc2 = a5..a64, doc1 = a10..a69
    # J(0,2) = 55/65 = 0.846, J(1,2) = 55/65 = 0.846,
    # J(0,1) = 50/70 = 0.714 < 0.8 -> no direct edge.
    rows = []
    for doc_id, start in ((0, 0), (1, 10), (2, 5)):
        rows.append(
            Row(doc_id=doc_id, text=" ".join(f"a{start + j}" for j in range(60)))
        )
    # disjoint-token filler docs that survive quality gates untouched
    for doc_id in (10, 11):
        rows.append(
            Row(doc_id=doc_id, text=" ".join(f"f{doc_id}_{j}" for j in range(60)))
        )
    df = spark.createDataFrame(rows)
    from hll_spark.operators.pipeline import clean_corpus

    kw = dict(
        min_quality=0.0, max_dup_line_fraction=1.0,
        max_symbol_word_ratio=1.0, word_len_bounds=(0.0, 100.0),
        neardup_threshold=0.8,
    )
    pairwise = {
        r["doc_id"] for r in clean_corpus(df, **kw).select("doc_id").collect()
    }
    clustered = {
        r["doc_id"]
        for r in clean_corpus(df, cluster_dedup=True, **kw)
        .select("doc_id")
        .collect()
    }
    assert pairwise == {0, 1, 10, 11}  # the documented two-survivor leak
    assert clustered == {0, 10, 11}  # exactly one per cluster


def test_clean_corpus_cluster_dedup_requires_exact_path(spark):
    from hll_spark.operators.pipeline import clean_corpus

    df = spark.createDataFrame([Row(doc_id=0, text="hello world")])
    with pytest.raises(ValueError, match="exact_neardup"):
        clean_corpus(df, exact_neardup=False, cluster_dedup=True)


def test_dedup_by_components_pairs_from_superset_corpus(spark):
    # pairs reference id 0 which is NOT in df (e.g. dropped by a
    # quality gate before dedup): the cluster {0,1,2}'s minimum inside
    # df is 1, and exactly one of {1,2} must survive — previously both
    # were dropped because the component root (0) had no df row.
    df = spark.createDataFrame([Row(doc_id=1), Row(doc_id=2), Row(doc_id=9)])
    pairs = spark.createDataFrame(
        [Row(left_id=0, right_id=1), Row(left_id=1, right_id=2)]
    )
    out = {
        r["doc_id"]
        for r in dedup_by_components(df, pairs, "doc_id").collect()
    }
    assert out == {1, 9}
