"""Blocked-GEMM exact all-pairs cosine (VERDICT r3 'What's wrong' #1).

``embedding_dup_pairs_blocked`` is the loose-threshold answer: when no
LSH family can prune (threshold < ~0.7 on unstructured vectors), the
quadratic pair set is unavoidable, so the right plan turns it into
block-partitioned dense matmuls. These tests pin (a) exactness against
the join-based all-pairs reference at several thresholds/block counts,
(b) invariance to the block count (the parallelism knob must never
change results), and (c) plan shape: no cartesian/nested-loop join —
the only expansion is the deterministic n*B block-key explode.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from hll_spark.operators.dedup import (
    embedding_dup_pairs_allpairs,
    embedding_dup_pairs_blocked,
)

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _random_df(spark, n, dim=16, seed=7, dup_every=10):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    # plant near-dups: every dup_every-th vector is a scaled copy of its
    # predecessor (cosine 1.0) plus a jittered copy (cosine ~0.99)
    for i in range(dup_every, n, dup_every):
        mat[i] = mat[i - 1] * 1.7
        if i + 1 < n:
            mat[i + 1] = mat[i - 1] + 0.05 * rng.standard_normal(dim).astype(
                np.float32
            )
    rows = [(int(i), [float(x) for x in mat[i]]) for i in range(n)]
    return spark.createDataFrame(rows, SCHEMA)


def _collect(df):
    return sorted((r.id_a, r.id_b, r.cosine) for r in df.collect())


def _assert_same_pairs(got, want):
    """Same pair set; cosines equal up to summation-order float noise
    (GEMM accumulates in a different order than the JVM fold, so the
    6-decimal rounding can differ in the last digit)."""
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    for (_, _, cg), (_, _, cw) in zip(got, want):
        assert abs(cg - cw) <= 2e-6


@pytest.mark.parametrize("threshold,n_blocks", [(0.3, 4), (0.5, 7), (0.9, 3)])
def test_blocked_matches_allpairs(spark, threshold, n_blocks):
    df = _random_df(spark, 120)
    got = _collect(
        embedding_dup_pairs_blocked(
            df, "embedding", "vec_id", threshold=threshold, n_blocks=n_blocks
        )
    )
    want = _collect(
        embedding_dup_pairs_allpairs(
            df, "embedding", "vec_id", threshold=threshold
        )
    )
    _assert_same_pairs(got, want)
    assert len(got) > 0  # the planted dups guarantee a non-trivial check


def test_block_count_never_changes_results(spark):
    df = _random_df(spark, 90, seed=11)
    results = [
        _collect(
            embedding_dup_pairs_blocked(
                df, "embedding", "vec_id", threshold=0.4, n_blocks=b
            )
        )
        for b in (1, 2, 5, 16)
    ]
    assert results[0] == results[1] == results[2] == results[3]


def test_single_block_degenerates_to_one_task(spark):
    df = _random_df(spark, 40, seed=3)
    out = embedding_dup_pairs_blocked(
        df, "embedding", "vec_id", threshold=0.2, n_blocks=1
    )
    want = _collect(
        embedding_dup_pairs_allpairs(df, "embedding", "vec_id", threshold=0.2)
    )
    _assert_same_pairs(_collect(out), want)


def test_zero_vector_and_empty_input(spark):
    rows = [(0, [0.0, 0.0, 0.0]), (1, [1.0, 0.0, 0.0]), (2, [2.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, SCHEMA)
    got = _collect(
        embedding_dup_pairs_blocked(df, "embedding", "vec_id", threshold=0.5, n_blocks=2)
    )
    # zero vector pairs with nothing (norm guarded to 1 -> cosine 0)
    assert got == [(1, 2, 1.0)]
    empty = spark.createDataFrame([], SCHEMA)
    assert (
        embedding_dup_pairs_blocked(
            empty, "embedding", "vec_id", threshold=0.5, n_blocks=2
        ).count()
        == 0
    )


def test_invalid_block_count_raises(spark):
    df = _random_df(spark, 10)
    with pytest.raises(ValueError):
        embedding_dup_pairs_blocked(df, "embedding", "vec_id", n_blocks=0)


def test_plan_has_no_cartesian_join(spark):
    df = _random_df(spark, 50)
    out = embedding_dup_pairs_blocked(
        df, "embedding", "vec_id", threshold=0.46, n_blocks=8
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the GEMM runs inside a grouped-map Arrow stage, not a join
    assert "FlatMapGroupsInPandas" in plan
