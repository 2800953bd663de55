"""Distributed Lloyd k-means: differential parity vs a single-node
numpy reference, partitioning invariance, cost monotonicity, and the
integer-exact quantized-profile oracle path."""

import numpy as np
import pytest

from hll_spark.operators.clustering import (
    _assign,
    initial_centroids,
    kmeans_assign,
    kmeans_fit,
    kmeans_quantized_profile,
    quantize_matrix,
)

D = 8


def _corpus(n: int, seed: int = 7) -> np.ndarray:
    """Three separated blobs + noise — float32 like the parquet column."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(3, D) * 4.0
    pts = centers[rng.randint(0, 3, n)] + rng.randn(n, D) * 0.6
    return pts.astype(np.float32)


def _df(spark, mat: np.ndarray, partitions: int = 4):
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(mat)]
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<float>").repartition(
        partitions
    )


def _numpy_lloyd(mat: np.ndarray, k: int, iters: int):
    """The single-node reference: same init rule (k smallest ids =
    first k rows), same tie rule (argmin -> lowest index), empty
    clusters keep their centroid."""
    mat = mat.astype(np.float64)
    cents = mat[:k].copy()
    costs = []
    for _ in range(iters):
        cl, d2 = _assign(mat, cents)
        costs.append(float(d2.sum()))
        nxt = cents.copy()
        for c in range(k):
            members = mat[cl == c]
            if len(members):
                nxt[c] = members.mean(axis=0)
        cents = nxt
    return cents, costs


def test_fit_matches_numpy_reference(spark):
    mat = _corpus(300)
    cents_s, costs_s = kmeans_fit(_df(spark, mat), "embedding", k=3, iters=6)
    cents_n, costs_n = _numpy_lloyd(mat, k=3, iters=6)
    assert np.allclose(cents_s, cents_n, rtol=0, atol=1e-9)
    assert np.allclose(costs_s, costs_n, rtol=0, atol=1e-6)


def test_fit_invariant_to_partitioning(spark):
    mat = _corpus(200, seed=11)
    a, ca = kmeans_fit(_df(spark, mat, partitions=1), "embedding", k=4, iters=4)
    b, cb = kmeans_fit(_df(spark, mat, partitions=13), "embedding", k=4, iters=4)
    assert np.allclose(a, b, atol=1e-9)
    assert np.allclose(ca, cb, atol=1e-6)


def test_cost_monotone_nonincreasing(spark):
    mat = _corpus(400, seed=3)
    _, costs = kmeans_fit(_df(spark, mat), "embedding", k=5, iters=8)
    # Lloyd's guarantee: each assignment+update step cannot raise cost
    assert all(b <= a + 1e-6 for a, b in zip(costs, costs[1:]))


def test_assign_matches_fit_assignment(spark):
    mat = _corpus(150, seed=5)
    df = _df(spark, mat)
    cents, _ = kmeans_fit(df, "embedding", k=3, iters=3)
    out = (
        kmeans_assign(df, "embedding", cents, dist_col="d2")
        .orderBy("vec_id")
        .collect()
    )
    cl_ref, d2_ref = _assign(mat.astype(np.float64), cents)
    assert [r["cluster"] for r in out] == cl_ref.tolist()
    assert np.allclose([r["d2"] for r in out], d2_ref, atol=1e-9)


def test_nulls_skipped_and_small_k_guard(spark):
    mat = _corpus(20, seed=1)
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(mat)]
    rows.append((99, None))
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    cents, costs = kmeans_fit(df, "embedding", k=2, iters=2)
    ref, costs_ref = _numpy_lloyd(mat, k=2, iters=2)
    assert np.allclose(cents, ref, atol=1e-9)
    with pytest.raises(ValueError, match="at least k"):
        kmeans_fit(df.limit(1), "embedding", k=2, iters=1)
    with pytest.raises(ValueError, match="iters"):
        kmeans_fit(df, "embedding", k=2, iters=0)


def test_quantize_portable_rule():
    # floor(v*scale + 0.5): exact half-integer products must round UP
    # (away from banker's rounding divergence with SQL round())
    mat = np.array([[1.5 / (1 << 20), -0.5 / (1 << 20)]], dtype=np.float64)
    q = quantize_matrix(mat, 1 << 20)
    assert q.tolist() == [[2, 0]]


def test_quantized_profile_matches_local(spark):
    mat = _corpus(120, seed=9)
    df = _df(spark, mat)
    out = kmeans_quantized_profile(df, "embedding", "vec_id", k=4).collect()
    q = quantize_matrix(mat.astype(np.float64), 1 << 20)
    qc = q[:4]
    diff = q[:, None, :] - qc[None, :, :]
    d2 = np.einsum("nkd,nkd->nk", diff, diff)
    cl = np.argmin(d2, axis=1)
    best = d2[np.arange(len(cl)), cl]
    got = {r["cluster"]: (r["n_members"], r["cost_q"]) for r in out}
    for c in range(4):
        members = cl == c
        if members.any():
            assert got[c] == (int(members.sum()), int(best[members].sum()))
        else:
            assert c not in got
    # sanity: every row accounted for
    assert sum(v[0] for v in got.values()) == len(mat)


def test_initial_centroids_are_id_ordered(spark):
    mat = _corpus(30, seed=2)
    df = _df(spark, mat, partitions=7)
    cents = initial_centroids(df, "embedding", "vec_id", 5)
    assert np.allclose(cents, mat[:5].astype(np.float64), atol=0)
