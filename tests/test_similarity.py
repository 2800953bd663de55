"""ANN tests: brute-force exactness vs numpy, LSH recall vs brute force."""

import numpy as np
import pandas as pd
import pytest

from hll_spark.operators.similarity import (
    brute_force_topk,
    ivf_ann_topk,
    lsh_ann_topk,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return df, df.toPandas()


def numpy_topk(pdf, q_ids, k):
    mat = np.vstack(pdf["embedding"].map(np.asarray))
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    ids = pdf["vec_id"].to_numpy(np.int64)
    out = {}
    for qid in q_ids:
        qv = mat[ids == qid][0]
        sims = mat @ qv
        order = np.lexsort((ids, -np.round(sims, 6)))
        out[qid] = ids[order][:k].tolist()
    return out


def test_brute_force_matches_numpy(spark, emb):
    df, pdf = emb
    q_ids = pdf["vec_id"].head(5).tolist()
    queries = df.where(df.vec_id.isin(q_ids))
    got = brute_force_topk(df.repartition(8), queries, k=10).toPandas()
    expected = numpy_topk(pdf, q_ids, 10)
    for qid in q_ids:
        mine = (
            got[got.query_id == qid]
            .sort_values("rank")["neighbor_id"]
            .tolist()
        )
        assert mine == expected[qid], f"query {qid}"


def test_partition_invariance(spark, emb):
    df, pdf = emb
    queries = df.limit(3)
    a = brute_force_topk(df.repartition(2), queries, k=5).toPandas()
    b = brute_force_topk(df.repartition(16), queries, k=5).toPandas()
    key = ["query_id", "rank"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )


def recall_vs_exact(exact, approx, q_ids):
    recalls = []
    for qid in q_ids:
        e = set(exact[exact.query_id == qid]["neighbor_id"])
        a = set(approx[approx.query_id == qid]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    return float(np.mean(recalls))


def test_lsh_recall_beats_scan_fraction(spark, emb):
    df, pdf = emb
    q_ids = pdf["vec_id"].head(10).tolist()
    queries = df.where(df.vec_id.isin(q_ids))
    exact = brute_force_topk(df, queries, k=5).toPandas()
    n_planes = 6
    approx = lsh_ann_topk(df, queries, k=5, n_planes=n_planes).toPandas()
    recall = recall_vs_exact(exact, approx, q_ids)
    # multi-probe scans ~ (1 + n_planes)/2^n_planes of the corpus; recall
    # must beat that baseline by a clear margin (the whole point of LSH)
    scan_fraction = (1 + n_planes) / 2**n_planes
    assert recall >= 1.5 * scan_fraction, (recall, scan_fraction)
    # self-match always survives (query is in its own bucket)
    for qid in q_ids:
        assert qid in set(approx[approx.query_id == qid]["neighbor_id"])


def test_ivf_recall(spark, emb):
    df, pdf = emb
    q_ids = pdf["vec_id"].head(10).tolist()
    queries = df.where(df.vec_id.isin(q_ids))
    exact = brute_force_topk(df, queries, k=5).toPandas()
    approx = ivf_ann_topk(df, queries, k=5, n_centroids=16, nprobe=4).toPandas()
    recall = recall_vs_exact(exact, approx, q_ids)
    # probing 4/16 cells must recover well over half the true neighbors
    assert recall >= 0.6, recall
    again = ivf_ann_topk(df, queries, k=5, n_centroids=16, nprobe=4).toPandas()
    key = ["query_id", "rank"]
    pd.testing.assert_frame_equal(
        approx.sort_values(key).reset_index(drop=True),
        again.sort_values(key).reset_index(drop=True),
    )
