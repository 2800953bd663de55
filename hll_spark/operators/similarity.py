"""Similarity search over embedding columns (array<float>).

Two tiers, per the web-scale playbook:

- brute-force cosine top-k: the correctness baseline. Distributed as
  per-partition top-k (numpy matmul over Arrow batches against a
  broadcast query matrix) followed by a global top-k reduce — the same
  partial/final shape as the sketch aggregations, so no partition ever
  ships more than k rows per query to the reducer.
- LSH-bucketed ANN: random-hyperplane signatures (sign of projections)
  bucket the corpus; queries probe only their own bucket (plus
  multi-probe neighbors), turning the scan into an equality join. Recall
  is tested against the brute-force baseline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.window import Window
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..sketchlib.hashing import murmur3_finalizer_u64

TOPK_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("neighbor_id", LongType()),
        StructField("cosine", DoubleType()),
    ]
)


def _as_matrix(series: pd.Series, dim: int = 1) -> np.ndarray:
    """Stack an Arrow vector column into (n, d). ``dim`` sizes the
    EMPTY-batch result (pandas UDFs can receive empty batches): a
    (0, 1) placeholder breaks ``mat @ X.T`` for any X with d != 1, so
    geometry-aware callers pass their known dimension."""
    if not len(series):
        return np.zeros((0, dim), dtype=np.float64)
    return np.vstack([np.asarray(v, dtype=np.float64) for v in series])


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k neighbors for every query row.

    queries is collected & broadcast (queries are small; the corpus is
    the 100 TB side). Ties broken by neighbor id for determinism.
    Output: (query_id, neighbor_id, cosine) — k rows per query.
    """
    qpdf = queries.select(id_col, vec_col).toPandas()
    q_ids = qpdf[id_col].to_numpy(np.int64)
    q_mat = _normalize(_as_matrix(qpdf[vec_col]))
    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast((q_ids, q_mat))

    def partition_topk(batches):
        q_ids, q_mat = bc.value
        best_scores = np.full((len(q_ids), k), -np.inf)
        best_ids = np.full((len(q_ids), k), -1, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            c_ids = pdf[id_col].to_numpy(np.int64)
            c_mat = _normalize(_as_matrix(pdf[vec_col]))
            sims = q_mat @ c_mat.T  # (nq, nc)
            # merge this batch into the running top-k per query
            all_scores = np.concatenate([best_scores, sims], axis=1)
            all_ids = np.concatenate(
                [best_ids, np.broadcast_to(c_ids, (len(q_ids), len(c_ids)))], axis=1
            )
            # deterministic order: score desc, then id asc
            order = np.lexsort((all_ids, -all_scores), axis=1)[:, :k]
            rows = np.arange(len(q_ids))[:, None]
            best_scores = all_scores[rows, order]
            best_ids = all_ids[rows, order]
        mask = best_ids.reshape(-1) >= 0
        yield pd.DataFrame(
            {
                "query_id": np.repeat(q_ids, k)[mask],
                "neighbor_id": best_ids.reshape(-1)[mask],
                "cosine": np.round(best_scores.reshape(-1)[mask], 6),
            }
        )

    partials = corpus.select(id_col, vec_col).mapInPandas(partition_topk, TOPK_SCHEMA)
    # global top-k per query: tiny (n_partitions * k rows per query)
    w = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    )
    return (
        partials.withColumn("rank", w)
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (random hyperplanes)


def _hyperplanes(dim: int, n_planes: int, seed: int = 1234) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_udf(dim: int, n_planes: int = 12, seed: int = 1234):
    planes = _hyperplanes(dim, n_planes, seed)

    def bucket(vecs: pd.Series) -> pd.Series:
        mat = _normalize(_as_matrix(vecs, planes.shape[1]))
        signs = (mat @ planes.T) > 0
        vals = (signs.astype(np.int64) << np.arange(n_planes, dtype=np.int64)).sum(
            axis=1
        )
        return pd.Series(vals, index=vecs.index)

    return pandas_udf(bucket, LongType())


def lsh_multiprobe_udf(dim: int, n_planes: int = 8, seed: int = 1234):
    """Query-side bucketing: own bucket + every 1-bit-flip neighbor
    (multi-probe LSH) — recovers neighbors that landed one plane away."""
    planes = _hyperplanes(dim, n_planes, seed)

    def buckets(vecs: pd.Series) -> pd.Series:
        mat = _normalize(_as_matrix(vecs, planes.shape[1]))
        signs = (mat @ planes.T) > 0
        vals = (signs.astype(np.int64) << np.arange(n_planes, dtype=np.int64)).sum(
            axis=1
        )
        flips = vals[:, None] ^ (1 << np.arange(n_planes, dtype=np.int64))[None, :]
        all_probes = np.concatenate([vals[:, None], flips], axis=1)
        return pd.Series(list(all_probes.tolist()), index=vecs.index)

    return pandas_udf(buckets, ArrayType(LongType()))


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_planes: int = 8,
    seed: int = 1234,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: probe the query's LSH bucket plus all 1-bit
    neighbor buckets (multi-probe).

    The bucket join replaces the full scan; recall < 1 by construction
    (tested vs brute force). Pass ``dim`` to skip the one-row schema
    lookup at plan-build time.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).head()[0])
    bucketer = lsh_bucket_udf(dim, n_planes, seed)
    prober = lsh_multiprobe_udf(dim, n_planes, seed)
    c = corpus.withColumn("bucket", bucketer(F.col(vec_col))).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        "bucket",
    )
    q = queries.withColumn(
        "bucket", F.explode(prober(F.col(vec_col)))
    ).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "bucket"
    )
    dot = F.aggregate(
        F.zip_with("q_vec", "c_vec", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    qn = F.sqrt(F.aggregate("q_vec", F.lit(0.0), lambda a, x: a + x * x))
    cn = F.sqrt(F.aggregate("c_vec", F.lit(0.0), lambda a, x: a + x * x))
    joined = q.join(c, "bucket").withColumn("cosine", F.round(dot / (qn * cn), 6))
    w = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    )
    return (
        joined.withColumn("rank", w)
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# IVF ANN (inverted-file index over k-means-lite centroids)


def _train_centroids(
    sample: np.ndarray, n_centroids: int, iters: int = 5
) -> np.ndarray:
    """Deterministic mini k-means on a driver-side sample (spherical)."""
    sample = _normalize(sample)
    centroids = sample[:n_centroids].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ centroids.T, axis=1)
        for c in range(n_centroids):
            members = sample[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


def sample_train_centroids(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_centroids: int,
    train_sample: int = 10_000,
) -> np.ndarray:
    """Deterministic driver-side k-means-lite: train on a bounded
    id-ordered sample, return the normalized (k, d) centroid matrix.
    The single training path shared by ``ivf_ann_topk`` and
    ``dedup.semdedup_keep`` — fixes to sampling or tie-breaking apply
    to both."""
    sample_pdf = (
        df.select(id_col, vec_col).orderBy(id_col).limit(train_sample).toPandas()
    )
    return _train_centroids(_as_matrix(sample_pdf[vec_col]), n_centroids)


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    train_sample: int = 10_000,
) -> DataFrame:
    """IVF approximate top-k: assign corpus vectors to their nearest
    centroid (one mapInPandas pass), queries probe the ``nprobe`` nearest
    centroid cells only.

    The scale path: at 100 TB the centroid table is tiny and broadcast;
    the corpus is scanned once at index build, and each query touches
    ~nprobe/n_centroids of the data. Training is a deterministic
    driver-side mini k-means over a bounded sample (ordered by id for
    reproducibility).
    """
    centroids = sample_train_centroids(
        corpus, vec_col, id_col, n_centroids, train_sample
    )
    sc = corpus.sparkSession.sparkContext
    bc = sc.broadcast(centroids)

    def assign_udf_factory(n_cells: int):
        def assign(vecs: pd.Series) -> pd.Series:
            cents = bc.value
            mat = _normalize(_as_matrix(vecs, cents.shape[1]))
            if n_cells == 1:
                cell = np.argmax(mat @ cents.T, axis=1).astype(np.int64)
                return pd.Series(cell, index=vecs.index)
            top = np.argsort(-(mat @ cents.T), axis=1)[:, :n_cells].astype(np.int64)
            return pd.Series(list(top.tolist()), index=vecs.index)

        rtype = LongType() if n_cells == 1 else ArrayType(LongType())
        return pandas_udf(assign, rtype)

    c = corpus.withColumn("cell", assign_udf_factory(1)(F.col(vec_col))).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), "cell"
    )
    q = queries.withColumn(
        "cell", F.explode(assign_udf_factory(nprobe)(F.col(vec_col)))
    ).select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), "cell")
    dot = F.aggregate(
        F.zip_with("q_vec", "c_vec", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    qn = F.sqrt(F.aggregate("q_vec", F.lit(0.0), lambda a, x: a + x * x))
    cn = F.sqrt(F.aggregate("c_vec", F.lit(0.0), lambda a, x: a + x * x))
    joined = q.join(c, "cell").withColumn("cosine", F.round(dot / (qn * cn), 6))
    w = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    )
    return (
        joined.withColumn("rank", w)
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
