"""Distributed k-means (Lloyd's algorithm) over embedding columns.

The missing piece between the sample-trained "k-means-lite" centroids
used by the IVF index (similarity.py:212 trains on a driver-side
id-ordered sample) and a real corpus-scale clustering: here every
iteration scans the FULL dataset and reduces per-partition partial
sums, so the centroids reflect all rows, not a bounded sample. This is
the clustering layer SemDeDup-style semantic dedup, IVF index builds,
and topic-balanced mixture sampling all sit on.

100 TB design: per iteration the only bytes that cross the executor
boundary are P x k partial rows (count, cost, one float64 sum vector
of length d) — O(P * k * d) regardless of input size, the classic
mapInArrow partial-sum reduction (same topology as the sketch
scaffold, agg.py). Assignment is one vectorized (batch x k) squared-
distance argmin against a broadcast (k, d) matrix per Arrow batch; no
per-row Python, no shuffle of the data itself. The iteration count is
a fixed hyperparameter, so the whole fit is `iters` scans.

Determinism: initial centroids are the k rows with the smallest
``id_col`` (a stable, engine-independent rule — no RNG), and numpy's
argmin breaks distance ties toward the smaller cluster index.
Partition-order float accumulation can wiggle last-bit centroid sums,
so the cross-partitioning invariance test asserts allclose + equal
cluster sizes rather than bit equality; the ORACLE path below removes
floats entirely.

Oracle strategy (FIXTURES.md exact-regime rule): floats never compare
bit-stably across engines, so the driver query runs ONE Lloyd
assignment step on integer-QUANTIZED vectors — q = floor(v * 2^20 +
0.5) computed in float64 (identical IEEE result in Spark and DuckDB;
floor(x + 0.5) sidesteps banker's-rounding divergence) — and reports
per-cluster (size, exact int64 cost). Every compare is integer
arithmetic, so the row set is exactly reproducible in SQL
(list_zip/list_transform in DuckDB), while the float fit path is
differential-tested against a single-node numpy Lloyd in
tests/test_clustering.py.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_PARTIAL_SCHEMA = StructType(
    [
        StructField("cluster", IntegerType()),
        StructField("cnt", LongType()),
        StructField("cost", DoubleType()),
        StructField("vsum", ArrayType(DoubleType())),
    ]
)


def _stack(series: pd.Series) -> np.ndarray:
    """(n, d) float64 matrix from an Arrow list column (no NULL rows)."""
    return np.stack([np.asarray(v, dtype=np.float64) for v in series])


def quantize_matrix(mat: np.ndarray, scale: int) -> np.ndarray:
    """floor(v*scale + 0.5) in float64 — the engine-portable integer
    grid (DuckDB mirror: CAST(floor(CAST(x AS DOUBLE)*scale + 0.5) AS
    BIGINT)); floor(x+0.5) not round(x) because numpy rounds half-to-
    even while SQL rounds half-away-from-zero."""
    return np.floor(mat.astype(np.float64) * float(scale) + 0.5).astype(np.int64)


def initial_centroids(
    df: DataFrame, vec_col: str, id_col: str, k: int
) -> np.ndarray:
    """Deterministic init: the k rows with the smallest ``id_col``.
    A tiny TakeOrderedAndProject — no RNG, no sampling, reproducible
    in any engine (the property the quantized oracle leans on)."""
    rows = (
        df.where(F.col(vec_col).isNotNull() & F.col(id_col).isNotNull())
        .select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"need at least k={k} rows with non-null {vec_col}")
    return np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in rows])


def _assign(mat: np.ndarray, centroids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(cluster, squared_distance) per row; argmin ties go to the
    smaller cluster index. ||x-c||^2 = ||x||^2 - 2x.c + ||c||^2 as a
    single GEMM; d2 is re-clamped at 0 for float fuzz."""
    x2 = np.einsum("ij,ij->i", mat, mat)
    c2 = np.einsum("ij,ij->i", centroids, centroids)
    d2 = x2[:, None] - 2.0 * (mat @ centroids.T) + c2[None, :]
    np.maximum(d2, 0.0, out=d2)
    cluster = np.argmin(d2, axis=1)
    return cluster, d2[np.arange(len(cluster)), cluster]


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    k: int,
    iters: int = 10,
    id_col: str = "vec_id",
    init: np.ndarray | None = None,
) -> tuple[np.ndarray, list[float]]:
    """Full-pass Lloyd's: returns (centroids (k, d), per-iteration total
    cost). Each iteration = one scan emitting P*k partial sums; empty
    clusters keep their previous centroid (no reseeding RNG)."""
    if iters < 1:
        raise ValueError("iters must be >= 1")
    centroids = (
        np.asarray(init, dtype=np.float64)
        if init is not None
        else initial_centroids(df, vec_col, id_col, k)
    )
    if centroids.shape[0] != k:
        raise ValueError(f"init has {centroids.shape[0]} rows, expected k={k}")
    vecs = df.where(F.col(vec_col).isNotNull()).select(
        F.col(vec_col).cast("array<double>").alias("v")
    )
    import pyarrow as pa

    arrow_schema = pa.schema(
        [
            ("cluster", pa.int32()),
            ("cnt", pa.int64()),
            ("cost", pa.float64()),
            ("vsum", pa.list_(pa.float64())),
        ]
    )
    costs: list[float] = []
    for _ in range(iters):
        cents = centroids  # rebind: the closure ships THIS iteration's matrix

        def partials(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
            kk, dd = cents.shape
            cnt = np.zeros(kk, dtype=np.int64)
            cost = np.zeros(kk, dtype=np.float64)
            vsum = np.zeros((kk, dd), dtype=np.float64)
            for rb in batches:
                if not rb.num_rows:
                    continue
                mat = _stack(rb.column(0).to_pandas())
                cl, d2 = _assign(mat, cents)
                np.add.at(cnt, cl, 1)
                np.add.at(cost, cl, d2)
                np.add.at(vsum, cl, mat)
            nz = np.flatnonzero(cnt)
            if nz.size:
                yield pa.RecordBatch.from_pydict(
                    {
                        "cluster": nz.astype(np.int32),
                        "cnt": cnt[nz],
                        "cost": cost[nz],
                        "vsum": list(vsum[nz]),
                    },
                    schema=arrow_schema,
                )

        rows = vecs.mapInArrow(partials, _PARTIAL_SCHEMA).collect()
        cnt = np.zeros(k, dtype=np.int64)
        cost = np.zeros(k, dtype=np.float64)
        vsum = np.zeros_like(centroids)
        for r in rows:
            c = r["cluster"]
            cnt[c] += r["cnt"]
            cost[c] += r["cost"]
            vsum[c] += np.asarray(r["vsum"], dtype=np.float64)
        costs.append(float(cost.sum()))
        nonempty = cnt > 0
        centroids = centroids.copy()
        centroids[nonempty] = vsum[nonempty] / cnt[nonempty, None]
    return centroids, costs


def kmeans_assign(
    df: DataFrame,
    vec_col: str,
    centroids: np.ndarray,
    out_col: str = "cluster",
    dist_col: str | None = None,
) -> DataFrame:
    """Adds the nearest-centroid index (and optionally the squared L2
    distance) — one Arrow-batched vectorized pandas UDF against the
    broadcast (k, d) matrix. Rows with a null vector get a null
    cluster/distance (kmeans_fit and kmeans_quantized_profile filter
    nulls up front; this keeps the row-preserving assign contract
    instead of crashing _stack on a null — ADVICE r4)."""
    cents = np.asarray(centroids, dtype=np.float64)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<cluster: int, d2: double>")
    def assign_udf(vecs: pd.Series) -> pd.DataFrame:
        if vecs.empty:
            return pd.DataFrame({"cluster": [], "d2": []})
        out_cl = pd.array([pd.NA] * len(vecs), dtype="Int32")
        out_d2 = pd.array([pd.NA] * len(vecs), dtype="Float64")
        ok = vecs.notna().to_numpy()
        if ok.any():
            cl, d2 = _assign(_stack(vecs[ok]), cents)
            out_cl[ok] = cl.astype(np.int32)
            out_d2[ok] = d2
        return pd.DataFrame({"cluster": out_cl, "d2": out_d2})

    tagged = df.withColumn("__a", assign_udf(F.col(vec_col).cast("array<double>")))
    out = tagged.withColumn(out_col, F.col("__a.cluster"))
    if dist_col is not None:
        out = out.withColumn(dist_col, F.col("__a.d2"))
    return out.drop("__a")


def kmeans_quantized_profile(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    k: int,
    scale: int = 1 << 20,
) -> DataFrame:
    """ONE exact Lloyd assignment step on the integer grid: quantize
    every vector (floor(v*scale + 0.5)), take the k id-smallest rows as
    centroids, assign each row to the int64-squared-distance argmin
    (ties to the smaller centroid id rank), and profile the clusters.

    Output (cluster, n_members, cost_q) — cost_q the EXACT int64 sum
    of quantized squared distances, so the whole result is engine-
    portable and DuckDB-mirrorable (the float fit path, kmeans_fit,
    is differential-tested in pytest instead).

    Exactness bound (ADVICE r4): per-coordinate diffs are squared in
    int64, so every |quantized coordinate| must stay below 2^31*sqrt(d)
    ... conservatively we require |q| < 2^30, which keeps diff^2 <= 2^62
    and a d<=4096-dim row sum inside int64 (2^62 * 4096 overflows —
    the bound asserted is on the BATCH max so the d*max^2 product is
    checked too). At the default scale=2^20 that means vector
    magnitudes up to ~2^10 = 1024.0 are exact; beyond the bound the
    UDF raises instead of silently wrapping (numpy int64 wraps;
    DuckDB's BIGINT errors — the oracle and the sketch must agree).
    Scope of the guard (ADVICE r5): it bounds each ROW's d2; the
    per-cluster ``cost_q = SUM(d2)`` can still exceed int64 when many
    near-bound rows land in one cluster — there non-ANSI Spark wraps
    while DuckDB errors. The guard is sized so that inputs within the
    documented magnitude bound (|v| <= ~1024 at the default scale)
    stay exact for clusters up to ~2^20 such rows; for adversarial
    magnitudes close to the per-row bound, lower ``scale`` so the
    headroom covers the expected cluster size."""
    clean = df.where(F.col(vec_col).isNotNull() & F.col(id_col).isNotNull())
    cents_f = initial_centroids(clean, vec_col, id_col, k)
    qcents = quantize_matrix(cents_f, scale)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<cluster: int, d2: long>")
    def qassign(vecs: pd.Series) -> pd.DataFrame:
        if vecs.empty:
            return pd.DataFrame({"cluster": [], "d2": []})
        q = quantize_matrix(_stack(vecs), scale)
        # exact int64 pairwise squared distances (k and d are small:
        # the (n, k, d) intermediate is bounded by the Arrow batch).
        # Overflow guard: numpy int64 wraps silently; enforce the
        # documented magnitude bound so diff^2 sums stay exact.
        mx = max(
            int(np.max(np.abs(q), initial=0)),
            int(np.max(np.abs(qcents), initial=0)),
        )
        d_dim = q.shape[1]
        if mx and d_dim * (2 * mx) ** 2 >= 2**63:
            raise OverflowError(
                f"kmeans_quantized_profile: quantized magnitude {mx} at "
                f"dim {d_dim} can overflow int64 squared-distance sums "
                f"(need dim*(2*max)^2 < 2^63); lower `scale` (current "
                f"{scale}) or normalize the vectors"
            )
        diff = q[:, None, :] - qcents[None, :, :]
        d2 = np.einsum("nkd,nkd->nk", diff, diff)
        cl = np.argmin(d2, axis=1)
        return pd.DataFrame(
            {"cluster": cl.astype(np.int32), "d2": d2[np.arange(len(cl)), cl]}
        )

    tagged = clean.select(
        qassign(F.col(vec_col).cast("array<double>")).alias("a")
    )
    return (
        tagged.groupBy(F.col("a.cluster").alias("cluster"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("a.d2").alias("cost_q"),
        )
        .orderBy("cluster")
    )
