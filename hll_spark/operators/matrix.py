"""Distributed Frequent Directions over an embedding column.

Same two-level build shape as every sketch in this package
(SURVEY.md §3.4: level-0 mapInPandas partials per input partition,
level-1 bucketed applyInPandas tree merge, level-2 driver merge of
<= merge_buckets KB..MB blobs) — only sketch blobs ever cross the
shuffle, never embedding rows, so the plan is the one a 10^12-row
covariance job wants. The kernel is sketchlib/fd.py (Liberty KDD'13);
see that module for the spectral guarantee and the exact regime the
driver oracle pins.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..sketchlib.fd import FDSketch

_PARTIAL_SCHEMA = StructType(
    [
        StructField("bucket", LongType()),
        StructField("sketch", BinaryType()),
        StructField("rows_seen", LongType()),
    ]
)


def _stack(series: pd.Series) -> np.ndarray:
    """(n, dim) float64 from an Arrow list column's pandas form,
    nulls dropped."""
    vals = [v for v in series if v is not None]
    if not vals:
        return np.empty((0, 0))
    return np.stack([np.asarray(v, dtype=np.float64) for v in vals])


def fd_partials(
    df: DataFrame,
    col: str,
    ell: int,
    merge_buckets: int = 16,
) -> DataFrame:
    """One FD partial per input partition: (bucket, sketch, rows_seen)."""
    if ell < 1:
        raise ValueError("ell must be >= 1")
    proj = df.where(F.col(col).isNotNull()).select(F.col(col).alias("v"))

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state: FDSketch | None = None
        for b in batches:
            if not len(b):
                continue
            block = _stack(b["v"])
            if not block.size:
                continue
            if state is None:
                state = FDSketch(ell, block.shape[1])
            state.update(block)
        if state is None:
            return
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        yield pd.DataFrame(
            {
                "bucket": [pid % merge_buckets],
                "sketch": [state.to_bytes()],
                "rows_seen": [state.rows_seen],
            }
        )

    return proj.mapInPandas(build, _PARTIAL_SCHEMA)


def _merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
    acc: FDSketch | None = None
    for blob in pdf["sketch"]:
        sk = FDSketch.from_bytes(bytes(blob))
        acc = sk if acc is None else acc.merge(sk)
    return pd.DataFrame(
        {
            "bucket": [int(pdf["bucket"].iloc[0])],
            "sketch": [acc.to_bytes()],
            "rows_seen": [int(pdf["rows_seen"].sum())],
        }
    )


def fd_sketch(
    df: DataFrame,
    col: str,
    ell: int,
    merge_buckets: int = 16,
) -> FDSketch:
    """Build and fully merge the distributed FD sketch.

    The driver touches only the <= merge_buckets level-1 blobs."""
    partials = fd_partials(df, col, ell, merge_buckets)
    level1 = partials.groupBy("bucket").applyInPandas(
        _merge_group, _PARTIAL_SCHEMA
    )
    rows = level1.collect()
    if not rows:
        raise ValueError(f"no non-null rows in column {col!r}")
    acc: FDSketch | None = None
    for r in sorted(rows, key=lambda r: r["bucket"]):
        sk = FDSketch.from_bytes(bytes(r["sketch"]))
        acc = sk if acc is None else acc.merge(sk)
    return acc


def fd_gram_by(
    df: DataFrame,
    col: str,
    by: list[str],
    ell: int,
    max_groups: int = 4096,
) -> DataFrame:
    """Per-group FD: one sketch per ``by`` cell, fully distributed.

    Level 0 emits one partial per (input partition, group) — the
    map-side combine that keeps a 10^12-row grouped covariance job
    from shuffling embedding rows; level 1 merges per group under
    ``groupBy(*by).applyInPandas`` and expands each group's sketched
    Gram matrix to (by..., i, j, gram) rows (dim^2 per group).
    ``max_groups`` caps level-0 worker memory on high-cardinality
    keys (same early-flush rule as agg.py's grouped build: duplicate
    partials per group are fine, level 1 merges them).

    (Deliberately NOT folded into agg.py's SketchSpec scaffold: that
    path projects one scalar/hashed value column through
    _value_expr/_arrow_values; FD consumes array rows, so sharing the
    scaffold would mean teaching the scalar hot path about arrays.)"""
    if ell < 1:
        raise ValueError("ell must be >= 1")
    if not by:
        raise ValueError("by must name at least one grouping column")
    if max_groups < 1:
        raise ValueError("max_groups must be >= 1")
    reserved = {"__fd_v", "i", "j", "gram", "sketch", "rows_seen"}
    clash = reserved.intersection(by)
    if clash:
        raise ValueError(
            f"grouping column(s) {sorted(clash)} collide with the "
            "operator's output/internal names; rename them first"
        )
    proj = df.where(F.col(col).isNotNull()).select(
        *by, F.col(col).alias("__fd_v")
    )
    by_fields = [proj.schema[b] for b in by]
    partial_schema = StructType(
        by_fields
        + [
            StructField("sketch", BinaryType()),
            StructField("rows_seen", LongType()),
        ]
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        states: dict = {}

        def flush():
            keys = list(states)
            out = pd.DataFrame(
                {
                    **{
                        b: [k[i] for k in keys]
                        for i, b in enumerate(by)
                    },
                    "sketch": [states[k].to_bytes() for k in keys],
                    "rows_seen": [states[k].rows_seen for k in keys],
                }
            )
            states.clear()
            return out

        for b in batches:
            if not len(b):
                continue
            for key, grp in b.groupby(by, sort=False, dropna=False):
                block = _stack(grp["__fd_v"])
                if not block.size:
                    continue
                key = key if isinstance(key, tuple) else (key,)
                st = states.get(key)
                if st is None:
                    st = states[key] = FDSketch(ell, block.shape[1])
                st.update(block)
            if len(states) >= max_groups:
                yield flush()
        if states:
            yield flush()

    partials = proj.mapInPandas(build, partial_schema)
    out_schema = StructType(
        by_fields
        + [
            StructField("i", LongType()),
            StructField("j", LongType()),
            StructField("gram", DoubleType()),
        ]
    )

    def merge_expand(pdf: pd.DataFrame) -> pd.DataFrame:
        acc: FDSketch | None = None
        for blob in pdf["sketch"]:
            sk = FDSketch.from_bytes(bytes(blob))
            acc = sk if acc is None else acc.merge(sk)
        g = acc.gram()
        dim = g.shape[0]
        ii, jj = np.meshgrid(
            np.arange(dim), np.arange(dim), indexing="ij"
        )
        out = {
            b: np.repeat(pdf[b].iloc[0], dim * dim) for b in by
        }
        out["i"] = ii.ravel().astype(np.int64)
        out["j"] = jj.ravel().astype(np.int64)
        out["gram"] = g.ravel()
        return pd.DataFrame(out)

    return partials.groupBy(*by).applyInPandas(merge_expand, out_schema)


def project_embeddings(
    df: DataFrame,
    col: str,
    basis: np.ndarray,
    out_col: str = "projected",
) -> DataFrame:
    """Project an embedding column onto a (dim, k) basis — e.g. the
    PCA basis from ``FDSketch.top_eigvecs`` — appending ``out_col`` as
    ``array<double>`` of length k.

    The basis is closed over (broadcast with the serialized task, a
    few KB for any sane k); each Arrow batch is one (n, dim) @
    (dim, k) GEMM, so the per-row Python cost is a vectorized matmul,
    never a loop. The 100 TB use: shrink 1024-dim embeddings to the
    top-k directions a corpus-level FD sketch found, then run
    SemDeDup / ANN / clustering on the small vectors."""
    basis = np.ascontiguousarray(np.asarray(basis, dtype=np.float64))
    if basis.ndim != 2:
        raise ValueError("basis must be a (dim, k) matrix")
    if out_col in df.columns:
        raise ValueError(f"output column {out_col!r} already exists")
    dim, _k = basis.shape
    fields = df.schema.fields + [
        StructField(out_col, ArrayType(DoubleType()))
    ]
    out_schema = StructType(fields)
    cols = df.columns

    def proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            mask = b[col].notna().to_numpy()
            vals: list = [None] * len(b)
            if mask.any():
                block = np.stack(
                    [
                        np.asarray(v, dtype=np.float64)
                        for v in b[col][mask]
                    ]
                )
                if block.shape[1] != dim:
                    raise ValueError(
                        f"row width {block.shape[1]} != basis dim {dim}"
                    )
                low = block @ basis  # ONE GEMM per Arrow batch
                for t, rowvec in zip(np.nonzero(mask)[0], low):
                    vals[t] = rowvec
            b = b[cols].copy()
            b[out_col] = vals
            yield b

    return df.mapInPandas(proj, out_schema)


def fd_gram_table(
    spark: SparkSession,
    df: DataFrame,
    col: str,
    ell: int,
    merge_buckets: int = 16,
) -> DataFrame:
    """The sketched Gram matrix as (i, j, gram) rows — dim^2 rows total,
    driver-constructed (dim^2 is small by definition for embedding
    columns; the distributed work is the sketch build)."""
    sk = fd_sketch(df, col, ell, merge_buckets)
    g = sk.gram()
    dim = g.shape[0]
    ii, jj = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
    out = pd.DataFrame(
        {
            "i": ii.ravel().astype(np.int64),
            "j": jj.ravel().astype(np.int64),
            "gram": g.ravel(),
        }
    )
    return spark.createDataFrame(out)
