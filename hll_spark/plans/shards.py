"""Deterministic training-shard layout: assignment, manifest, writer.

Training pipelines consume a corpus as N fixed shards (webdataset/
Megatron-style): every row must land in the same shard on every run, on
any cluster size, so that resumable tokenization jobs, per-shard
checksums, and shard-parallel loaders all agree. The assignment here is
the repo's portable-hash rule (operators/sampling.py): shard_id =
int(md5(key ':' seed)[:15 hex]) mod n_shards — a pure whole-stage-
codegen expression, reproducible in any engine with md5 (the DuckDB
driver oracle recomputes it verbatim).

Scale shape: assignment is a projection (no shuffle); the writer does
ONE shuffle (repartition on shard_id — md5 uniformity balances the
shards) and writes with ``partitionBy``, one directory per shard; the
manifest is one map-side-combined aggregate whose output is n_shards
rows. Checksums use ``bit_xor`` (order-independent, overflow-free), so
a manifest computed at any parallelism is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.sampling import _key_hex


def assign_shards(
    df: DataFrame, key_col: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """Add a deterministic ``shard_id`` (0..n_shards-1) column derived
    only from the row key — stable across runs, engines and cluster
    shapes."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if "shard_id" in df.columns:
        raise ValueError("input already has a 'shard_id' column")
    h = F.conv(_key_hex(key_col, seed), 16, 10).cast("long")
    return df.withColumn("shard_id", (h % n_shards).cast("int"))


def shard_manifest(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: int = 0,
    size_col: str | None = None,
) -> DataFrame:
    """The per-shard accounting a loader checks before training:
    (shard_id, n_rows, key_xor[, total_size]). ``key_xor`` is the
    bit_xor of each row's 60-bit portable hash — order-independent, so
    any two computations of the same shard agree bitwise; comparing
    manifests detects dropped/duplicated rows without reading data."""
    h = F.conv(_key_hex(key_col, seed), 16, 10).cast("long")
    aggs = [
        F.count("*").alias("n_rows"),
        F.bit_xor("__h").alias("key_xor"),
    ]
    if size_col is not None:
        aggs.append(F.sum(size_col).cast("long").alias("total_size"))
    return (
        assign_shards(df, key_col, n_shards, seed)
        .withColumn("__h", h)
        .groupBy("shard_id")
        .agg(*aggs)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    seed: int = 0,
    sort_col: str | None = None,
) -> DataFrame:
    """Write the corpus as ``n_shards`` deterministic parquet shards
    (``path/shard_id=K/``) and return the manifest. One shuffle
    (repartition on shard_id); ``sort_col`` optionally orders rows
    within each shard file (sortWithinPartitions — no global sort).

    The manifest is computed from the WRITTEN files (a read-back of
    key_col + shard_id only — column pruning keeps this cheap), not
    from the input: that way the returned checksums actually cover
    what landed on disk, so a row dropped or duplicated between
    assignment and commit shows up as a manifest mismatch against an
    independently computed ``shard_manifest(df, ...)``. It also avoids
    re-executing the (possibly expensive) input DAG a second time."""
    sharded = assign_shards(df, key_col, n_shards, seed).repartition(
        n_shards, "shard_id"
    )
    if sort_col is not None:
        sharded = sharded.sortWithinPartitions("shard_id", sort_col)
    sharded.write.partitionBy("shard_id").mode("overwrite").parquet(path)
    back = df.sparkSession.read.parquet(path)
    h = F.conv(_key_hex(key_col, seed), 16, 10).cast("long")
    return (
        back.select(F.col("shard_id").cast("int").alias("shard_id"),
                    h.alias("__h"))
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_rows"),
            F.bit_xor("__h").alias("key_xor"),
        )
    )
