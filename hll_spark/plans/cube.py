"""Sketch cube: pre-aggregated distinct-count tables, sliceable at
query time without rescanning raw data.

The production pattern this library exists for: a 10^12-row fact table
is scanned ONCE to materialize per-dimension-combination sketches
(e.g. one HLL per (day, lang)), written PARTITIONED BY those
dimensions. Any later slice or rollup — "distinct users for lang=en
last week", "distinct urls per day across all langs" — is answered by
reading only the pruned sketch files (KBs) and union-merging them,
which is exact with respect to the sketch state because merges are
associative and order-insensitive. Dimension filters become partition
filters, so Catalyst prunes directories before a single byte is read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.agg import (
    SketchSpec,
    hll_spec,
    merge_sketch_partials,
    sketch_aggregate,
)


def build_sketch_cube(
    df: DataFrame,
    col: str,
    dims: list[str],
    path: str,
    spec: SketchSpec | None = None,
    hash_mode: str | None = "xxhash64",
) -> str:
    """One scan of ``df`` -> (dims..., sketch, rows_seen) rows written
    partitioned by ``dims``. Returns ``path``."""
    if not dims:
        raise ValueError("a sketch cube needs at least one dimension")
    spec = spec or hll_spec()
    cube = sketch_aggregate(df, col, spec, by=dims, hash_mode=hash_mode)
    cube.write.mode("overwrite").partitionBy(*dims).parquet(path)
    return path


def query_sketch_cube(
    spark: SparkSession,
    path: str,
    spec: SketchSpec | None = None,
    where=None,
    group_by: list[str] | None = None,
) -> DataFrame:
    """Answer a slice/rollup from the cube alone.

    ``where`` (a Column or SQL string over the dimension columns)
    becomes a PARTITION filter — unneeded dimension directories are
    never listed or read. ``group_by`` picks the output grain; cells
    collapsed together are union-merged (associative, so any merge
    order and partitioning give identical bytes). Returns
    (group_by..., sketch, rows_seen); estimate with the sketch's
    estimate UDF.
    """
    spec = spec or hll_spec()
    cells = spark.read.parquet(path)
    if where is not None:
        cells = cells.where(where)
    keep = list(group_by or []) + ["sketch", "rows_seen"]
    return merge_sketch_partials(
        cells.select(*keep), spec, by=list(group_by or []), two_level=False
    )


def rollup_cube(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    group_by: list[str],
    spec: SketchSpec | None = None,
) -> str:
    """Re-aggregate an existing cube to a coarser grain and persist it
    (e.g. day-grain cells -> month-grain cells): cells collapsing into
    one output cell are union-merged (exact w.r.t. sketch state), and
    the result is written partitioned by the coarser dimensions —
    cube lifecycle compaction without ever touching raw fact rows.
    """
    if not group_by:
        raise ValueError("rollup_cube needs the coarser dimension list")
    spec = spec or hll_spec()
    out = query_sketch_cube(spark, src_path, spec=spec, group_by=group_by)
    out.write.mode("overwrite").partitionBy(*group_by).parquet(dst_path)
    return dst_path
