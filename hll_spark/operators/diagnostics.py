"""Partition-skew diagnostics — the measurement step that precedes any
salting / AQE-skew-join decision at scale.

A 100 TB shuffle dies on its heaviest keys, not its average ones; the
operators here quantify exactly that before a job is launched:

- :func:`key_skew_report` — the top-N heaviest grouping keys with
  count, share of all rows, and the ratio to a perfectly uniform
  spread. One hash aggregate (map-side combined) + a driver-bounded
  top-N: the only data that reaches the driver is N rows. Exact, so
  the driver query over it is value-oracle-able in SQL.
- :func:`skew_stats` — one-row summary (distinct keys, max/avg key
  count, skew factor) for programmatic gating, e.g. "salt if
  skew_factor > 4".

Both are plain DataFrame plans (no UDFs, no collect of key lists), so
they run at any input size; at 100 TB the aggregate shuffles one row
per DISTINCT key, and AQE coalesces the tiny result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def key_skew_report(
    df: DataFrame, cols: list[str] | str, top_n: int = 10
) -> DataFrame:
    """Top-``top_n`` heaviest keys of ``cols`` with their row counts,
    corpus share, and uniform-spread ratio.

    Output columns: the key columns, ``n_rows`` (rows carrying the
    key), ``share`` (n_rows / total rows), ``skew`` (n_rows divided by
    total/distinct — 1.0 means perfectly uniform; K means this key is
    K x heavier than uniform). Ordered heaviest first; ties broken by
    the key columns ascending so the result is deterministic.
    """
    if isinstance(cols, str):
        cols = [cols]
    if not cols:
        raise ValueError("key_skew_report needs at least one key column")
    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n_rows"))
    # total rows and distinct-key count in one tiny second aggregate
    # over the per-key counts (rows = distinct keys, not input rows)
    totals = counts.agg(
        F.sum("n_rows").alias("_total"),
        F.count(F.lit(1)).alias("_distinct"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *cols,
            "n_rows",
            (F.col("n_rows") / F.col("_total")).alias("share"),
            (
                F.col("n_rows") / (F.col("_total") / F.col("_distinct"))
            ).alias("skew"),
        )
        .orderBy(F.desc("n_rows"), *[F.asc(c) for c in cols])
        .limit(top_n)
    )


def skew_stats(df: DataFrame, cols: list[str] | str) -> DataFrame:
    """One-row skew summary over the grouping key: ``distinct_keys``,
    ``max_key_rows``, ``avg_key_rows``, and ``skew_factor`` =
    max/avg — the number a caller gates salting on."""
    if isinstance(cols, str):
        cols = [cols]
    if not cols:
        raise ValueError("skew_stats needs at least one key column")
    counts = df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n_rows"))
    return counts.agg(
        F.count(F.lit(1)).alias("distinct_keys"),
        F.max("n_rows").alias("max_key_rows"),
        F.avg("n_rows").alias("avg_key_rows"),
        (F.max("n_rows") / F.avg("n_rows")).alias("skew_factor"),
    )
