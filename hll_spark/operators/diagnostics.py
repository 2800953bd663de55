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


def join_plan_report(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str | None = None,
    broadcast_threshold_rows: int = 10_000_000,
    skew_share_threshold: float = 0.2,
    ams_depth: int = 5,
    ams_width: int = 1024,
) -> DataFrame:
    """Sketch-driven join planning: one row that prices
    ``left JOIN right ON left_col = right_col`` BEFORE running it, from
    three sketch passes that never shuffle anything but blobs.

    Columns:

    - ``rows_left`` / ``rows_right`` — input sizes (from the sketch
      passes' rows_seen, no extra count job)
    - ``est_join_rows`` / ``sigma`` — Fast-AMS inner-product estimate
      of the join output size and its one-sigma scale
    - ``top_share_left`` / ``top_share_right`` — the heaviest key's
      share of each side (Misra-Gries top-1 lower bound / rows), the
      skew signal
    - ``recommendation`` — 'broadcast_right' / 'broadcast_left' when a
      side is under ``broadcast_threshold_rows``; else 'salted_join'
      when either side's heaviest key exceeds ``skew_share_threshold``
      (one key owning >20% of a side makes a plain shuffle join one
      straggler task); else 'shuffle_hash_join'.

    The thresholds are heuristics the caller can tune; the measured
    columns are the point. At 100 TB this costs three sketch scans and
    moves only KB of blobs — the join it prices would move the corpus.
    """
    from .sketches import ams_join_size, mg_top_items

    right_col = right_col or left_col
    est = ams_join_size(
        left, left_col, right, right_col,
        depth=ams_depth, width=ams_width,
    ).collect()[0]

    def top_share(df: DataFrame, col: str, rows: int) -> float:
        if rows <= 0:
            return 0.0
        top = (
            mg_top_items(df, col, top_n=1, k=256)
            .collect()
        )
        return float(top[0]["count_lb"]) / rows if top else 0.0

    share_l = top_share(left, left_col, est["rows_left"])
    share_r = top_share(right, right_col, est["rows_right"])
    if est["rows_right"] <= broadcast_threshold_rows:
        rec = "broadcast_right"
    elif est["rows_left"] <= broadcast_threshold_rows:
        rec = "broadcast_left"
    elif max(share_l, share_r) > skew_share_threshold:
        rec = "salted_join"
    else:
        rec = "shuffle_hash_join"
    return left.sparkSession.createDataFrame(
        [
            (
                est["rows_left"],
                est["rows_right"],
                est["est_join_rows"],
                est["sigma"],
                share_l,
                share_r,
                rec,
            )
        ],
        "rows_left bigint, rows_right bigint, est_join_rows double, "
        "sigma double, top_share_left double, top_share_right double, "
        "recommendation string",
    )
