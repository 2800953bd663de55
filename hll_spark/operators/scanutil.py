"""Scan-parallelism repair for compute-heavy per-row stages.

Single-file parquet inputs written as one row group cannot be split:
however small ``files.maxPartitionBytes`` is, only the split containing
the row-group midpoint produces rows, so a CPU-heavy stage directly on
top of the scan (n-gram explosion, perplexity scoring, media decode)
runs on ONE core regardless of cluster size — the "input skew: one huge
unsplittable file" case of the optimization playbook (§2.5), whose
prescribed fix is a repartition immediately after the read.

``fan_out_scan`` applies that fix ONLY when it is provably cheap and
useful: the plan's estimated input size must be small enough that one
extra round-robin exchange is trivial next to the per-row work it
unlocks, and the estimated split count must be well below the session's
default parallelism. At scale neither condition holds (a 100 TB table
has thousands of natural splits and the guard sees the size), so the
exchange vanishes from the plan exactly where it would hurt — this is a
plan decision from input statistics, not a local-mode constant.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

# inputs above this are left to their natural splits (an exchange of
# this much data is no longer "trivial"); override per deployment
FAN_OUT_MAX_BYTES = int(
    os.environ.get("HLL_SPARK_FAN_OUT_MAX_BYTES", str(4 << 30))
)


def _estimated_scan_partitions(df: DataFrame) -> tuple[int, int]:
    """(estimated split count, estimated bytes) from logical-plan
    statistics — no job, no physical planning beyond what the coming
    action does anyway."""
    size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    max_pb = int(
        df.sparkSession._jsparkSession.sessionState()
        .conf()
        .filesMaxPartitionBytes()
    )
    return max(1, -(-size // max(max_pb, 1))), size


def plan_bytes(df: DataFrame) -> int:
    """Optimized-logical-plan size estimate in bytes; 0 when stats are
    unavailable (callers treat that as 'not provably large')."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return 0


def plan_is_small(df: DataFrame, max_bytes: int | None = None) -> bool:
    """True when ``df``'s optimized-plan size estimate is available and
    under ``max_bytes`` (default FAN_OUT_MAX_BYTES).

    Use on frames whose statistics are trustworthy (scans, cached
    frames, pre-join inputs): join outputs inherit multiplied
    cardinality estimates that can read in the terabytes for
    kilobyte-sized results, so gate on the join's INPUT, not its
    output. Callers use this to force CPU-bound stages wide on small
    inputs, where AQE's byte-floor (minPartitionSize) would otherwise
    coalesce a compute-heavy shuffle down to a couple of tasks; on
    large inputs the byte volume itself gives AQE the parallelism and
    the caller leaves the plan alone."""
    if max_bytes is None:
        max_bytes = FAN_OUT_MAX_BYTES
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return False
    return size <= max_bytes


def fan_out_scan(df: DataFrame, max_bytes: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` to the default parallelism when
    (and only when) its scan is parallelism-starved and small.

    Returns ``df`` unchanged when statistics are unavailable, when the
    input is estimated above ``max_bytes`` (default 4 GiB, env
    ``HLL_SPARK_FAN_OUT_MAX_BYTES``), or when the scan already yields
    at least half the session's default parallelism. Row content is
    untouched — only the partitioning changes, so any per-row map or
    keyed aggregation downstream computes identical results.
    """
    if max_bytes is None:
        max_bytes = FAN_OUT_MAX_BYTES
    try:
        target = df.sparkSession.sparkContext.defaultParallelism
        parts, size = _estimated_scan_partitions(df)
    except Exception:  # non-classic backend — leave the plan alone
        return df
    if size > max_bytes or parts * 2 >= target:
        return df
    return df.repartition(target)
