"""Sliding-window distinct counts on Spark: build ONE mergeable
Chabchoub-Hebrail sliding-HLL sketch in one pass, then answer ANY
trailing time window from the final blob.

Execution shape is the standard two-level sketch tree (SURVEY.md §3.4):

  scan (Catalyst prunes to [col, ts])
    -> JVM-side xxhash64 + unix_micros projection (whole-stage codegen)
    -> mapInArrow: one partial sliding sketch per input partition
    -> groupBy(bucket).applyInPandas: level-1 merges
    -> single final merge -> per-window estimates exploded from 1 row

Only O(partitions) sketch blobs (each O(m ln n)) ever cross the
shuffle, independent of input size — the same property as the base HLL
scaffold (agg.py), so the plan survives a 10^12-row scan. The window
answers come AFTER the scan: one pass serves every window, where naive
per-window COUNT(DISTINCT) would rescan per window.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sketchlib.hll import HllConfig
from ..sketchlib.slidinghll import SlidingHll

_PARTIAL_SCHEMA = StructType(
    [
        StructField("bucket", LongType()),
        StructField("sketch", BinaryType()),
    ]
)


def sliding_hll_sketch(
    df: DataFrame,
    col: str,
    ts_col: str,
    cfg: HllConfig | None = None,
    explicit_threshold: int = 0,
    merge_buckets: int = 16,
) -> DataFrame:
    """One-row DataFrame ``(sketch binary)`` holding the merged sliding
    sketch of ``col`` distincts with ``ts_col`` event times (micros)."""
    cfg = cfg or HllConfig()
    proj = df.where(F.col(col).isNotNull() & F.col(ts_col).isNotNull()).select(
        F.xxhash64(F.col(col)).alias("__v"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__t"),
    )

    import pyarrow as pa

    arrow_schema = pa.schema([("bucket", pa.int64()), ("sketch", pa.binary())])
    nbuckets = max(1, merge_buckets)

    def build(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        from pyspark import TaskContext

        state = SlidingHll(cfg, explicit_threshold)
        seen = False
        for rb in batches:
            if not rb.num_rows:
                continue
            seen = True
            h = rb.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
            t = rb.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
            state.add_hashed(h, t)
        if seen:
            pid = TaskContext.get().partitionId() if TaskContext.get() else 0
            yield pa.RecordBatch.from_pydict(
                {"bucket": [pid % nbuckets], "sketch": [state.to_bytes()]},
                schema=arrow_schema,
            )

    partials = proj.mapInArrow(build, _PARTIAL_SCHEMA)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = None
        for blob in pdf["sketch"]:
            s = SlidingHll.from_bytes(bytes(blob))
            acc = s if acc is None else acc.merge(s)
        return pd.DataFrame({"bucket": [0], "sketch": [acc.to_bytes()]})

    level1 = partials.groupBy("bucket").applyInPandas(merge_group, _PARTIAL_SCHEMA)
    final = level1.groupBy(F.lit(0).alias("bucket")).applyInPandas(
        merge_group, _PARTIAL_SCHEMA
    )
    return final.select("sketch")


def sliding_distinct_windows(
    df: DataFrame,
    col: str,
    ts_col: str,
    windows: dict[str, int],
    cfg: HllConfig | None = None,
    explicit_threshold: int = 0,
    merge_buckets: int = 16,
) -> DataFrame:
    """Distinct-``col`` estimate for each trailing window, from one scan.

    ``windows`` maps a label to a trailing span in SECONDS; each window
    is [max_ts - span, max_ts] (inclusive both ends), anchored at the
    sketch's own max event time. Output: (window, distinct) sorted by
    label. With ``explicit_threshold`` above the distinct count the
    answers are exact (EXPLICIT tier), making the query oracle-checkable;
    at scale the LFPM tier answers within the 1.04/sqrt(m) HLL bound.
    """
    blob_df = sliding_hll_sketch(
        df, col, ts_col, cfg, explicit_threshold, merge_buckets
    )
    out_schema = StructType(
        [
            StructField("window", StringType()),
            StructField("distinct", LongType()),
        ]
    )
    wins = sorted(windows.items())

    def answer(pdf: pd.DataFrame) -> pd.DataFrame:
        s = SlidingHll.from_bytes(bytes(pdf["sketch"].iloc[0]))
        anchor = s.max_ts if s.max_ts is not None else 0
        rows = []
        for name, span_s in wins:
            start = anchor - int(span_s) * 1_000_000
            rows.append((name, s.estimate(start)))
        return pd.DataFrame(rows, columns=["window", "distinct"])

    return (
        blob_df.groupBy(F.lit(0).alias("g"))
        .applyInPandas(lambda pdf: answer(pdf), out_schema)
        .orderBy("window")
    )
