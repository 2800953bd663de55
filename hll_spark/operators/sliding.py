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

# bound the per-partition combine map (same contract as agg.py's grouped
# scaffold): beyond this many concurrent groups flush partials early —
# the merge stage unions duplicate blobs, so correctness is unaffected
_MAX_GROUPS = 65536


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


def sliding_hll_sketch_by(
    df: DataFrame,
    col: str,
    ts_col: str,
    by: list[str],
    cfg: HllConfig | None = None,
    explicit_threshold: int = 0,
) -> DataFrame:
    """Per-group sliding sketches: ``(by..., sketch, max_ts)`` — one
    blob per group. Same two-level shape as the grouped scaffold
    (agg.py): mapInPandas builds per-(input partition, group) partials
    with a bounded combine map, then groupBy(by).applyInPandas merges —
    only blobs shuffle, O(groups) final rows."""
    cfg = cfg or HllConfig()
    not_null = F.col(col).isNotNull() & F.col(ts_col).isNotNull()
    proj = df.where(not_null).select(
        *by,
        F.xxhash64(F.col(col)).alias("__v"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__t"),
    )
    key_fields = [proj.schema[k] for k in by]
    partial_schema = StructType(
        key_fields + [StructField("sketch", BinaryType())]
    )

    def build_grouped(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        states: dict[tuple, SlidingHll] = {}

        def flush():
            rows = [
                k + (s.to_bytes(),) for k, s in states.items()
            ]
            return pd.DataFrame(rows, columns=list(by) + ["sketch"])

        for pdf in batches:
            if not len(pdf):
                continue
            for key, grp in pdf.groupby(by, dropna=False, sort=False):
                k = key if isinstance(key, tuple) else (key,)
                st = states.get(k)
                if st is None:
                    st = states[k] = SlidingHll(cfg, explicit_threshold)
                st.add_hashed(
                    grp["__v"].to_numpy(dtype=np.int64),
                    grp["__t"].to_numpy(dtype=np.int64),
                )
            if len(states) > _MAX_GROUPS:
                yield flush()
                states = {}
        if states:
            yield flush()

    partials = proj.mapInPandas(build_grouped, partial_schema)
    out_schema = StructType(
        key_fields
        + [StructField("sketch", BinaryType()), StructField("max_ts", LongType())]
    )

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = None
        for blob in pdf["sketch"]:
            s = SlidingHll.from_bytes(bytes(blob))
            acc = s if acc is None else acc.merge(s)
        head = pdf.iloc[[0]][by].reset_index(drop=True)
        head["sketch"] = [acc.to_bytes()]
        head["max_ts"] = [acc.max_ts if acc.max_ts is not None else -1]
        return head

    return partials.groupBy(*by).applyInPandas(merge_group, out_schema)


def sliding_distinct_windows(
    df: DataFrame,
    col: str,
    ts_col: str,
    windows: dict[str, int],
    cfg: HllConfig | None = None,
    explicit_threshold: int = 0,
    merge_buckets: int = 16,
    by: list[str] | None = None,
) -> DataFrame:
    """Distinct-``col`` estimate for each trailing window, from one scan.

    ``windows`` maps a label to a trailing span in SECONDS; each window
    is [anchor - span, anchor] (inclusive both ends). Output:
    (by..., window, distinct) sorted by label. With
    ``explicit_threshold`` above the distinct count the answers are
    exact (EXPLICIT tier), making the query oracle-checkable; at scale
    the LFPM tier answers within the 1.04/sqrt(m) HLL bound.

    Global (by=None): one sketch, anchored at its own max event time.
    Grouped (by=[...]): one sketch per group, every group anchored at
    the GLOBAL max event time (same wall-clock windows across keys —
    the cross-key-comparable convention; a 1-row broadcast carries the
    anchor). Groups with zero qualifying events in a window emit no
    row, matching grouped COUNT(DISTINCT) semantics.
    """
    wins = sorted(windows.items())
    if by:
        blobs = sliding_hll_sketch_by(
            df, col, ts_col, by, cfg, explicit_threshold
        )
        key_fields = [blobs.schema[k] for k in by]
        out_schema = StructType(
            key_fields
            + [
                StructField("window", StringType()),
                StructField("distinct", LongType()),
            ]
        )
        # the global anchor is ONE row — a pure-codegen max over the
        # input (cheaper than re-deriving the sketch subtree), broadcast
        # alongside every group blob (the only correct cross join:
        # 1 x groups)
        anchor_df = (
            df.where(F.col(col).isNotNull() & F.col(ts_col).isNotNull())
            .agg(
                F.max(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias(
                    "anchor_ts"
                )
            )
        )
        joined = blobs.join(F.broadcast(anchor_df))

        def answer_named(pdf: pd.DataFrame) -> pd.DataFrame:
            out: list[tuple] = []
            for _, row in pdf.iterrows():
                if pd.isna(row["anchor_ts"]):
                    continue
                s = SlidingHll.from_bytes(bytes(row["sketch"]))
                anchor = int(row["anchor_ts"])
                for name, span_s in wins:
                    est = s.estimate(anchor - int(span_s) * 1_000_000)
                    if est > 0:
                        out.append(
                            tuple(row[k] for k in by) + (name, est)
                        )
            return pd.DataFrame(out, columns=list(by) + ["window", "distinct"])

        return (
            joined.groupBy(*by)
            .applyInPandas(answer_named, out_schema)
            .orderBy(*by, "window")
        )

    blob_df = sliding_hll_sketch(
        df, col, ts_col, cfg, explicit_threshold, merge_buckets
    )
    out_schema = StructType(
        [
            StructField("window", StringType()),
            StructField("distinct", LongType()),
        ]
    )

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
