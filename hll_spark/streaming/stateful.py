"""Structured Streaming: incremental sketch maintenance.

The batch merge kernel drops directly into a stateful streaming operator
(SURVEY.md §2.2 streaming row): sketch state is bounded (O(m) bytes per
group), merges are associative, so ``applyInPandasWithState`` keeps one
serialized sketch per group key and unions each micro-batch's partial
into it — a streaming COUNT(DISTINCT) with constant state, the thing the
exact aggregation fundamentally cannot do at 100 TB/day ingest.

Also provided: watermarked tumbling-window distinct counts built from the
same kernel (late data beyond the watermark is dropped by Spark's window
machinery; within the window the sketch union is order-insensitive, so
late-but-accepted rows land exactly).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..sketchlib.hll import HllConfig, HllSketch

STATE_SCHEMA = StructType(
    [StructField("sketch", BinaryType()), StructField("rows_seen", LongType())]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("sketch", BinaryType()),
        StructField("rows_seen", LongType()),
        StructField("start_ms", LongType()),
        StructField("last_ms", LongType()),
    ]
)


def streaming_hll_distinct(
    stream_df: DataFrame,
    col: str,
    key_col: str,
    cfg: HllConfig | None = None,
) -> DataFrame:
    """Continuously-updated distinct count per ``key_col``.

    Emits (key, distinct_estimate, rows_seen, sketch) after every
    micro-batch that touches the key. State per key is one serialized
    sketch — bounded by the FULL representation size regardless of
    stream length.
    """
    cfg = cfg or HllConfig()
    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("distinct_estimate", LongType()),
            StructField("rows_seen", LongType()),
            StructField("sketch", BinaryType()),
        ]
    )

    def update(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            blob, rows = state.get
            sketch = HllSketch.from_bytes(bytes(blob))
        else:
            sketch, rows = HllSketch.empty(cfg), 0
        for pdf in batches:
            vals = pdf["__h"].to_numpy(np.int64)
            sketch.add_hashed(vals)
            rows += len(pdf)
        blob = sketch.to_bytes()
        state.update((blob, rows))
        yield pd.DataFrame(
            {
                "key": [str(key[0])],
                "distinct_estimate": [sketch.estimate()],
                "rows_seen": [rows],
                "sketch": [blob],
            }
        )

    hashed = stream_df.select(
        F.col(key_col).cast("string").alias(key_col),
        F.xxhash64(F.col(col)).alias("__h"),
    )
    return hashed.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_hll_distinct(
    stream_df: DataFrame,
    col: str,
    ts_col: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    cfg: HllConfig | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Tumbling (default) or sliding window distinct counts with a
    late-data watermark.

    ``slide`` < ``window`` turns the windows sliding: Spark's window()
    assigns each event to window/slide overlapping windows (one state
    row each), so state grows by that factor — each window's sketch
    stays bounded and is still evicted at watermark, exactly like the
    tumbling case.

    Window assignment and watermarking are Spark built-ins; the sketch
    union inside each window group reuses the batch kernel. The stateful
    operator is keyed by the window's (start, end) *timestamps* — not a
    string cast — and uses ``EventTimeTimeout``: each update arms a
    timeout at the window end, so once the watermark passes the window
    (no further rows can be admitted) the state is removed. Per-window
    state is therefore evicted, not grown without bound, on a
    long-running stream.
    """
    cfg = cfg or HllConfig()
    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("distinct_estimate", LongType()),
            StructField("rows_seen", LongType()),
            StructField("sketch", BinaryType()),
        ]
    )

    def update(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        win_start, win_end = key
        if state.hasTimedOut:
            # watermark passed the window end: no more rows can be
            # admitted for this window, so the sketch is final — drop it.
            state.remove()
            return
        if state.exists:
            blob, rows = state.get
            sketch = HllSketch.from_bytes(bytes(blob))
        else:
            sketch, rows = HllSketch.empty(cfg), 0
        for pdf in batches:
            sketch.add_hashed(pdf["__h"].to_numpy(np.int64))
            rows += len(pdf)
        blob = sketch.to_bytes()
        state.update((blob, rows))
        end_ms = int(pd.Timestamp(win_end).value // 1_000_000)
        # the timeout must sit above the current watermark; windows whose
        # end already trails the watermark time out on the next trigger
        state.setTimeoutTimestamp(max(end_ms, state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame(
            {
                "key": [str(win_start)],
                "distinct_estimate": [sketch.estimate()],
                "rows_seen": [rows],
                "sketch": [blob],
            }
        )

    # The watermark is declared on win_start (the grouping key), the
    # event-time column that actually reaches the stateful operator.
    # Since win_start <= ts, the effective late-data allowance is
    # `watermark` plus at most one window length — never shorter than
    # requested — and the state timeout below still fires once no row
    # for the window can be admitted.
    bucketed = (
        stream_df.select(
            F.window(F.col(ts_col), window, slide or window).alias("__w"),
            F.xxhash64(F.col(col)).alias("__h"),
        )
        .select(
            F.col("__w.start").alias("win_start"),
            F.col("__w.end").alias("win_end"),
            "__h",
        )
        .withWatermark("win_start", watermark)
    )
    return bucketed.groupBy("win_start", "win_end").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def session_hll_distinct(
    stream_df: DataFrame,
    col: str,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
    cfg: HllConfig | None = None,
) -> DataFrame:
    """Gap-based session windows with per-session distinct counts.

    A session is a maximal run of a key's events with inter-event gaps
    <= ``gap_seconds`` (the batch ``sessionize`` semantics, streamed).
    State per key is ONE open session: (sketch, rows, start, last) —
    bounded regardless of stream length. A session row is emitted when
    the session CLOSES: either a later in-gap-violating event arrives,
    or the event-time watermark passes ``last + gap`` (EventTimeTimeout,
    which also removes state for idle keys — no unbounded growth).
    """
    cfg = cfg or HllConfig()
    gap_ms = int(gap_seconds) * 1000
    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("session_start_ms", LongType()),
            StructField("session_end_ms", LongType()),
            StructField("distinct_estimate", LongType()),
            StructField("rows_seen", LongType()),
        ]
    )

    def _row(key, start_ms, last_ms, sketch, rows):
        return {
            "key": str(key[0]),
            "session_start_ms": int(start_ms),
            "session_end_ms": int(last_ms),
            "distinct_estimate": int(sketch.estimate()),
            "rows_seen": int(rows),
        }

    def update(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            blob, rows, start_ms, last_ms = state.get
            sketch = HllSketch.from_bytes(bytes(blob))
            state.remove()
            yield pd.DataFrame([_row(key, start_ms, last_ms, sketch, rows)])
            return
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs).sort_values("__ts_ms")
        ts = pdf["__ts_ms"].to_numpy(np.int64)
        h = pdf["__h"].to_numpy(np.int64)
        if state.exists:
            blob, rows, start_ms, last_ms = state.get
            sketch = HllSketch.from_bytes(bytes(blob))
        else:
            sketch, rows, start_ms, last_ms = None, 0, 0, 0
        closed: list[dict] = []
        bounds = np.nonzero(np.diff(ts) > gap_ms)[0] + 1
        for seg in np.split(np.arange(len(ts)), bounds):
            seg_start, seg_end = int(ts[seg[0]]), int(ts[seg[-1]])
            if sketch is not None and seg_end < start_ms - gap_ms:
                # Watermark-admitted late segment that ends a full gap
                # BEFORE the open session starts: a distinct earlier
                # session, not part of the open one. Emit it closed
                # immediately (approximation: even-later stragglers
                # belonging to it would re-open a new tiny session
                # rather than extend this emitted row — the same
                # trade-off batch sessionize makes at partition edges).
                late = HllSketch.empty(cfg)
                late.add_hashed(h[seg])
                closed.append(_row(key, seg_start, seg_end, late, len(seg)))
            elif sketch is not None and seg_start - last_ms <= gap_ms:
                # In-gap of the open session. seg may also PREDATE the
                # session start (late data within one gap of it) — then
                # the session genuinely extends backward.
                sketch.add_hashed(h[seg])
                rows += len(seg)
                start_ms = min(start_ms, seg_start)
                last_ms = max(last_ms, seg_end)
            else:
                if sketch is not None:
                    closed.append(_row(key, start_ms, last_ms, sketch, rows))
                sketch = HllSketch.empty(cfg)
                sketch.add_hashed(h[seg])
                rows, start_ms, last_ms = len(seg), seg_start, seg_end
        state.update((sketch.to_bytes(), rows, start_ms, last_ms))
        state.setTimeoutTimestamp(
            max(last_ms + gap_ms, state.getCurrentWatermarkMs() + 1)
        )
        if closed:
            yield pd.DataFrame(closed)

    prepared = stream_df.withWatermark(ts_col, watermark).select(
        F.col(key_col).cast("string").alias(key_col),
        F.col(ts_col),  # watermarked event-time column must survive
        (F.col(ts_col).cast("timestamp_ltz").cast("double") * 1000)
        .cast("long")
        .alias("__ts_ms"),
        F.xxhash64(F.col(col)).alias("__h"),
    )
    return prepared.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sink_sketch_table(stream_df: DataFrame, path: str, key_col: str = "key"):
    """Continuously maintain a durable sketch table from a streaming
    sketch query (e.g. :func:`streaming_hll_distinct` output).

    The stateful operator emits each key's FULL cumulative sketch every
    micro-batch, so upsert semantics reduce to "replace the key's row
    with the newest": foreachBatch writes the batch partitioned by
    ``key_col`` with DYNAMIC partition overwrite — only the keys
    touched in this batch are rewritten, every other key's cell is
    untouched. The resulting table is a queryable sketch cube cell set
    (estimate with hll_estimate_udf, union slices with
    plans.cube.query_sketch_cube semantics), always current to the
    last completed micro-batch.

    Scale note: one partition directory per key is the right shape for
    BOUNDED key cardinality (event types, langs, windows, tenants —
    the usual sketch-table grain). For millions of keys, plain parquet
    cannot read-modify-overwrite a shared bucket atomically; use an
    Iceberg/Delta MERGE sink there (the emitted frame is already in
    upsert form), or append-log + periodic compaction.

    Returns a DataStreamWriter; caller adds checkpointLocation/trigger
    and .start().
    """

    def upsert(bdf: DataFrame, batch_id: int) -> None:
        (
            bdf.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(key_col)
            .parquet(path)
        )

    return stream_df.writeStream.foreachBatch(upsert).outputMode("update")


def streaming_sketch_distinct(
    stream_df: DataFrame,
    col: str,
    key_col: str,
    spec,
) -> DataFrame:
    """Sketch-generic version of :func:`streaming_hll_distinct`: keeps
    ONE serialized sketch of any :class:`~..operators.agg.SketchSpec`
    per key (theta for streaming set ops, CMS for streaming counts, ...)
    and unions each micro-batch in. Emits (key, sketch, rows_seen);
    estimate/probe with the sketch's scalar UDFs downstream. State stays
    bounded by the sketch's own size contract.
    """
    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("sketch", BinaryType()),
            StructField("rows_seen", LongType()),
        ]
    )

    def update(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            blob, rows = state.get
            sketch = spec.from_bytes_fn(bytes(blob))
        else:
            sketch, rows = spec.zero_fn(), 0
        for pdf in batches:
            sketch = spec.update_fn(sketch, pdf["__h"].to_numpy(np.int64))
            rows += len(pdf)
        blob = spec.to_bytes_fn(sketch)
        state.update((blob, rows))
        yield pd.DataFrame(
            {"key": [str(key[0])], "sketch": [blob], "rows_seen": [rows]}
        )

    hashed = stream_df.select(
        F.col(key_col).cast("string").alias(key_col),
        F.xxhash64(F.col(col)).alias("__h"),
    )
    return hashed.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_mg_topk(
    stream_df: DataFrame,
    item_col: str,
    key_col: str,
    k: int = 256,
    top_n: int = 10,
) -> DataFrame:
    """Streaming heavy hitters: one Misra-Gries summary (at most ``k``
    counters, see sketchlib/mg.py) per group key; each micro-batch is
    folded in through the batch ``update`` (one C-speed ``value_counts``
    per batch, Python cost O(distinct-per-batch)) and the CURRENT
    top-``top_n`` is emitted per key per batch.

    Emits (key, rank, item, est_count, max_undercount, rows_seen):
    ``est_count`` is the MG lower bound — true count lies in
    [est_count, est_count + max_undercount], and max_undercount <=
    rows_seen/(k+1) after any batching (the mergeability theorem) —
    rank 1..top_n by (est_count desc, item asc). Downstream dedupes on
    the latest rows_seen per key (``update`` output mode), same as
    :func:`streaming_sketch_distinct`.

    State stays O(k) per key forever — the streaming top-k the exact
    groupBy-count cannot provide at 100 TB/day: unlike CMS this needs
    no candidate heap, and items with frequency > rows_seen/(k+1) are
    GUARANTEED present.
    """
    if top_n < 1:
        raise ValueError(f"top_n must be >= 1, got {top_n}")
    from ..sketchlib.mg import MisraGries

    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("rank", LongType()),
            StructField("item", StringType()),
            StructField("est_count", LongType()),
            StructField("max_undercount", LongType()),
            StructField("rows_seen", LongType()),
        ]
    )

    def update(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            blob, rows = state.get
            mg = MisraGries.from_bytes(bytes(blob))
        else:
            mg, rows = MisraGries(k), 0
        for pdf in batches:
            mg.update(pdf["__item"])
            rows += len(pdf)
        state.update((mg.to_bytes(), rows))
        top = mg.top(top_n)
        yield pd.DataFrame(
            {
                "key": [str(key[0])] * len(top),
                "rank": np.arange(1, len(top) + 1, dtype=np.int64),
                "item": [i for i, _ in top],
                "est_count": np.array([c for _, c in top], dtype=np.int64),
                "max_undercount": np.full(len(top), mg.offset, dtype=np.int64),
                "rows_seen": np.full(len(top), rows, dtype=np.int64),
            }
        )

    items = stream_df.select(
        F.col(key_col).cast("string").alias(key_col),
        F.col(item_col).cast("string").alias("__item"),
    )
    return items.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_quantiles(
    stream_df: DataFrame,
    col: str,
    key_col: str,
    spec=None,
    qs: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Per-key STREAMING QUANTILES: one mergeable quantile sketch (KLL
    by default; pass ``sketches.tdigest_spec(...)`` for tails) per key,
    each micro-batch folded in and the current quantile estimates
    emitted as (key, sketch, rows_seen, p50, p90, ...).

    The projection difference from :func:`streaming_sketch_distinct`
    is the point: quantile sketches ORDER raw values, so the column
    streams in as doubles, never hashed. NULL/NaN values are dropped
    (SQL aggregate semantics). State stays bounded by the sketch's own
    size contract (KLL: O(k log(n/k)) items per key) regardless of
    stream length — the percentile dashboard the exact sort cannot
    provide over an unbounded stream. Quantile columns are named
    ``p50``-style from ``qs`` (dots -> underscores, so 0.999 -> p99_9).
    """
    from ..operators.sketches import kll_spec

    spec = spec or kll_spec()
    names = [("p" + format(q * 100, "g")).replace(".", "_") for q in qs]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate quantile columns from qs={qs}")
    from pyspark.sql.types import DoubleType

    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("sketch", BinaryType()),
            StructField("rows_seen", LongType()),
        ]
        + [StructField(n, DoubleType()) for n in names]
    )

    def update(
        key: Tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            blob, rows = state.get
            sketch = spec.from_bytes_fn(bytes(blob))
        else:
            sketch, rows = spec.zero_fn(), 0
        for pdf in batches:
            vals = pdf["__v"].to_numpy(np.float64)
            vals = vals[~np.isnan(vals)]
            if len(vals):
                sketch = spec.update_fn(sketch, vals)
                rows += len(vals)
        blob = spec.to_bytes_fn(sketch)
        state.update((blob, rows))
        row = {"key": [str(key[0])], "sketch": [blob], "rows_seen": [rows]}
        for n, q in zip(names, qs):
            row[n] = [float(sketch.quantile(q)) if rows else float("nan")]
        yield pd.DataFrame(row)

    projected = stream_df.select(
        F.col(key_col).cast("string").alias(key_col),
        F.col(col).cast("double").alias("__v"),
    ).where(F.col("__v").isNotNull())
    return projected.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
