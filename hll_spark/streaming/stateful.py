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
) -> DataFrame:
    """Tumbling-window distinct counts with a late-data watermark.

    Window assignment and watermarking are Spark built-ins; the sketch
    union inside each (window) group reuses the batch stateful kernel via
    the same applyInPandasWithState path keyed by window start.
    """
    cfg = cfg or HllConfig()
    bucketed = (
        stream_df.withWatermark(ts_col, watermark)
        .select(
            F.window(F.col(ts_col), window).start.cast("string").alias("win_start"),
            F.col(col).alias("v"),
        )
    )
    return streaming_hll_distinct(bucketed, "v", "win_start", cfg)
