"""Training-sequence packing: lay documents end-to-end in a
deterministic global order and split the token stream into fixed-size
training sequences ("packs") — the standard GPT-style pretraining
layout (concatenate corpus, cut every ``max_tokens``).

Output is the pack *manifest*: one row per (document, pack) incidence
with the exact slice arithmetic, which is what a training-data writer
needs to materialize packed sequences without ever holding the
concatenated stream anywhere:

    doc_id      the document
    pack_id     which training sequence the slice lands in (0-based)
    doc_offset  first token of the slice, within the document
    pack_offset where the slice starts inside the pack
    slice_len   tokens in the slice (> 0)

A document longer than ``max_tokens`` spans several packs (one row per
pack); zero-token documents occupy no span and emit no row.

100 TB design — the classic two-phase distributed scan (same shape as
``zipWithIndex``), because the naive formulation (a global window
cumsum ``ORDER BY doc_id`` with no partition key) collapses the whole
corpus into ONE task in Spark:

1. range-repartition + sort by the order column — a single O(n)
   shuffle that gives a total order across partitions;
2. per-partition token totals (one tiny row per partition) are
   collected and exclusive-prefix-summed on the driver — KB-sized at
   any corpus scale — and broadcast back as plain task locals;
3. one ``mapInPandas`` pass computes each document's global start
   offset (partition base + local cumsum) and emits its pack spans
   with vectorized numpy (a doc covering k packs repeats k times via
   ``np.repeat``); no second shuffle, no driver data path beyond the
   per-partition totals.

Both passes run over one cached ordered layout, so the partitioning
seen by phase 2 and phase 3 is byte-identical.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType

_MANIFEST_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("pack_id", LongType()),
        StructField("doc_offset", LongType()),
        StructField("pack_offset", LongType()),
        StructField("slice_len", LongType()),
    ]
)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col,
    max_tokens: int,
    order_col: str | None = None,
) -> DataFrame:
    """Pack manifest for fixed-size training sequences.

    ``token_count_col`` is a column name or Column with each document's
    token count; ``order_col`` (default: ``id_col``) fixes the
    deterministic concatenation order. See the module docstring for
    the output contract and the distributed plan.
    """
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    order_col = order_col or id_col
    tokens = (
        F.col(token_count_col)
        if isinstance(token_count_col, str)
        else token_count_col
    )

    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(order_col).alias("__ord"),
        tokens.cast("long").alias("__tok"),
    ).where(F.col("__tok") > 0)
    # phase 1: one O(n) shuffle into a total order. localCheckpoint
    # pins the exact partition layout so the totals pass (phase 2) and
    # the span pass (phase 3) cannot see different samplings.
    ordered = (
        base.repartitionByRange(max(df.rdd.getNumPartitions(), 1), "__ord")
        .sortWithinPartitions("__ord")
        .localCheckpoint(eager=False)
    )

    # phase 2: per-partition token totals -> driver (one tiny row per
    # partition at ANY corpus size) -> exclusive prefix sum
    totals = (
        ordered.groupBy(F.spark_partition_id().alias("__pid"))
        .agg(F.sum("__tok").alias("__sum"))
        .collect()
    )
    sums = {r["__pid"]: r["__sum"] for r in totals}
    bases: dict[int, int] = {}
    acc = 0
    for pid in sorted(sums):
        bases[pid] = acc
        acc += sums[pid]

    cap = int(max_tokens)

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        from pyspark import TaskContext

        pos = bases.get(TaskContext.get().partitionId(), 0)
        for b in batches:
            tok = b["__tok"].to_numpy(dtype=np.int64)
            if not len(tok):
                continue
            start = pos + np.concatenate(([0], np.cumsum(tok[:-1])))
            pos = int(start[-1] + tok[-1])
            end = start + tok  # exclusive
            first_pack = start // cap
            last_pack = (end - 1) // cap
            n_spans = (last_pack - first_pack + 1).astype(np.int64)
            doc_ix = np.repeat(np.arange(len(tok)), n_spans)
            # pack index within each doc's span run: 0,1,..,k-1
            offs = np.arange(len(doc_ix)) - np.repeat(
                np.concatenate(([0], np.cumsum(n_spans[:-1]))), n_spans
            )
            pack = first_pack[doc_ix] + offs
            lo = np.maximum(start[doc_ix], pack * cap)
            hi = np.minimum(end[doc_ix], (pack + 1) * cap)
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"].to_numpy()[doc_ix],
                    "pack_id": pack,
                    "doc_offset": lo - start[doc_ix],
                    "pack_offset": lo - pack * cap,
                    "slice_len": hi - lo,
                }
            )

    return ordered.mapInPandas(emit, _MANIFEST_SCHEMA)
