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


_BUDGET_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("budget_offset", LongType()),
    ]
)


def select_to_token_budget(
    df: DataFrame,
    id_col: str,
    token_count_col,
    budget: int,
    order_by=None,
) -> DataFrame:
    """Greedy-fill corpus selection: walk documents in ``order_by``
    order and keep each doc whose EXCLUSIVE running token total is
    still below ``budget`` — the "take the best documents up to N
    tokens" primitive of mixture construction (DoReMi-style domain
    budgets, epoch sizing, 'top X by classifier score until the token
    budget fills'). The doc that crosses the boundary is kept whole
    (manifest semantics for trimming it live in ``pack_sequences``).

    Returns (doc_id, budget_offset) — the kept ids with each doc's
    exact global start offset in the ordered token stream; semi-join
    back to ``df`` for the full rows. ``order_by`` is a list of
    ``(expr, descending)`` pairs — a bare column name/Column means
    ascending (e.g. ``[("score", True), "doc_id"]`` = score DESC,
    doc_id ASC; default: ``id_col`` ascending) — and MUST be a total
    order: ties would make the prefix sums ambiguous across engines.

    Scale shape: the same two-phase scan as ``pack_sequences`` (one
    range shuffle, per-partition totals prefix-summed on the driver),
    plus a prune ``pack_sequences`` cannot do: partitions whose base
    offset already exceeds ``budget`` are skipped wholesale in the
    final pass, so a 1%-of-corpus budget does vectorized work on ~1%
    of partitions (every partition is still scanned once for its
    total — one O(n) pass, unavoidable without a pre-aggregated
    token index).
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    norm = []  # [(value Column, descending bool)]
    for o in order_by if order_by else [id_col]:
        expr, desc = o if isinstance(o, tuple) else (o, False)
        expr = F.col(expr) if isinstance(expr, str) else expr
        norm.append((expr, bool(desc)))
    tokens = (
        F.col(token_count_col)
        if isinstance(token_count_col, str)
        else token_count_col
    )
    base = df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        tokens.cast("long").alias("__tok"),
        *[e.alias(f"__o{i}") for i, (e, _) in enumerate(norm)],
    ).where(F.col("__tok") > 0)
    sort_exprs = [
        F.col(f"__o{i}").desc() if d else F.col(f"__o{i}").asc()
        for i, (_, d) in enumerate(norm)
    ]
    ordered = (
        base.repartitionByRange(max(df.rdd.getNumPartitions(), 1), *sort_exprs)
        .sortWithinPartitions(*sort_exprs)
        .localCheckpoint(eager=False)
    )
    totals = (
        ordered.groupBy(F.spark_partition_id().alias("__pid"))
        .agg(F.sum("__tok").alias("__sum"))
        .collect()
    )
    sums = {r["__pid"]: r["__sum"] for r in totals}
    live: dict[int, int] = {}
    acc = 0
    for pid in sorted(sums):
        if acc < budget:
            live[pid] = acc
        acc += sums[pid]
    cap = int(budget)

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        if pid not in live:
            return  # pruned: every doc here starts at/after the budget
        pos = live[pid]
        for b in batches:
            tok = b["__tok"].to_numpy(dtype=np.int64)
            if not len(tok):
                continue
            start = pos + np.concatenate(([0], np.cumsum(tok[:-1])))
            pos = int(start[-1] + tok[-1])
            keep = start < cap
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"].to_numpy()[keep],
                    "budget_offset": start[keep],
                }
            )
            if pos >= cap:
                return  # the rest of this partition starts past budget

    return ordered.mapInPandas(emit, _BUDGET_SCHEMA)

