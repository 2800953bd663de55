from .agg import (
    SketchSpec,
    hll_distinct,
    hll_sketch_agg,
    merge_sketch_partials,
    sketch_aggregate,
    sketch_partials,
)

__all__ = [
    "SketchSpec",
    "hll_distinct",
    "hll_sketch_agg",
    "merge_sketch_partials",
    "sketch_aggregate",
    "sketch_partials",
]
