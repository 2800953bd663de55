from .increment import streaming_dedup_increment
from .stateful import streaming_hll_distinct, windowed_hll_distinct

__all__ = [
    "streaming_dedup_increment",
    "streaming_hll_distinct",
    "windowed_hll_distinct",
]
