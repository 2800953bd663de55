from .stateful import streaming_hll_distinct, windowed_hll_distinct

__all__ = ["streaming_hll_distinct", "windowed_hll_distinct"]
