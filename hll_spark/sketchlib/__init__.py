from .bloom import BloomFilter
from .cms import CountMinSketch
from .hll import HllConfig, HllSketch
from .kll import KllSketch
from .tdigest import TDigest

__all__ = ["BloomFilter", "CountMinSketch", "HllConfig", "HllSketch", "KllSketch", "TDigest"]
