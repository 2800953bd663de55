"""Scalar function surface (SURVEY.md §2.2 scalar-functions row).

Pandas-UDF factories for the sketch family plus the spec-parity hash,
re-exported here as the one-stop function registry. Everything generic
(string/date/math) is deliberately *not* wrapped — use
``pyspark.sql.functions`` built-ins; they stay in whole-stage codegen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, LongType

from ..operators.agg import (
    hll_estimate_udf,
    hll_intersect_udf,
    hll_union_udf,
)
from ..operators.text import fingerprint_udf, lang_id_udf
from ..sketchlib.bloom import BloomFilter
from ..sketchlib.cms import CountMinSketch
from ..sketchlib.hashing import murmur3_x64_128_low64
from ..sketchlib.kll import KllSketch
from ..sketchlib.tdigest import TDigest


def murmur3_64_udf(seed: int = 0):
    """Vectorized MurmurHash3-x64-128 low64 of a string column — the
    postgresql-hll spec-parity input hash (seed 0). Prefer the built-in
    ``xxhash64`` when cross-system sketch parity is not required."""

    def h(s: pd.Series) -> pd.Series:
        return pd.Series(murmur3_x64_128_low64(s, seed).view(np.int64))

    return pandas_udf(h, LongType())


def extract_text_udf():
    """Vectorized HTML -> visible-text extraction (the Arrow batch
    kernel, operators/extractkernel.py) as a scalar pandas UDF — lets
    ``spark.sql`` users write ``extract_text(html)`` directly. Same
    bytes as the JVM column chain ``operators.extract.extract_text``
    (differentially tested); prefer ``extract_pages`` /
    ``extract_sketch_agg`` on the DataFrame side for pipelines."""
    from pyspark.sql.types import StringType

    from ..operators.extractkernel import extract_text_batch

    def ex(html: pd.Series) -> pd.Series:
        return pd.Series(
            extract_text_batch(html), index=html.index, dtype=object
        )

    return pandas_udf(ex, StringType())


def kll_quantile_udf(q: float):
    """sketch bytes -> quantile value."""

    def f(blobs: pd.Series) -> pd.Series:
        return blobs.map(lambda b: float(KllSketch.from_bytes(bytes(b)).quantile(q)))

    return pandas_udf(f, DoubleType())


def tdigest_quantile_udf(q: float):
    def f(blobs: pd.Series) -> pd.Series:
        return blobs.map(lambda b: float(TDigest.from_bytes(bytes(b)).quantile(q)))

    return pandas_udf(f, DoubleType())


def cms_query_udf(cms_bytes: bytes):
    """hashed item column -> estimated count, probing a broadcast CMS."""

    def f(hashed: pd.Series) -> pd.Series:
        cms = CountMinSketch.from_bytes(cms_bytes)
        return pd.Series(
            cms.query_hashed(hashed.to_numpy(np.int64)).astype(np.int64)
        )

    return pandas_udf(f, LongType())


def bloom_might_contain_udf(bloom_bytes: bytes):
    """hashed item column -> membership boolean against a broadcast Bloom."""
    from pyspark.sql.types import BooleanType

    def f(hashed: pd.Series) -> pd.Series:
        bf = BloomFilter.from_bytes(bloom_bytes)
        return pd.Series(bf.might_contain_hashed(hashed.to_numpy(np.int64)))

    return pandas_udf(f, BooleanType())


def theta_jaccard_udf():
    """Set Jaccard |A∩B| / |A∪B| straight from two theta sketches —
    the sketch-level analogue of the document-level MinHash estimate.

    Delegates to :func:`hll_spark.operators.sketches.theta_jaccard_udf`
    (the canonical implementation, whose denominator is the UNION
    sketch's estimate rather than inclusion-exclusion, so numerator
    and denominator ride the same common-theta sample in the
    estimation tier; identical in the exact tier)."""
    from ..operators.sketches import theta_jaccard_udf as _impl

    return _impl()


def register_sql_functions(spark) -> None:
    """Register the scalar sketch surface for ``spark.sql`` use, under
    the names postgresql-hll users know (README.md Usage section of
    citusdata/postgresql-hll): ``hll_cardinality``, ``hll_union``,
    ``hll_hash_text`` — plus this library's text helpers.

    Aggregation (building sketches from rows) intentionally stays on
    the DataFrame API (``hll_sketch_agg`` / ``hll_distinct``): PySpark
    cannot register a pandas UDAF for SQL, and the DataFrame scaffold
    is where the level-0 pre-combine lives. The scalar functions below
    cover the postgresql-hll-style *query* side: estimating, unioning
    and intersecting already-built sketch columns from SQL.
    """
    spark.udf.register("hll_cardinality", hll_estimate_udf())
    spark.udf.register("hll_union", hll_union_udf())
    spark.udf.register("hll_intersect", hll_intersect_udf())
    spark.udf.register("hll_hash_text", murmur3_64_udf())
    spark.udf.register("doc_fingerprint", fingerprint_udf())
    spark.udf.register("lang_id", lang_id_udf())
    spark.udf.register("extract_text", extract_text_udf())
    from ..operators.sketches import (
        theta_difference_udf,
        theta_estimate_udf,
        theta_intersect_udf,
    )

    spark.udf.register("theta_cardinality", theta_estimate_udf())
    spark.udf.register("theta_intersect", theta_intersect_udf())
    spark.udf.register("theta_difference", theta_difference_udf())
    spark.udf.register("theta_jaccard", theta_jaccard_udf())


__all__ = [
    "murmur3_64_udf",
    "hll_estimate_udf",
    "hll_union_udf",
    "hll_intersect_udf",
    "kll_quantile_udf",
    "tdigest_quantile_udf",
    "cms_query_udf",
    "bloom_might_contain_udf",
    "lang_id_udf",
    "fingerprint_udf",
    "register_sql_functions",
    "theta_jaccard_udf",
]
