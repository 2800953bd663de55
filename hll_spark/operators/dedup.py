"""Deduplication operators for web-scale training-data pipelines.

Five dedup families, each designed around Spark's shuffle model:

- exact: hash-groupBy on a content digest — one shuffle of (digest, id),
  fully JVM-side.
- MinHash + LSH: shingle -> k minhashes -> b bands; candidate pairs come
  from a self-join on (band_id, band_hash) buckets — the classic
  sub-quadratic near-dup join. Signatures are numpy-vectorized per Arrow
  batch; the only shuffle is on band buckets, whose size is bounded by
  banding, not by n^2.
- SimHash: 64-bit weighted token hash; near-dups = small Hamming
  distance; banded into 4x16-bit chunks so candidates again come from an
  equality self-join (any pair within Hamming<=3 shares at least one of
  4 chunks by pigeonhole).
- n-gram Jaccard verify: exact similarity on candidate pairs only.
- embedding cosine: near-dup by vector similarity (see similarity.py for
  the ANN machinery; here used for pair filtering).

At 100 TB the load-bearing properties are: signatures are built in one
mapInPandas pass (no per-row Python), candidate generation shuffles only
(bucket_key, doc_id) pairs, and verification touches candidate pairs
only — never the n^2 cross join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType, LongType

from ..sketchlib.hashing import murmur3_finalizer_u64, murmur3_x64_128_low64

# ---------------------------------------------------------------------------
# exact dedup (JVM-only)


def exact_dedup(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Keep one row (the min id) per distinct combination of ``cols``.

    Pure built-ins: digest + groupBy + semi-join; Catalyst plans a
    partial/final hash aggregate (map-side combine) on the digest.
    """
    digest = F.sha2(F.concat_ws("", *[F.col(c) for c in cols]), 256)
    keep = (
        df.withColumn("__d", digest)
        .groupBy("__d")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def duplicate_groups(df: DataFrame, cols: list[str], id_col: str) -> DataFrame:
    """Groups with >1 identical rows: (digest, n_dupes, keeper_id)."""
    digest = F.sha2(F.concat_ws("", *[F.col(c) for c in cols]), 256)
    return (
        df.withColumn("digest", digest)
        .groupBy("digest")
        .agg(
            F.count("*").alias("n_dupes"),
            F.min(id_col).alias("keeper_id"),
        )
        .where(F.col("n_dupes") > 1)
    )


# ---------------------------------------------------------------------------
# shingling + MinHash signatures (vectorized)


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """uint64 hashes of word n-gram shingles."""
    toks = text.split()
    if not toks:
        return np.zeros(0, dtype=np.uint64)
    if len(toks) < n:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return murmur3_x64_128_low64(pd.Series(grams))


_SEED_MIX = np.uint64(0x9E3779B97F4A7C15)


def _minhash_signature(shingles: np.ndarray, k: int) -> np.ndarray:
    """k minhash values via k xor-finalizer permutations (vectorized:
    one (k, n_shingles) matrix min-reduce, no Python loop over shingles)."""
    if shingles.size == 0:
        return np.full(k, np.iinfo(np.uint64).max, dtype=np.uint64)
    seeds = (np.arange(1, k + 1, dtype=np.uint64) * _SEED_MIX)[:, None]
    perms = murmur3_finalizer_u64(
        (shingles[None, :] ^ seeds).reshape(-1)
    ).reshape(k, -1)
    return perms.min(axis=1)


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 128,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, signature array<long>) — one mapInPandas pass."""

    def sig_batch(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                _minhash_signature(_shingle_hashes(t or "", shingle_n), k)
                .view(np.int64)
                .tolist()
                for t in texts
            ],
            index=texts.index,
        )

    sig_udf = pandas_udf(sig_batch, ArrayType(LongType()))
    return df.select(F.col(id_col), sig_udf(F.col(text_col)).alias("signature"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    k: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-duplicate pairs with estimated Jaccard >= threshold.

    Plan: signatures -> explode to (band_id, band_hash, id) -> self-join
    on the banded bucket -> distinct candidate pairs -> estimate Jaccard
    as matching-minhash fraction. Output: (id_a, id_b, jaccard_est) with
    id_a < id_b. The banding (b=32, r=4 by default) makes the candidate
    probability at s=threshold ~ 1-(1-s^r)^b ≈ 1 while keeping buckets
    sub-quadratic.
    """
    if k % bands:
        raise ValueError("k must be divisible by bands")
    r = k // bands
    sigs = minhash_signatures(df, text_col, id_col, k, shingle_n).cache()

    def band_hash_batch(sig: pd.Series) -> pd.Series:
        out = []
        for s in sig:
            arr = np.asarray(s, dtype=np.int64).view(np.uint64).reshape(bands, r)
            # hash each band's r values into one 64-bit bucket key
            acc = np.zeros(bands, dtype=np.uint64)
            for i in range(r):
                acc = murmur3_finalizer_u64(acc ^ arr[:, i])
            out.append(acc.view(np.int64).tolist())
        return pd.Series(out, index=sig.index)

    bands_udf = pandas_udf(band_hash_batch, ArrayType(LongType()))
    banded = sigs.select(
        F.col(id_col),
        F.posexplode(bands_udf(F.col("signature"))).alias("band_id", "band_hash"),
    )
    left = banded.alias("a")
    right = banded.alias("b")
    candidates = (
        left.join(
            right,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    sig_a = sigs.select(
        F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a")
    )
    sig_b = sigs.select(
        F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b")
    )

    @pandas_udf(DoubleType())
    def jaccard_est(sa: pd.Series, sb: pd.Series) -> pd.Series:
        return pd.Series(
            [
                float(
                    (np.asarray(x, dtype=np.int64) == np.asarray(y, dtype=np.int64)).mean()
                )
                for x, y in zip(sa, sb)
            ]
        )

    return (
        candidates.join(sig_a, "id_a")
        .join(sig_b, "id_b")
        .withColumn("jaccard_est", jaccard_est(F.col("sig_a"), F.col("sig_b")))
        .where(F.col("jaccard_est") >= threshold)
        .select("id_a", "id_b", "jaccard_est")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    shingle_n: int = 3,
) -> DataFrame:
    """EXACT n-gram Jaccard near-dup pairs via shingle inverted index.

    Plan: explode distinct shingle hashes -> self-join on shingle ->
    count common shingles per pair -> Jaccard = common/(|A|+|B|-common).
    Exact (oracle-checkable) but quadratic in per-shingle bucket sizes;
    the MinHash path above is the at-scale variant.
    """

    def shingles_batch(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                np.unique(_shingle_hashes(t or "", shingle_n))
                .view(np.int64)
                .tolist()
                for t in texts
            ],
            index=texts.index,
        )

    sh_udf = pandas_udf(shingles_batch, ArrayType(LongType()))
    sh = df.select(F.col(id_col), sh_udf(F.col(text_col)).alias("sh"))
    sizes = sh.select(F.col(id_col), F.size("sh").alias("n_sh"))
    exploded = sh.select(F.col(id_col), F.explode("sh").alias("shingle"))
    a, b = exploded.alias("a"), exploded.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common.join(
            sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("na")),
            "id_a",
        )
        .join(
            sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("nb")),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash


def _simhash_batch(texts: pd.Series) -> pd.Series:
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = (t or "").split()
        if not toks:
            continue
        h = murmur3_x64_128_low64(pd.Series(toks))
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
            np.int64
        )
        acc = (2 * bits - 1).sum(axis=0)  # +1/-1 votes per bit position
        val = 0
        for bpos in np.nonzero(acc > 0)[0].tolist():
            val |= 1 << bpos
        out[i] = val - (1 << 64) if val >= (1 << 63) else val
    return pd.Series(out, index=texts.index)


def simhash_udf():
    return pandas_udf(_simhash_batch, LongType())


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) <= max_hamming.

    Banding: split the 64-bit hash into ``max_hamming + 1`` chunks; by
    pigeonhole any pair within the Hamming budget agrees on >= 1 chunk,
    so candidates come from an equality self-join per chunk — never a
    cross join.
    """
    n_chunks = max_hamming + 1
    base_w = 64 // n_chunks
    widths = [base_w + (1 if i < 64 % n_chunks else 0) for i in range(n_chunks)]
    offsets = [sum(widths[:i]) for i in range(n_chunks)]
    hashed = df.select(
        F.col(id_col), simhash_udf()(F.col(text_col)).alias("simhash")
    ).cache()
    chunks = hashed.select(
        id_col,
        "simhash",
        F.posexplode(
            F.array(
                *[
                    (F.shiftrightunsigned(F.col("simhash"), off)).bitwiseAND(
                        F.lit((1 << w) - 1)
                    )
                    for off, w in zip(offsets, widths)
                ]
            )
        ).alias("chunk_id", "chunk"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col("a.simhash").alias("sh_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        cand.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup


def embedding_dup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """Pairs with cosine(vec_a, vec_b) >= threshold.

    Exact variant (JVM-side arithmetic via F.aggregate/zip_with over the
    normalized vectors after a range self-join). At scale, pre-bucket
    with the LSH projections in similarity.py; here correctness-first.
    """
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x))
    unit = df.select(
        F.col(id_col),
        F.transform(vec_col, lambda x: x / norm).alias("unit"),
    )
    a, b = unit.alias("a"), unit.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.unit"), F.col("b.unit"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .withColumn("cosine", F.round(dot, 6))
        .where(F.col("cosine") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "cosine",
        )
    )
