"""Vocabulary / term-statistics operators: corpus vocabularies, TF-IDF
term ranking, and a distributed BPE merge learner.

A training-data pipeline reads its corpus's vocabulary three ways:

* :func:`top_vocab` — the corpus-wide token frequency table (the input
  to tokenizer training and to coverage audits), built with a BPE-ish
  RE2-compatible pre-tokenizer regex so the same split reproduces in
  any engine;
* :func:`tfidf_top_terms` — per-document salient terms (the classic
  tf-idf ranking), used for topic audits and near-dup triage;
* :func:`bpe_learn` — byte-pair-encoding merge rules learned with a
  distributed word-count pass + a bounded merge loop.

100 TB design notes: every operator's corpus-sized pass is one
explode + one hash aggregate with map-side combine (token/term keys —
Zipf-skewed, but partial aggregation absorbs the head before the
shuffle); rankings use per-partition top-k heaps
(TakeOrderedAndProject) or per-doc windows whose partitions are
individual documents, never a global sort of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer (GPT-2 style, RE2-compatible subset: no
# lookahead, so Spark's java.util.regex and DuckDB's RE2 split
# identically): a token is a letter run, a digit run, or a
# non-space-symbol run, each with an optional single leading space.
PRETOKEN_RE = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def pretokenize(col) -> F.Column:
    """Array of BPE-ish pre-tokens (leading-space convention kept, as
    BPE trainers do) — a codegen'd ``regexp_extract_all``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(PRETOKEN_RE), 0)


def top_vocab(
    df: DataFrame,
    text_col: str = "text",
    k: int = 100,
) -> DataFrame:
    """Corpus-wide top-``k`` pre-tokens by frequency.

    Returns (token, n_occurrences, rank), rank 1..k, ties broken by
    token ascending so the cut is deterministic.

    Plan: explode the pre-token arrays, ONE hash aggregate on token
    (map-side combine bounds the shuffle by the distinct vocabulary,
    not the corpus), then ``orderBy(...).limit(k)`` — Spark plans that
    as TakeOrderedAndProject: per-partition top-k heaps + a k-row
    reduce, never a global sort.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    counts = (
        df.select(F.explode(pretokenize(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
    # the row_number window runs over k rows only (post-limit), so the
    # single-partition window is bounded by k, not the corpus
    return counts.select(
        "token",
        "n_occurrences",
        F.row_number().over(w).alias("rank"),
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` terms per document by tf-idf.

    Terms are whitespace tokens (the corpus convention shared by the
    dedup/decontamination family). Score = ``tf * (N / df)`` — the
    log-free idf variant, chosen so the score is a product/quotient of
    integers: IEEE division and multiplication are correctly rounded,
    hence BIT-IDENTICAL across engines and the DuckDB oracle can
    compare values exactly (swap ``N/df`` for ``ln(N/df)`` for the
    classic weighting — every plan shape below is unchanged; only the
    cross-engine bit-exactness argument needs the log-free form).

    Returns (id, term, tf, df, score, rank) with rank 1..k per doc,
    ordered by (score desc, term asc) — fully deterministic.

    Plan: one explode + groupBy(id, term) for tf [shuffle 1]; document
    frequency as a second aggregate OVER THE TF TABLE (its rows are
    already distinct (id, term) pairs, so no second corpus scan)
    [shuffle 2, vocabulary-sized]; N from a 1-row count frame
    cross-joined in (broadcast, no collect); the final per-doc top-k
    window partitions by id [shuffle 3] — each window partition is one
    document's term list, never the corpus.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    terms = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), " +")).alias("term"),
    ).where(F.col("term") != "")
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = df.select(F.count("*").alias("__n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            "tf",
            "df",
            (F.col("tf") * (F.col("__n_docs") / F.col("df"))).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
