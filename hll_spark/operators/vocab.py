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

import pandas as pd
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


def _bpe_merge_loop(
    forms: list[str],
    counts: list[int],
    n_merges: int,
    min_pair_count: int = 2,
) -> list[tuple[int, str, str, int]]:
    """The Sennrich et al. (2016) merge loop over a bounded
    (word form, count) table: repeatedly merge the most frequent
    adjacent symbol pair (ties broken by lexicographically smallest
    pair, so the sequence is fully deterministic). Incremental
    pair-count maintenance via a pair -> form-ids index: each round
    touches only the forms that contain the merged pair."""
    seqs: list[tuple[str, ...]] = [tuple(f) for f in forms]
    pair_counts: dict[tuple[str, str], int] = {}
    pair_forms: dict[tuple[str, str], set[int]] = {}
    for i, (s, c) in enumerate(zip(seqs, counts)):
        for p in zip(s, s[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            pair_forms.setdefault(p, set()).add(i)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        if not pair_counts:
            break
        (a, b), cnt = min(
            pair_counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < min_pair_count:
            break
        merges.append((rank, a, b, cnt))
        new_sym = a + b
        # pair_forms may hold stale ids (form no longer contains the
        # pair after earlier merges): removing then re-adding that
        # form's CURRENT pairs is a net no-op, so staleness is benign
        for i in list(pair_forms.get((a, b), ())):
            s, c = seqs[i], counts[i]
            for p in zip(s, s[1:]):
                left = pair_counts.get(p, 0) - c
                if left > 0:
                    pair_counts[p] = left
                else:
                    pair_counts.pop(p, None)
            out: list[str] = []
            j = 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                    out.append(new_sym)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            s2 = tuple(out)
            seqs[i] = s2
            for p in zip(s2, s2[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + c
                pair_forms.setdefault(p, set()).add(i)
        pair_forms.pop((a, b), None)
        pair_counts.pop((a, b), None)
    return merges


def bpe_learn(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 50,
    max_word_forms: int = 1_000_000,
    min_pair_count: int = 2,
) -> DataFrame:
    """Learn BPE merge rules from a corpus. Returns a DataFrame
    (rank, left, right, pair_count) with rank 1..n_merges in merge
    order — deterministic: most-frequent pair first, ties broken by
    the lexicographically smallest (left, right).

    Distributed shape (this is an ITERATIVE algorithm, so the design
    splits corpus-sized work from loop work): the only corpus-sized
    pass is the pre-token frequency aggregate — one explode + one hash
    aggregate with map-side combine. The merge loop then runs over the
    (form, count) table CAPPED to the top ``max_word_forms`` forms by
    frequency (TakeOrderedAndProject; ties broken form-ascending so
    the cap is deterministic) — the standard BPE-trainer move, since
    the frequency tail contributes negligibly to pair counts. The
    capped table is bounded (<= max_word_forms rows) by construction,
    so collecting it is a bounded collect, and the loop runs
    driver-side with incremental pair-count maintenance — at any
    corpus scale the loop cost depends on the CAP, not the corpus.

    Stops early when no pair reaches ``min_pair_count``.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if max_word_forms < 1:
        raise ValueError(
            f"max_word_forms must be >= 1, got {max_word_forms}"
        )
    spark = df.sparkSession
    capped = (
        df.select(F.explode(pretokenize(text_col)).alias("form"))
        .groupBy("form")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("form"))
        .limit(max_word_forms)
        .toPandas()
    )
    merges = _bpe_merge_loop(
        capped["form"].tolist(),
        [int(x) for x in capped["n"]],
        n_merges,
        min_pair_count,
    )
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("rank", IntegerType(), False),
            StructField("left", StringType(), False),
            StructField("right", StringType(), False),
            StructField("pair_count", LongType(), False),
        ]
    )
    from ..localdf import fast_local_df

    return fast_local_df(spark, merges, schema)


def _bpe_encode_word(word: str, ranks: dict) -> list[str]:
    """Apply merge rules to one word: repeatedly merge the
    present pair with the LOWEST rank (the standard BPE inference
    rule — merge order, not corpus frequency, decides)."""
    syms = list(word)
    while len(syms) >= 2:
        best = None
        best_rank = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best, best_rank = p, r
        if best is None:
            break
        a, b = best
        out = []
        j = 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    merges: DataFrame | list,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize a corpus with learned BPE merges. Returns
    (id, n_pretokens, n_bpe_tokens) per document.

    ``merges`` is the output of :func:`bpe_learn` (or an equivalent
    list of (rank, left, right, ...) rows). The merge table is tiny
    (one row per merge) — it broadcasts as a plain dict. Encoding runs
    as an Arrow-batched pandas UDF over the JVM-side pre-token arrays,
    with a per-batch word cache: web text repeats word forms heavily
    (Zipf), so the cache turns per-token work into per-DISTINCT-form
    work within each batch.
    """
    if isinstance(merges, DataFrame):
        merge_rows = [
            (r["rank"], r["left"], r["right"]) for r in merges.collect()
        ]
    else:
        merge_rows = [(r[0], r[1], r[2]) for r in merges]
    ranks = {(l, r): rank for rank, l, r in merge_rows}
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(ranks)

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def n_bpe_tokens(words: pd.Series) -> pd.Series:
        rk = bc.value
        cache: dict[str, int] = {}

        def doc_tokens(ws) -> int:
            total = 0
            for w in ws:
                n = cache.get(w)
                if n is None:
                    n = len(_bpe_encode_word(w, rk))
                    cache[w] = n
                total += n
            return total

        return words.map(doc_tokens)

    toks = pretokenize(text_col)
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_pretokens"),
        n_bpe_tokens(toks).alias("n_bpe_tokens"),
    )


def bm25_retrieve(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    qid_col: str = "query_id",
    qtext_col: str = "qtext",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents per query under BM25 — the query→document
    retrieval primitive (targeted curation, retrieval-based
    decontamination triage, RAG index audits).

    Terms are whitespace tokens on BOTH sides (the corpus convention
    shared by the dedup/decontamination family; case-folding, if
    wanted, is the caller's normalization step — see
    ``normalize_unicode``). Per distinct query term t in document d::

        idf(t)  = ((N - df_t) + 0.5) / (df_t + 0.5)        # log-free
        tfn(t,d)= (tf * (k1+1)) / (tf + k1*((1-b) + b*(dl/avgdl)))
        score(q,d) = sum_t floor(idf * tfn * 1e9)          # BIGINT

    The classic BM25 idf is ``ln(idf + 1)``; the log-free form keeps
    every per-term score a chain of correctly-rounded IEEE ops over
    EXACT integer inputs (tf, dl, df, N), so the quantized per-term
    BIGINT is bit-identical across engines, and the per-(query, doc)
    sum — BIGINT addition — is order-independent: the result is
    hash-comparable against a SQL oracle despite Spark's
    nondeterministic aggregation order. Ranking is unchanged for any
    monotone idf transform at single-term queries and near-identical
    otherwise; swap in ``log`` for the textbook weighting (the plan
    below is unchanged, only the cross-engine bit-exactness argument
    needs the log-free form).

    Returns (qid, id, score_e9, rank), rank 1..k per query, ordered by
    (score_e9 desc, id asc) — fully deterministic.

    100 TB design: the corpus-sized work is ONE scan. Exploded tokens
    are pruned by a broadcast hash join against the distinct query
    vocabulary BEFORE any shuffle, so the tf aggregate's input is
    bounded by query-term occurrences, not corpus tokens; df comes
    from a second aggregate over the (already distinct) tf table;
    corpus stats (N, sum dl) ride a deliberately-ONE-ROW broadcast
    crossJoin (the tfidf_top_terms idiom — a 1-row nested loop IS the
    correct plan); the final top-k window partitions by query over
    scored pairs only. The query table is assumed small (it
    broadcasts).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if k1 <= 0 or not 0 <= b <= 1:
        raise ValueError(f"need k1 > 0 and 0 <= b <= 1, got {k1}, {b}")
    for c, frame, who in (
        (text_col, docs, "docs"),
        (id_col, docs, "docs"),
        (qid_col, queries, "queries"),
        (qtext_col, queries, "queries"),
    ):
        if c not in frame.columns:
            raise ValueError(f"unknown column {c!r} on {who}")

    def toks(col):
        c = F.trim(F.col(col))
        return F.when(
            c.isNull() | (F.length(c) == 0),
            F.array().cast("array<string>"),
        ).otherwise(F.split(c, r"\s+"))

    qterms = queries.select(
        F.col(qid_col),
        F.explode(F.array_distinct(toks(qtext_col))).alias("term"),
    )
    qvocab = qterms.select("term").distinct()

    base = docs.select(F.col(id_col), toks(text_col).alias("__toks"))
    stats = base.agg(
        F.count("*").alias("__n"),
        F.sum(F.size("__toks")).alias("__sdl"),
    )

    posting = (
        base.select(
            id_col,
            F.size("__toks").alias("__dl"),
            F.explode("__toks").alias("term"),
        )
        .join(F.broadcast(qvocab), "term")  # row-local vocab prune
        .groupBy(id_col, "__dl", "term")
        .agg(F.count("*").alias("__tf"))
    )
    dfreq = posting.groupBy("term").agg(F.count("*").alias("__df"))

    # every constant below is written identically in the SQL oracle;
    # expression trees must stay aligned for bit-exact parity
    avgdl = F.col("__sdl") / F.col("__n")
    idf = ((F.col("__n") - F.col("__df")) + F.lit(0.5)) / (
        F.col("__df") + F.lit(0.5)
    )
    tfn = (F.col("__tf") * F.lit(k1 + 1.0)) / (
        F.col("__tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * (F.col("__dl") / avgdl))
    )
    scored_terms = (
        posting.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            "term",
            F.floor(idf * tfn * F.lit(1000000000.0)).alias("__s"),
        )
    )
    per_qd = (
        scored_terms.join(F.broadcast(qterms), "term")
        .groupBy(qid_col, id_col)
        .agg(F.sum("__s").alias("score_e9"))
    )
    w = Window.partitionBy(qid_col).orderBy(
        F.desc("score_e9"), F.asc(id_col)
    )
    return (
        per_qd.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
