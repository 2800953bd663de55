"""Privacy operators for sharing/joining web-scale tables safely.

Training-data pipelines constantly hand tables across trust
boundaries (vendor dedup lists, eval providers, cross-team joins).
Two primitives cover the everyday needs:

- :func:`pseudonymize` — deterministic keyed hashing of identifier
  columns: sha256(secret || value) truncated to a hex token. The same
  (secret, value) maps to the same token everywhere, so joins and
  groupBys still work across pseudonymized tables, but without the
  secret the mapping is one-way. Pure JVM builtins (sha2/concat), so
  it rides whole-stage codegen at any scale. This is pseudonymization
  (GDPR art. 4(5)) — reversible by whoever holds the secret via
  re-hashing a candidate set — NOT anonymization.
- :func:`k_anonymity_report` — the measurement that decides whether a
  quasi-identifier combination is safe to release: group sizes over
  the combo, the count of groups below k, and the row mass at risk.
  One map-side-combined hash aggregate; only group rows shuffle.

Composition: run ``k_anonymity_report`` on the quasi-identifiers, and
``pseudonymize`` the direct identifiers — the standard release recipe.
The scrubbing side (emails/IPs inside free text) is
``operators/text.scrub_pii``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pseudonymize(
    df: DataFrame,
    cols: list[str],
    secret: str,
    token_len: int = 16,
) -> DataFrame:
    """Replace each column in ``cols`` with a deterministic keyed
    token: the first ``token_len`` hex chars of
    sha256(secret || ':' || col || ':' || value).

    Salting with the column NAME too means the same value in two
    different columns gets two unrelated tokens (linkage only where
    intended). NULLs stay NULL (they carry no identity). token_len 16
    = 64 bits: collision odds ~n^2/2^65 — negligible below ~10^8
    distinct values per column; raise it for bigger key spaces.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    if not 8 <= token_len <= 64:
        raise ValueError("token_len must be in [8, 64]")
    out = df
    for c in cols:
        tok = F.substring(
            F.sha2(
                F.concat(
                    F.lit(secret),
                    F.lit(":" + c + ":"),
                    F.col(c).cast("string"),
                ),
                256,
            ),
            1,
            token_len,
        )
        out = out.withColumn(
            c, F.when(F.col(c).isNull(), F.lit(None)).otherwise(tok)
        )
    return out


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """One row: is the quasi-identifier combination k-anonymous, and
    how far off — (n_rows, n_groups, n_groups_below_k, rows_below_k,
    min_group_size, is_k_anonymous).

    NULL quasi-identifier values form their own groups (SQL GROUP BY
    semantics — a NULL zip code is itself a distinguishing fact).
    """
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    groups = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("__n"))
    return groups.agg(
        F.sum("__n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum((F.col("__n") < k).cast("long")).alias("n_groups_below_k"),
        F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(0))
        .cast("long")
        .alias("rows_below_k"),
        F.min("__n").cast("long").alias("min_group_size"),
        (F.min("__n") >= k).alias("is_k_anonymous"),
    )


def small_groups(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """The offending quasi-identifier combinations themselves:
    (*quasi_cols, n) for groups smaller than k — what you generalize
    or suppress before release."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") < k)
    )
