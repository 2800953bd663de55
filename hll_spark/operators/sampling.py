"""Deterministic corpus sampling: portable hash sampling and
temperature-based domain-mixture resampling.

Training-data pipelines sample twice: once to cut a reproducible
corpus subset (the "keep 10% of users, with ALL their rows" shape),
and once to rebalance the domain mixture (upweight rare languages /
sources, downweight the head — the temperature-sampling recipe used
by multilingual pretraining: p(domain) ∝ count(domain)^alpha, alpha
in [0, 1]).

Both operators here decide membership from an md5-hex prefix of the
row KEY, never from Spark's RNG, so the sample is

* a pure function of the key — reproducible across runs, partition
  layouts, and cluster sizes;
* consistent across tables — sampling users here and events by the
  same key there keeps complete per-user histories;
* portable — md5 of a UTF-8 string is engine-independent, so any
  other SQL engine (the DuckDB oracle included) reproduces the exact
  row set, unlike ``xxhash64``, which only Spark exposes
  (relational.consistent_sample keeps the faster xxhash64 variant for
  Spark-only callers).

The membership test compares the first 15 hex chars of
``md5(key || ':' || seed)`` against ``floor(rate * 2^60)`` rendered
as a zero-padded 15-char hex literal: lexicographic order on
fixed-width lowercase hex equals numeric order, so the comparison is
a pure string predicate that every engine evaluates identically (no
engine-specific hex→int casts needed). 60 bits of the digest give a
rate granularity of 2^-60 — far below any sampling tolerance.

100 TB design: the membership predicate is a JVM-side expression
chain (md5 + substring + comparison, whole-stage codegen) — a
parallel filter scan with no shuffle. temperature_resample adds one
tiny aggregation (one row per domain; partial aggregation makes the
shuffle KB-sized regardless of corpus size) whose result is
broadcast back, so the big table is still touched by exactly one
scan + filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 2^60 as an exact double (60 < 53 bits is false, but 2^60 itself is a
# power of two, hence exactly representable)
_SCALE = float(1 << 60)


def _hex_threshold(rate):
    """``floor(rate * 2^60)`` as a 15-char lowercase hex string column.

    Valid for rate < 1 (floor then fits in 15 hex digits); callers
    must short-circuit rate >= 1 separately.
    """
    return F.lower(
        F.lpad(F.hex(F.floor(rate * F.lit(_SCALE))), 15, "0")
    )


def _key_hex(key_col: str, seed: int):
    """First 15 hex chars of md5(key || ':' || seed), lowercase."""
    tagged = F.concat(
        F.col(key_col).cast("string"), F.lit(f":{seed}")
    )
    return F.substring(F.md5(tagged.cast("binary")), 1, 15)


def consistent_sample_portable(
    df: DataFrame,
    key_col: str,
    fraction: float,
    seed: int = 42,
) -> DataFrame:
    """Keep a row iff ``md5(key:seed)`` lands under ``fraction``.

    Same contract as relational.consistent_sample (deterministic,
    key-consistent across tables) but engine-portable: any SQL engine
    with md5 reproduces the identical row set, which is what makes
    the sample auditable outside Spark.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    if fraction >= 1.0:
        return df
    return df.where(_key_hex(key_col, seed) < _hex_threshold(F.lit(fraction)))


def temperature_resample(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    alpha: float = 0.5,
    target_frac: float = 0.5,
    seed: int = 0,
) -> DataFrame:
    """Resample ``df`` so domain d's share of the output follows
    ``count(d)^alpha`` (normalized), at overall rate ``target_frac``.

    alpha=1 reproduces the input mixture (every domain sampled at
    target_frac); alpha=0 aims at a uniform mixture (equal expected
    rows per domain); 0<alpha<1 interpolates — the standard
    temperature-sampling recipe for flattening a skewed language /
    source distribution. Per-domain keep rates are capped at 1 (this
    operator never upsamples), so tail domains whose implied rate
    exceeds 1 are kept whole and the realized total can undershoot
    target_frac — by design, matching the usual "cap, don't
    replicate" pretraining practice.

    Returns the input rows that survive, with two extra columns:
    ``sample_rate`` (the domain's keep rate, rounded to 1e-6 so the
    float is reproducible across engines/summation orders) and the
    domain count ``domain_rows``.

    Plan shape: groupBy(domain) → one tiny rates frame (window over
    the handful of domain rows) → broadcast hash join back → JVM
    filter. The corpus is scanned once; nothing but per-domain counts
    ever moves.
    """
    if not 0.0 <= target_frac <= 1.0:
        raise ValueError("target_frac must be in [0, 1]")
    if alpha < 0.0:
        raise ValueError("alpha must be >= 0")
    counts = df.groupBy(domain_col).agg(F.count("*").alias("domain_rows"))
    w = Window.partitionBy()  # the rates frame is one row per domain
    weight = F.pow(F.col("domain_rows").cast("double"), F.lit(float(alpha)))
    implied = (
        F.lit(float(target_frac))
        * F.sum("domain_rows").over(w).cast("double")
        * weight
        / (F.sum(weight).over(w) * F.col("domain_rows"))
    )
    rates = counts.select(
        domain_col,
        "domain_rows",
        F.round(F.least(F.lit(1.0), implied), 6).alias("sample_rate"),
    )
    keyed = df.join(F.broadcast(rates), domain_col)
    keep = (F.col("sample_rate") >= 1.0) | (
        _key_hex(key_col, seed) < _hex_threshold(F.col("sample_rate"))
    )
    return keyed.where(keep)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col,
    k: int,
    seed: int = 42,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-Res): draw exactly ``k`` rows where row i's
    inclusion odds follow weight w_i, by ranking every row on
    ``u_i ** (1/w_i)`` (u_i a per-key uniform) and keeping the top k.
    The classic use here is mixture-weighted corpus subsetting: weight
    by token count (sample "k documents proportional to length") or by
    an upstream quality score, and get the same k rows on every rerun,
    every partition layout, and every engine.

    Determinism/portability: u_i is NOT Spark RNG — it is
    ``(int(md5(key:seed)[:15 hex]) + 1) / 2^60``, a pure function of
    the row key, so the kept set is reproducible anywhere md5 exists
    (the DuckDB oracle recomputes it bit-for-bit: the +1 happens in
    int64, the /2^60 is a power-of-two scale, and both engines round
    the same 60-bit integer to the same double). ``pow`` is the one
    libm call; ranks are decided at ~1/n-sized gaps, ~13 orders of
    magnitude above its last-ulp engine variance.

    Rows with NULL or non-positive weight are dropped (a zero-weight
    row can never be sampled; negative weights are a caller bug —
    excluded rather than silently reordered).

    Returns (key, weight, sample_rank) with sample_rank 1..k in
    descending-ES-key order, key ascending as the (measure-zero)
    tie-break.

    100 TB design: the ES key is a whole-stage-codegen expression
    chain (md5 + conv + pow — no Python), and ``orderBy(...).limit(k)``
    compiles to TakeOrderedAndProject: each partition keeps its local
    top-k heap and only P*k candidate rows ever leave the executors —
    no global sort, no full shuffle, identical result at any
    parallelism. The final rank window runs on k rows.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = (
        weight_col
        if not isinstance(weight_col, str)
        else F.col(weight_col)
    ).cast("double")
    # 60-bit uniform in (0, 1]: +1 in INT64 (2^60 + 1 is exact there;
    # adding 1 after the double conversion would be absorbed), then
    # one exact power-of-two division
    u = (
        (F.conv(_key_hex(key_col, seed), 16, 10).cast("long") + 1).cast(
            "double"
        )
        / F.lit(_SCALE)
    )
    keyed = (
        df.where(w.isNotNull() & (w > 0))
        .select(
            F.col(key_col),
            w.alias("weight"),
            F.pow(u, F.lit(1.0) / w).alias("__es_key"),
        )
    )
    top = keyed.orderBy(
        F.desc("__es_key"), F.col(key_col).asc()
    ).limit(k)
    rank_w = Window.orderBy(F.desc("__es_key"), F.col(key_col).asc())
    return top.select(
        key_col,
        "weight",
        F.row_number().over(rank_w).cast("long").alias("sample_rank"),
    )


def stratified_split(
    df: DataFrame,
    strata_cols: list[str],
    splits: list[tuple[str, float]] | None = None,
    key_col: str = "doc_id",
    seed: int = 42,
    exact: bool = True,
) -> DataFrame:
    """Deterministic stratified train/val/test split: assign every row
    a ``split`` label such that each stratum (the distinct value
    combination of ``strata_cols``) is divided in the requested
    proportions. ``splits`` is an ordered list of (name, fraction)
    summing to 1 (default ``[("train", .8), ("val", .1), ("test",
    .1)]``). Assignment is a pure function of ``(key, seed)`` — the
    same row lands in the same split on every rerun, partition layout,
    cluster size, and engine (md5, like everything in this module).

    Two modes:

    * ``exact=True`` — per-stratum counts are EXACT: rows rank within
      their stratum by the portable md5 uniform (key ascending as the
      tie-break for duplicate keys) and split i takes ranks in
      ``(floor(cum_{i-1} * n_s), floor(cum_i * n_s)]`` — the standard
      cumulative-floor allocation, so counts per stratum differ from
      ``frac * n_s`` by less than 1. Costs one window sort per
      stratum: the right mode for bounded strata (languages, domains,
      benchmark cells).
    * ``exact=False`` — a pure codegen'd filter predicate on the md5
      hex (zero shuffle, one scan): proportions hold in expectation
      only (Binomial(n_s, frac) noise). The right mode when the
      stratum count or size is unbounded and the split runs inside a
      10^12-row scan.

    Returns the input columns plus ``split`` (string).
    """
    if not strata_cols:
        raise ValueError(
            "strata_cols must be non-empty (an empty partitionBy would "
            "silently become one global window); for an unstratified "
            "split pass a constant stratum column"
        )
    if splits is None:
        splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    if len(splits) < 2:
        raise ValueError("need at least 2 splits")
    names = [s[0] for s in splits]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate split names: {names}")
    fracs = [float(s[1]) for s in splits]
    if any(f <= 0 for f in fracs) or abs(sum(fracs) - 1.0) > 1e-9:
        raise ValueError(f"fractions must be > 0 and sum to 1, got {fracs}")
    cums = []
    acc = 0.0
    for f in fracs:
        acc += f
        cums.append(acc)
    cums[-1] = 1.0  # force exact coverage of the last bucket
    u = _key_hex(key_col, seed)

    if exact:
        w_rank = Window.partitionBy(*strata_cols).orderBy(
            u.asc(), F.col(key_col).asc()
        )
        w_all = Window.partitionBy(*strata_cols)
        rn = F.row_number().over(w_rank)
        n_s = F.count("*").over(w_all)
        expr = None
        for name, c in zip(names[:-1], cums[:-1]):
            cond = rn <= F.floor(F.lit(c) * n_s)
            expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        split_col = expr.otherwise(names[-1])
    else:
        expr = None
        for name, c in zip(names[:-1], cums[:-1]):
            cond = u < _hex_threshold(F.lit(c))
            expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        split_col = expr.otherwise(names[-1])
    return df.withColumn("split", split_col)
