"""Crawl-ledger operators: recrawl dedup, domain blocklists, per-host
quotas.

A Common-Crawl-style ingest (BASELINE.json input_hint: one row per
fetched page, keyed by ``url`` with a ``warc_ts`` fetch timestamp)
needs three front-end decisions before any text ever reaches the
quality/dedup stack, and all three are ledger operations on the (url,
host) keys rather than on content:

* **recrawl dedup** — the same URL appears once per crawl snapshot;
  training corpora keep exactly one fetch per URL (normally the
  newest).  `latest_crawl`.
* **domain blocklists** — spam/adult/SEO domain lists (the UT1 /
  Blacklists-UT-Capitole shape used by CCNet, RefinedWeb and FineWeb)
  remove whole registrable domains INCLUDING their subdomains, i.e.
  blocking ``example.com`` must drop ``a.b.example.com``.
  `domain_blocklist_filter` / `host_suffixes`.
* **per-host quotas** — cap how many documents any single host may
  contribute, so link farms and mirror hosts cannot dominate the
  mixture.  `cap_per_key`.

The reference repo (l0vest0rm/hll) has no web layer at all — these
operators exist for the north rule's Common-Crawl table, not for
reference parity, and follow the same design rules as the rest of the
repo: JVM built-in expressions wherever the semantics allow, exact
DuckDB-mirrorable definitions so the driver can value-check them, and
plan shapes that survive a 100 TB input (no corpus-sized window sort,
no unbounded self-join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .extract import _as_col
from .sampling import _hex_threshold


# ---------------------------------------------------------------------------
# host suffix expansion (the unit the blocklist matches on)


def host_suffixes(host: str | Column) -> Column:
    """All dot-suffixes of a hostname, longest first:
    ``a.b.example.com -> [a.b.example.com, b.example.com, example.com,
    com]``.

    A host matches a blocklist entry iff the entry appears in this
    (bounded: one per label, hosts have <= ~10 labels) array, which
    turns suffix matching into plain set membership — the shape both
    the JVM expression path and the join path below need.  Empty
    hosts give an empty array.
    """
    h = _as_col(host)
    parts = F.split(h, r"\.")
    n = F.size(parts)
    idx = F.sequence(F.lit(1), n)
    sufs = F.transform(
        idx, lambda i: F.array_join(F.slice(parts, i, n - i + 1), ".")
    )
    return F.when(h == F.lit(""), F.array().cast("array<string>")).otherwise(
        sufs
    )


def domain_blocklist_filter(
    df: DataFrame,
    blocklist: "list[str] | DataFrame",
    host_col: str = "host",
    domain_col: str = "domain",
    keep_blocked: bool = False,
) -> DataFrame:
    """Drop rows whose host IS a blocked domain or is a subdomain of
    one (``keep_blocked=True`` inverts: return only the blocked rows,
    the audit view).

    Two physical strategies by blocklist type:

    * ``list[str]`` — the list is embedded as a literal array and the
      verdict is ``arrays_overlap(host_suffixes(host), blocked)``:
      pure whole-stage-codegen expression, zero shuffle, zero join —
      a parallel filter scan.  Right up to ~10k entries (plan-size
      bound, not correctness).
    * ``DataFrame`` with ``domain_col`` — the UT1-scale path (millions
      of entries): the verdict is a function of the HOST alone, so it
      is computed once per DISTINCT host (distinct -> explode each
      host's suffix array -> broadcast-hash semi-join against the
      blocklist -> the blocked-hosts-actually-present set), then
      applied to the corpus with one host-keyed semi/anti join.  No
      synthetic row ids anywhere — a prior version keyed the verdict
      on ``monotonically_increasing_id``, whose two evaluations in
      one self-join plan can disagree after a shuffle or task retry.

    Rows with a NULL host match no blocklist entry under either
    strategy: kept by the filter view, absent from the audit view.

    100 TB: the literal path is a single filter scan; the DataFrame
    path adds one distinct over the host ledger (map-side combined,
    shuffles hosts not documents) and one host-keyed join back.
    """
    sufs = host_suffixes(F.col(host_col))
    if isinstance(blocklist, DataFrame):
        hosts = (
            df.select(host_col)
            .where(F.col(host_col).isNotNull())
            .distinct()
        )
        hit_hosts = (
            hosts.select(
                F.col(host_col), F.explode(host_suffixes(F.col(host_col))).alias("__suf")
            )
            .join(
                F.broadcast(
                    blocklist.select(
                        F.col(domain_col).alias("__suf")
                    ).distinct()
                ),
                "__suf",
                "left_semi",
            )
            .select(host_col)
            .distinct()
        )
        how = "left_semi" if keep_blocked else "left_anti"
        return df.join(hit_hosts, host_col, how)
    blocked = F.lit(list(dict.fromkeys(blocklist))).cast("array<string>")
    # coalesce: a null host has a null suffix array; it matches no
    # entry, it is not a match — mirror the DataFrame path exactly
    verdict = F.coalesce(F.arrays_overlap(sufs, blocked), F.lit(False))
    return df.where(verdict if keep_blocked else ~verdict)


# DuckDB mirror of the blocklist verdict for a host expression and a
# literal domain list — suffix semantics pinned to the same rule
# (exact match OR '.'-boundary suffix), kept beside the implementation
# so driver oracles can't drift. Quotes are doubled and LIKE
# metacharacters escaped (real hostnames contain '_', which would
# otherwise wildcard-match) so the SQL verdict is byte-for-byte the
# Spark rule, not a pattern approximation.
def duckdb_blocklist_verdict(host_sql: str, domains: "list[str]") -> str:
    terms = []
    for d in domains:
        lit = d.replace("'", "''")
        pat = (
            d.replace("\\", "\\\\")
            .replace("%", "\\%")
            .replace("_", "\\_")
            .replace("'", "''")
        )
        terms.append(
            f"({host_sql} = '{lit}' OR {host_sql} LIKE '%.{pat}' "
            f"ESCAPE '\\')"
        )
    if not terms:
        return "FALSE"
    # null-safe: a NULL host is NOT blocked (matches the Spark rule),
    # rather than yielding a NULL verdict that WHERE NOT would drop
    return "COALESCE(" + " OR ".join(terms) + ", FALSE)"


# ---------------------------------------------------------------------------
# recrawl dedup: one row per URL, newest fetch wins


def latest_crawl(
    df: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    tiebreak: "list[str] | None" = None,
) -> DataFrame:
    """Keep exactly one row per ``url_col``: the one with the largest
    ``ts_col``, ties broken by ``tiebreak`` columns (largest wins),
    then by the remaining columns in their current order — fully
    deterministic for any input.

    This is THE recrawl-dedup shape for a crawl ledger: the same URL
    shows up once per snapshot and only the newest fetch should feed
    the corpus.

    Plan: one hash aggregation — ``groupBy(url).agg(max(struct(ts,
    tiebreak..., rest...)))`` — deliberately NOT a row_number window:
    the aggregate form has map-side partial combine (each task reduces
    its local fetches of a URL to one candidate before the shuffle)
    and needs no per-key sort, so a URL recrawled a million times
    costs the shuffle one row, not a million.  At 10^12 rows that is
    the difference between a ledger-sized shuffle and a corpus-sized
    one.

    All non-url columns must be orderable (true for the crawl-table
    types; struct comparison is lexicographic by field order).
    """
    order_cols = [ts_col] + [c for c in (tiebreak or []) if c != ts_col]
    rest = [
        c for c in df.columns if c != url_col and c not in order_cols
    ]
    fields = order_cols + rest
    missing = [c for c in order_cols if c not in df.columns]
    if missing:
        raise ValueError(f"latest_crawl: missing columns {missing}")
    top = df.groupBy(url_col).agg(
        F.max(F.struct(*[F.col(c) for c in fields])).alias("__top")
    )
    # re-emit in the INPUT column order (the struct's comparison order
    # is internal; callers appending to existing tables rely on the
    # schema coming back exactly as it went in)
    return top.select(
        *[
            F.col(c) if c == url_col else F.col("__top")[c].alias(c)
            for c in df.columns
        ]
    )


# ---------------------------------------------------------------------------
# per-key quota: keep at most n rows per key, deterministically


def cap_per_key(
    df: DataFrame,
    key_col: str,
    n: int,
    id_col: str,
    seed: int = 0,
    method: str = "auto",
) -> DataFrame:
    """Keep at most ``n`` rows per key, chosen by md5-hash order of
    ``(key, id, seed)`` — a deterministic, engine-portable quota (the
    kept set is a pure function of the data, reproducible in DuckDB,
    and unbiased w.r.t. any corpus ordering).

    ``method``:

    * ``"window"`` — ``row_number`` over (key, hash-ordered): the
      textbook plan.  Correct at any size, but the per-key sort makes
      the heaviest host one task's problem.
    * ``"prefilter"`` — the skew-proof plan: compute per-key counts
      (tiny, map-side-combined), keep keys with ``count <= 4n``
      whole-row via the window path (their groups are small, the sort
      is trivial), and for oversized keys FIRST cut candidates with
      the portable hash-threshold predicate at rate ``4n/count`` (a
      codegen filter scan, no shuffle), then window only the
      candidates.  Because the ranking key IS the uniform hash, the
      true top-n hashes of a key survive the cut unless fewer than n
      candidates pass — statistically negligible at 4x margin
      (Chernoff: P[Binomial(c, 4n/c) < n] < e^-n for the keys this
      path applies to) and CHECKED per key: any key left short of
      ``min(n, count)`` rows falls back to its full window.  The
      heavy-key sort input is therefore O(n) rows per key regardless
      of key size.
    * ``"auto"`` — ``prefilter``.

    Returns the input columns unchanged (no rank column leaks).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    if method not in ("auto", "window", "prefilter"):
        raise ValueError(f"unknown method {method!r}")
    h = F.md5(
        F.concat(
            F.col(key_col).cast("string"),
            F.lit("|"),
            F.col(id_col).cast("string"),
            F.lit(f"|{seed}"),
        ).cast("binary")
    )
    w = Window.partitionBy(key_col).orderBy(h.asc(), F.col(id_col).asc())
    cols = df.columns

    def windowed(frame: DataFrame) -> DataFrame:
        return (
            frame.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= n)
            .select(*cols)
        )

    if method == "window":
        return windowed(df)

    # null keys can't ride the equi-joins below (Spark equi-joins are
    # not null-safe); they form one window group of their own, matching
    # what method='window' does with them
    nulls = df.where(F.col(key_col).isNull())
    nn = df.where(F.col(key_col).isNotNull())
    # one row per key; NOT broadcast-hinted — at web scale the host
    # ledger itself is large, so this join shuffles on the key (AQE
    # may still broadcast it when it turns out small)
    counts = nn.groupBy(key_col).agg(F.count("*").alias("__key_rows"))
    tagged = nn.join(counts, key_col, "inner")
    small = tagged.where(F.col("__key_rows") <= 4 * n).select(*cols)
    big = tagged.where(F.col("__key_rows") > 4 * n)
    rate = F.least(
        F.lit(1.0), F.lit(4.0 * n) / F.col("__key_rows").cast("double")
    )
    cand = big.where(
        F.substring(h, 1, 15) < _hex_threshold(rate)
    )
    # safety check: a key whose candidate cut came up short of n rows
    # re-runs its FULL group through the window (exactness guarantee;
    # statistically ~never taken at the 4x margin). Derived from the
    # BIG-KEY list left-joined against the candidate counts, NOT from
    # the candidates alone: a key whose cut produced ZERO candidates
    # must be caught too, and it has no row in cand to count
    cand_counts = cand.groupBy(key_col).agg(
        F.count("*").alias("__cand_rows")
    )
    short_keys = (
        big.select(key_col)
        .distinct()
        .join(cand_counts, key_col, "left")
        .where(F.coalesce(F.col("__cand_rows"), F.lit(0)) < n)
        .select(key_col)
    )
    cand_ok = cand.join(F.broadcast(short_keys), key_col, "left_anti")
    redo = big.join(F.broadcast(short_keys), key_col, "left_semi")
    capped_big = windowed(
        cand_ok.select(*cols).unionByName(redo.select(*cols))
    )
    return (
        windowed(small)
        .unionByName(capped_big)
        .unionByName(windowed(nulls))
    )


# -- robots.txt politeness ---------------------------------------------------


def parse_robots(df: DataFrame, host_col: str, body_col: str) -> DataFrame:
    """(host, prefix, allow, wildcard) rules from robots.txt bodies —
    the ``User-agent: *`` group of each host, original-REP prefix
    semantics (every rule is a path prefix; ``Allow`` per the common
    extension).

    One robots.txt per host and bodies are ~KB, so an Arrow-batched
    Python parse is the honest shape (the stateful section scan has no
    JVM-builtin form); rows out are tiny (host, prefix, flags).
    Google-extension wildcard rules (``*``/``$`` inside the path) are
    NOT evaluated — they surface with ``wildcard=true`` so callers can
    count/route them instead of silently mis-filtering; empty
    ``Disallow:`` lines (allow-all markers) produce no rule, matching
    the spec. Agent-group parsing follows the REP grouping rule:
    consecutive ``User-agent`` lines share the rule block that
    follows; comments (#) stripped; header matching is
    case-insensitive.
    """
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("host", StringType()),
            StructField("prefix", StringType()),
            StructField("allow", BooleanType()),
            StructField("wildcard", BooleanType()),
        ]
    )

    def parse_one(host: str, body: str) -> list[tuple]:
        rules = []
        agents: list[str] = []
        in_star = False
        block_started = False
        for raw in (body or "").splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            field, _, value = line.partition(":")
            field = field.strip().lower()
            value = value.strip()
            if field == "user-agent":
                if block_started:  # new group starts
                    agents, block_started = [], False
                agents.append(value.lower())
                in_star = "*" in agents
                continue
            if field in ("allow", "disallow"):
                block_started = True
                if not in_star or not value:
                    continue  # empty Disallow: allow-all marker, no rule
                rules.append(
                    (
                        host,
                        value,
                        field == "allow",
                        "*" in value or "$" in value,
                    )
                )
        return rules

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out = []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                if host is None:
                    continue
                out.extend(parse_one(host, body))
            yield pd.DataFrame(
                out, columns=["host", "prefix", "allow", "wildcard"]
            )

    return df.select(host_col, body_col).mapInPandas(run, schema)


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Input rows whose URL the host's robots rules permit — the
    longest-matching-prefix election (ties: Allow wins, the
    least-restrictive REP tie-break), hosts with no rules allowed.

    Plan: derive (host, path) from the URL JVM-side, hash-join the
    bounded rules frame (exact prefix rules only — wildcard rows are
    refused loudly), keep matching prefixes with ``startswith``, elect
    per-URL via ONE ``max(struct(len(prefix), allow))`` hash aggregate
    (map-side combine; never a window sort), then a broadcast-friendly
    join back. Disallowed and rule-less URLs cost the shuffle one
    candidate row per matching rule — bounded by rules-per-host, not
    corpus size.
    """
    from .url import _AFTER_AUTH_RE, url_host

    if "__host" in urls.columns or "__path" in urls.columns:
        raise ValueError(
            "robots_filter reserves '__host'/'__path'; rename them first"
        )
    wild = rules.where(F.col("wildcard")).limit(1).count()
    if wild:
        raise ValueError(
            "rules contain wildcard entries (wildcard=true); filter them "
            "out (and count them!) before robots_filter — prefix "
            "semantics would silently mis-apply them"
        )
    u = urls.withColumn("__host", url_host(F.col(url_col))).withColumn(
        "__path",
        F.when(
            F.regexp_replace(F.col(url_col), _AFTER_AUTH_RE, "") == "",
            F.lit("/"),
        ).otherwise(F.regexp_replace(F.col(url_col), _AFTER_AUTH_RE, "")),
    )
    r = rules.select(
        F.col("host").alias("__host"),
        F.col("prefix"),
        F.col("allow").cast("int").alias("__allow"),
    )
    verdict = (
        u.select(url_col, "__host", "__path")
        .join(r, "__host")
        .where(F.col("__path").startswith(F.col("prefix")))
        .groupBy(url_col)
        .agg(
            F.max(
                F.struct(F.length("prefix").alias("l"), F.col("__allow"))
            ).alias("best")
        )
        .where(F.col("best.__allow") == 0)
        .select(F.col(url_col).alias("__blocked_url"))
    )
    return (
        u.join(
            verdict,
            u[url_col] == verdict["__blocked_url"],
            "left_anti",
        )
        .drop("__host", "__path")
    )
