"""Crawl-ledger operators: host suffixes, domain blocklists, recrawl
dedup, per-host quotas — plus the round-4 repetition metrics."""

import pyspark.sql.functions as F
import pytest

from hll_spark.operators.crawl import (
    cap_per_key,
    domain_blocklist_filter,
    host_suffixes,
    latest_crawl,
)
from hll_spark.operators.text import (
    duplicate_ngram_fraction,
    duplicate_paragraph_fraction,
)


def test_host_suffixes(spark):
    rows = spark.createDataFrame(
        [("a.b.example.com",), ("com",), ("",)], ["host"]
    ).select(host_suffixes("host").alias("s")).collect()
    assert rows[0].s == [
        "a.b.example.com", "b.example.com", "example.com", "com",
    ]
    assert rows[1].s == ["com"]
    assert rows[2].s == []


HOSTS = [
    "a.b.example.com", "example.com", "notexample.com", "cdn.net",
    "example.com.evil.org", "sub.cdn.net", "", "example.org",
]


def _blocked_by_rule(host, domains):
    return any(host == d or host.endswith("." + d) for d in domains)


@pytest.mark.parametrize("keep_blocked", [False, True])
def test_blocklist_literal_matches_rule(spark, keep_blocked):
    df = spark.createDataFrame([(h,) for h in HOSTS], ["host"])
    doms = ["example.com", "cdn.net"]
    got = sorted(
        r.host
        for r in domain_blocklist_filter(
            df, doms, host_col="host", keep_blocked=keep_blocked
        ).collect()
    )
    want = sorted(
        h for h in HOSTS if _blocked_by_rule(h, doms) == keep_blocked
    )
    assert got == want
    # notexample.com survives: suffix rule is '.'-boundary, not substring
    if not keep_blocked:
        assert "notexample.com" in got
        assert "example.com.evil.org" in got  # suffix, not containment


def test_blocklist_join_strategy_parity(spark):
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(HOSTS)], ["id", "host"]
    )
    doms = ["example.com", "cdn.net"]
    blk = spark.createDataFrame([(d,) for d in doms], ["domain"])
    lit_kept = sorted(
        r.id for r in domain_blocklist_filter(df, doms, host_col="host").collect()
    )
    join_kept = sorted(
        r.id for r in domain_blocklist_filter(df, blk, host_col="host").collect()
    )
    assert lit_kept == join_kept
    # audit view is the exact complement
    aud = sorted(
        r.id
        for r in domain_blocklist_filter(
            df, blk, host_col="host", keep_blocked=True
        ).collect()
    )
    assert sorted(lit_kept + aud) == sorted(r.id for r in df.collect())


def test_blocklist_null_host_consistent_across_strategies(spark):
    # a NULL host matches nothing: kept by the filter view, absent
    # from the audit view — identically under BOTH strategies
    df = spark.createDataFrame(
        [(1, "x.com"), (2, None), (3, "a.x.com")], ["id", "host"]
    )
    doms = ["x.com"]
    blk = spark.createDataFrame([(d,) for d in doms], ["domain"])
    for bl in (doms, blk):
        kept = sorted(
            r.id for r in domain_blocklist_filter(df, bl, host_col="host").collect()
        )
        aud = sorted(
            r.id
            for r in domain_blocklist_filter(
                df, bl, host_col="host", keep_blocked=True
            ).collect()
        )
        assert kept == [2] and aud == [1, 3]


def test_blocklist_verdict_sql_escapes_like_metachars(spark):
    # '_' in a real hostname must not wildcard-match in the oracle SQL
    import duckdb

    from hll_spark.operators.crawl import duckdb_blocklist_verdict

    doms = ["foo_bar.com"]
    hosts = ["a.foo_bar.com", "a.fooxbar.com", "foo_bar.com", None]
    df = spark.createDataFrame([(h,) for h in hosts], ["host"])
    spark_kept = sorted(
        r.host or ""
        for r in domain_blocklist_filter(df, doms, host_col="host").collect()
    )
    v = duckdb_blocklist_verdict("host", doms)
    vals = ", ".join("(NULL)" if h is None else f"('{h}')" for h in hosts)
    sql_kept = sorted(
        r[0] or ""
        for r in duckdb.connect()
        .execute(f"SELECT host FROM (VALUES {vals}) t(host) WHERE NOT {v}")
        .fetchall()
    )
    assert spark_kept == sql_kept == ["", "a.fooxbar.com"]


def test_latest_crawl_newest_wins_with_ties(spark):
    rows = [
        ("u1", 3, 10, "a"), ("u1", 5, 11, "b"), ("u1", 5, 12, "c"),
        ("u2", 1, 13, "d"),
    ]
    df = spark.createDataFrame(rows, ["url", "warc_ts", "fetch_id", "pay"])
    got = {
        r.url: (r.warc_ts, r.fetch_id, r.pay)
        for r in latest_crawl(df, "url", "warc_ts", tiebreak=["fetch_id"]).collect()
    }
    assert got == {"u1": (5, 12, "c"), "u2": (1, 13, "d")}


def test_latest_crawl_partition_invariant(spark):
    rows = [(f"u{i % 7}", i % 13, i, f"p{i}") for i in range(200)]
    df = spark.createDataFrame(rows, ["url", "warc_ts", "fetch_id", "pay"])
    a = sorted(map(tuple, latest_crawl(df, "url", "warc_ts").collect()))
    b = sorted(
        map(tuple, latest_crawl(df.repartition(13), "url", "warc_ts").collect())
    )
    assert a == b and len(a) == 7


def test_latest_crawl_missing_ts_raises(spark):
    df = spark.createDataFrame([("u", 1)], ["url", "x"])
    with pytest.raises(ValueError, match="missing"):
        latest_crawl(df, "url", "warc_ts")


def _cap_sets(df, n, method, seed=0):
    out = cap_per_key(df, "host", n, "id", seed=seed, method=method)
    return sorted((r.host, r.id) for r in out.collect())


def test_cap_per_key_methods_agree_small_and_big_keys(spark):
    # one hot key (400 rows >> 4n) plus many small keys — exercises
    # BOTH branches of the prefilter plan in one frame
    rows = [("hot", i) for i in range(400)]
    rows += [(f"h{i % 17}", 1000 + i) for i in range(120)]
    df = spark.createDataFrame(rows, ["host", "id"])
    for n in (1, 5):
        w = _cap_sets(df, n, "window")
        p = _cap_sets(df, n, "prefilter")
        assert w == p
        from collections import Counter

        by_key = Counter(h for h, _ in p)
        assert by_key["hot"] == n
        assert all(c <= n for c in by_key.values())


def test_cap_per_key_deterministic_and_seed_sensitive(spark):
    rows = [("h", i) for i in range(100)]
    df = spark.createDataFrame(rows, ["host", "id"])
    a = _cap_sets(df, 10, "prefilter", seed=0)
    b = _cap_sets(df.repartition(7), 10, "prefilter", seed=0)
    c = _cap_sets(df, 10, "prefilter", seed=1)
    assert a == b  # pure function of the data
    assert a != c  # seed actually enters the rank


def test_cap_per_key_keeps_under_quota_keys_whole(spark):
    rows = [("small", i) for i in range(3)] + [("big", i) for i in range(50)]
    df = spark.createDataFrame(rows, ["host", "id"])
    got = _cap_sets(df, 5, "prefilter")
    assert [i for h, i in got if h == "small"] == [0, 1, 2]
    assert len([1 for h, _ in got if h == "big"]) == 5


def test_cap_per_key_validation(spark):
    df = spark.createDataFrame([("h", 1)], ["host", "id"])
    with pytest.raises(ValueError):
        cap_per_key(df, "host", 0, "id")
    with pytest.raises(ValueError):
        cap_per_key(df, "host", 1, "id", method="nope")


def test_duplicate_paragraph_fraction_values(spark):
    df = spark.createDataFrame(
        [
            ("aa\n\nbb\n\naa\n\ncc",),   # aa dup: 4 chars of 8
            ("one\n\ntwo",),
            ("",),
            ("x\n\n\n\nx",),            # blank-para runs collapse
        ],
        ["text"],
    )
    got = [
        r[0]
        for r in df.select(
            F.round(duplicate_paragraph_fraction("text"), 6)
        ).collect()
    ]
    assert got == [0.5, 0.0, 0.0, 1.0]


def test_duplicate_ngram_fraction_values(spark):
    df = spark.createDataFrame(
        [("a b a b a",), ("a b c d",), ("a",), ("",)], ["text"]
    )
    # 2-grams of "a b a b a": ab ba ab ba -> 4 total, 2 distinct
    got = [
        r[0]
        for r in df.select(
            F.round(duplicate_ngram_fraction("text", 2), 6)
        ).collect()
    ]
    assert got == [0.5, 0.0, 0.0, 0.0]
    with pytest.raises(ValueError):
        duplicate_ngram_fraction("text", 0)


# ---------------------------------------------------------------------------
# property tests (reference implementations in pandas)


def test_latest_crawl_matches_pandas_reference(spark):
    import pandas as pd

    rows = [
        (f"u{(i * 7) % 23}", (i * 13) % 5, i, f"pay{i % 11}")
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, ["url", "warc_ts", "fetch_id", "pay"])
    got = sorted(
        map(tuple, latest_crawl(df, "url", "warc_ts").collect())
    )
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "fetch_id", "pay"])
    ref = (
        pdf.sort_values(["warc_ts", "fetch_id", "pay"])
        .groupby("url", as_index=False)
        .last()
    )
    want = sorted(map(tuple, ref[["url", "warc_ts", "fetch_id", "pay"]].itertuples(index=False)))
    assert got == want


def test_cap_per_key_output_size_exact(spark):
    # |kept per key| == min(n, count(key)) for every key, any n
    from collections import Counter

    rows = [(f"h{i % 11}", i) for i in range(313)]
    df = spark.createDataFrame(rows, ["host", "id"])
    counts = Counter(h for h, _ in rows)
    for n in (1, 3, 29):
        for method in ("window", "prefilter"):
            got = Counter(
                r.host
                for r in cap_per_key(df, "host", n, "id", method=method).collect()
            )
            assert got == {h: min(n, c) for h, c in counts.items()}


def test_cap_per_key_zero_candidate_keys_not_dropped(spark):
    # regression: with n=1 and many 100-row keys, ~1.7% of keys get
    # ZERO rows through the hash-threshold cut (rate 0.04); the
    # shortfall check must catch count==0, not just 1..n-1 — a
    # version that derived short keys from the candidate frame alone
    # silently dropped such keys entirely
    rows = [(f"h{k}", k * 1000 + i) for k in range(300) for i in range(100)]
    df = spark.createDataFrame(rows, ["host", "id"]).repartition(8)
    got = cap_per_key(df, "host", 1, "id", seed=3, method="prefilter")
    from collections import Counter

    by_key = Counter(r.host for r in got.collect())
    assert len(by_key) == 300
    assert all(c == 1 for c in by_key.values())


def test_cap_per_key_null_keys_consistent(spark):
    rows = [("h", i) for i in range(30)] + [(None, 100 + i) for i in range(7)]
    df = spark.createDataFrame(rows, ["host", "id"])
    key = lambda t: (t[0] or "", t[1])  # noqa: E731
    w = sorted(
        ((r.host, r.id)
         for r in cap_per_key(df, "host", 3, "id", method="window").collect()),
        key=key,
    )
    p = sorted(
        ((r.host, r.id)
         for r in cap_per_key(df, "host", 3, "id", method="prefilter").collect()),
        key=key,
    )
    assert w == p
    assert len([1 for h, _ in p if h is None]) == 3


def test_latest_crawl_preserves_column_order(spark):
    df = spark.createDataFrame(
        [(5, "u1", "t", "en"), (9, "u1", "s", "de")],
        ["warc_ts", "url", "text", "lang"],
    )
    out = latest_crawl(df, "url", "warc_ts")
    assert out.columns == ["warc_ts", "url", "text", "lang"]
    assert out.collect()[0] == (9, "u1", "s", "de")


def test_duplicate_ngram_fraction_matches_python_reference(spark):
    # Hypothesis over random token sequences: the zip_with fold must
    # equal a plain-Python n-gram count for every (tokens, n)
    from hypothesis import given, settings
    from hypothesis import strategies as st

    tok = st.text(alphabet="abc", min_size=1, max_size=2)
    cases = st.tuples(
        st.lists(tok, min_size=0, max_size=12),
        st.integers(min_value=1, max_value=4),
    )

    collected = []

    @settings(max_examples=60, deadline=None)
    @given(cases)
    def gen(case):
        collected.append(case)

    gen()
    rows = [(" ".join(toks), n, i) for i, (toks, n) in enumerate(collected)]
    df = spark.createDataFrame(rows, ["text", "n", "i"])
    for n in sorted({n for _, n, _ in rows}):
        sub = df.where(F.col("n") == n)
        got = {
            r.i: r.f
            for r in sub.select(
                "i", F.round(duplicate_ngram_fraction("text", n), 9).alias("f")
            ).collect()
        }
        for text, nn, i in rows:
            if nn != n:
                continue
            toks = text.split()
            grams = [
                " ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)
            ]
            want = (
                (len(grams) - len(set(grams))) / len(grams) if grams else 0.0
            )
            assert abs(got[i] - round(want, 9)) < 1e-9, (text, n)


# -- robots.txt -------------------------------------------------------------


def _rules_of(spark, body, host="h.com"):
    from hll_spark.operators.crawl import parse_robots

    df = spark.createDataFrame([(host, body)], "host string, body string")
    return sorted(
        (r["prefix"], r["allow"], r["wildcard"])
        for r in parse_robots(df, "host", "body").collect()
    )


def test_parse_robots_groups_and_markers(spark):
    body = (
        "# top comment\n"
        "User-agent: Googlebot\n"
        "Disallow: /g/\n"
        "\n"
        "User-agent: a\n"
        "USER-AGENT: *\n"          # consecutive agents share the block
        "Disallow: /x  # trailing comment\n"
        "Allow: /x/ok\n"
        "Disallow:\n"              # empty: allow-all marker, no rule
        "Disallow: /wild/*/end$\n" # wildcard flagged, not silently used
        "\n"
        "User-agent: badbot\n"
        "Disallow: /\n"
    )
    assert _rules_of(spark, body) == [
        ("/wild/*/end$", False, True),
        ("/x", False, False),
        ("/x/ok", True, False),
    ]


def test_parse_robots_star_only_other_groups_ignored(spark):
    body = "User-agent: bot\nDisallow: /all\n"
    assert _rules_of(spark, body) == []


def test_robots_filter_election(spark):
    from hll_spark.operators.crawl import robots_filter

    rules = spark.createDataFrame(
        [
            ("h.com", "/a", False, False),
            ("h.com", "/a/keep", True, False),
            ("h.com", "/t/", False, False),  # equal-length tie ...
            ("h.com", "/t/", True, False),   # ... Allow wins
        ],
        "host string, prefix string, allow boolean, wildcard boolean",
    )
    urls = spark.createDataFrame(
        [
            ("https://h.com/a/blocked",),
            ("https://h.com/a/keep/deeper",),
            ("https://h.com/t/tie",),
            ("https://h.com/free",),
            ("https://other.com/a/blocked",),  # no rules for this host
            ("https://h.com",),                # bare url -> path '/'
        ],
        "url string",
    )
    got = sorted(r["url"] for r in robots_filter(urls, rules).collect())
    assert got == [
        "https://h.com",
        "https://h.com/a/keep/deeper",
        "https://h.com/free",
        "https://h.com/t/tie",
        "https://other.com/a/blocked",
    ]


def test_robots_filter_guards(spark):
    from hll_spark.operators.crawl import robots_filter

    rules = spark.createDataFrame(
        [("h.com", "/w*", False, True)],
        "host string, prefix string, allow boolean, wildcard boolean",
    )
    urls = spark.createDataFrame([("https://h.com/x",)], "url string")
    with pytest.raises(ValueError, match="wildcard"):
        robots_filter(urls, rules)
    ok_rules = rules.where(~F.col("wildcard"))
    with pytest.raises(ValueError, match="__host"):
        robots_filter(urls.withColumn("__host", F.lit("x")), ok_rules)
