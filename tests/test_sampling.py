"""sampling.py: portable deterministic sampling + temperature
domain-mixture resampling.

The engine-parity of the md5-prefix membership predicate is driver-
checked (consistent_sample_parity / temperature_resample_docs
oracles); these tests pin the operator-level contracts: determinism,
key-consistency across tables, the temperature math at its analytic
anchor points (alpha=1 -> input mixture, alpha=0 -> uniform mixture),
and the rate cap.
"""

import math

import pytest
from pyspark.sql import functions as F

from hll_spark.operators.sampling import (
    consistent_sample_portable,
    temperature_resample,
)

SF = "/root/testdata/sf0.01"


def _events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_portable_sample_deterministic_and_layout_invariant(spark):
    ev = _events(spark)
    a = {r.event_id for r in consistent_sample_portable(ev, "user_id", 0.1).collect()}
    b = {
        r.event_id
        for r in consistent_sample_portable(ev.repartition(13), "user_id", 0.1).collect()
    }
    assert a == b and a  # same set under a different partitioning


def test_portable_sample_fraction_tolerance(spark):
    ev = _events(spark)
    users = ev.select("user_id").distinct()
    n_users = users.count()
    kept_users = consistent_sample_portable(users, "user_id", 0.2).count()
    # binomial: sd = sqrt(n p (1-p)); allow 5 sd
    sd = math.sqrt(n_users * 0.2 * 0.8)
    assert abs(kept_users - 0.2 * n_users) < 5 * sd


def test_portable_sample_key_consistency_across_tables(spark):
    # sampling the user DIM at 10% and the events FACT by the same key
    # must select exactly the events of the sampled users
    ev = _events(spark)
    dim_kept = {
        r.user_id
        for r in consistent_sample_portable(
            ev.select("user_id").distinct(), "user_id", 0.1
        ).collect()
    }
    fact_users = {
        r.user_id
        for r in consistent_sample_portable(ev, "user_id", 0.1)
        .select("user_id")
        .distinct()
        .collect()
    }
    assert fact_users == dim_kept


def test_portable_sample_edges(spark):
    ev = _events(spark)
    assert consistent_sample_portable(ev, "user_id", 0.0).count() == 0
    assert consistent_sample_portable(ev, "user_id", 1.0).count() == ev.count()
    with pytest.raises(ValueError):
        consistent_sample_portable(ev, "user_id", 1.5)


def test_temperature_alpha1_reproduces_input_mixture(spark):
    # alpha=1: every domain sampled at exactly target_frac
    out = temperature_resample(_docs(spark), "lang", "doc_id", alpha=1.0, target_frac=0.4)
    rates = {r.lang: r.sample_rate for r in out.select("lang", "sample_rate").distinct().collect()}
    assert rates and all(v == pytest.approx(0.4, abs=1e-6) for v in rates.values())


def test_temperature_alpha0_equalizes_expected_counts(spark):
    # alpha=0: rate_d * count_d constant across domains (uniform mixture)
    out = temperature_resample(_docs(spark), "lang", "doc_id", alpha=0.0, target_frac=0.5)
    rows = out.select("lang", "sample_rate", "domain_rows").distinct().collect()
    expected = {r.sample_rate * r.domain_rows for r in rows}
    lo, hi = min(expected), max(expected)
    assert hi - lo < 1e-2  # equal up to the 1e-6 rate rounding * counts


def test_temperature_rare_domains_upweighted(spark):
    out = temperature_resample(_docs(spark), "lang", "doc_id", alpha=0.5, target_frac=0.5)
    rows = out.select("lang", "sample_rate", "domain_rows").distinct().collect()
    by_count = sorted(rows, key=lambda r: r.domain_rows)
    rates = [r.sample_rate for r in by_count]
    assert rates == sorted(rates, reverse=True)  # rarer -> higher keep rate


def test_temperature_rate_cap_keeps_tiny_domain_whole(spark):
    # drive the implied tail rate past 1: alpha=0 with a high target on
    # a frame where one domain is tiny
    docs = _docs(spark)
    tiny = docs.limit(3).withColumn("lang", F.lit("xx"))
    df = docs.unionByName(tiny)
    out = temperature_resample(df, "lang", "doc_id", alpha=0.0, target_frac=0.8)
    xx = out.where(F.col("lang") == "xx")
    assert xx.count() == 3
    assert {r.sample_rate for r in xx.select("sample_rate").collect()} == {1.0}


def test_temperature_realized_rates_match_declared(spark):
    # the md5 membership realizes each domain's declared rate (binomial)
    out = temperature_resample(_docs(spark), "lang", "doc_id", alpha=0.5, target_frac=0.5)
    got = {
        (r.lang): (r.kept, r.sample_rate, r.domain_rows)
        for r in out.groupBy("lang", "sample_rate", "domain_rows")
        .agg(F.count("*").alias("kept"))
        .collect()
    }
    for lang, (kept, rate, n) in got.items():
        sd = math.sqrt(n * rate * (1 - rate)) or 1.0
        assert abs(kept - rate * n) < 5 * sd, (lang, kept, rate, n)


def test_temperature_validation(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError):
        temperature_resample(docs, "lang", "doc_id", alpha=-0.1)
    with pytest.raises(ValueError):
        temperature_resample(docs, "lang", "doc_id", target_frac=1.2)


# ---------------------------------------------------------------------------
# weighted_sample (Efraimidis-Spirakis A-Res, portable uniforms)
# ---------------------------------------------------------------------------

from hll_spark.operators.sampling import weighted_sample  # noqa: E402


def test_weighted_sample_deterministic_and_layout_invariant(spark):
    docs = _docs(spark)
    a = weighted_sample(docs, "doc_id", F.length("text"), k=50)
    b = weighted_sample(docs.repartition(32), "doc_id", F.length("text"), k=50)
    rows_a = sorted((r.doc_id, r.sample_rank) for r in a.collect())
    rows_b = sorted((r.doc_id, r.sample_rank) for r in b.collect())
    assert rows_a == rows_b
    assert len(rows_a) == 50
    assert sorted(r[1] for r in rows_a) == list(range(1, 51))


def test_weighted_sample_k_exceeding_population_returns_all(spark):
    docs = _docs(spark).limit(10)
    out = weighted_sample(docs, "doc_id", F.lit(1.0), k=999).collect()
    assert len(out) == 10
    assert sorted(r.sample_rank for r in out) == list(range(1, 11))


def test_weighted_sample_drops_nonpositive_and_null_weights(spark):
    df = spark.createDataFrame(
        [(1, 2.0), (2, 0.0), (3, -1.0), (4, None), (5, 3.0)],
        "id long, w double",
    )
    out = weighted_sample(df, "id", "w", k=10).collect()
    assert sorted(r.id for r in out) == [1, 5]


def test_weighted_sample_inclusion_tracks_weight(spark):
    # one row carries 10^9x the weight of 99 others: P(excluded) is
    # ~k-th-order tiny per seed; across 20 seeds it must always be in
    df = spark.createDataFrame(
        [(i, 1e9 if i == 7 else 1.0) for i in range(100)], "id long, w double"
    )
    hits = 0
    for seed in range(20):
        kept = {r.id for r in weighted_sample(df, "id", "w", k=10, seed=seed).collect()}
        assert len(kept) == 10
        hits += 7 in kept
    assert hits == 20


def test_weighted_sample_uniform_weights_match_unweighted_hash_order(spark):
    # with all weights equal, top-k by u^(1/w) == top-k by u: the
    # sample must be exactly the k largest md5-derived uniforms
    df = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    out = weighted_sample(df, "id", F.lit(1.0), k=25, seed=3)
    got = [r.id for r in out.orderBy("sample_rank").collect()]
    # independent scalar-model reference
    import hashlib

    def u(i):
        h = hashlib.md5(f"{i}:3".encode()).hexdigest()[:15]
        return (int(h, 16) + 1) / float(1 << 60)

    want = sorted(range(1000), key=lambda i: (-u(i), i))[:25]
    assert got == want


def test_weighted_sample_validation(spark):
    with pytest.raises(ValueError):
        weighted_sample(_docs(spark), "doc_id", F.lit(1.0), k=0)


# ---------------------------------------------------------------------------
# stratified_split
# ---------------------------------------------------------------------------

from hll_spark.operators.sampling import stratified_split  # noqa: E402


def test_stratified_split_exact_counts_per_stratum(spark):
    out = stratified_split(_docs(spark), ["lang"], key_col="doc_id")
    counts = (
        out.groupBy("lang", "split").count().collect()
    )
    per_lang = {}
    for r in counts:
        per_lang.setdefault(r.lang, {})[r.split] = r["count"]
    for lang, by_split in per_lang.items():
        n = sum(by_split.values())
        # cumulative-floor allocation: split i gets
        # floor(cum_i*n) - floor(cum_{i-1}*n) rows, exactly
        cuts = [0, math.floor(0.8 * n), math.floor(0.9 * n), n]
        expect = {
            "train": cuts[1] - cuts[0],
            "val": cuts[2] - cuts[1],
            "test": cuts[3] - cuts[2],
        }
        got = {s: by_split.get(s, 0) for s in expect}
        assert got == expect, f"{lang}: {got} != {expect}"


def test_stratified_split_deterministic_and_layout_invariant(spark):
    docs = _docs(spark)
    a = {(r.doc_id, r.split) for r in
         stratified_split(docs, ["lang"], key_col="doc_id").select("doc_id", "split").collect()}
    b = {(r.doc_id, r.split) for r in
         stratified_split(docs.repartition(17), ["lang"], key_col="doc_id").select("doc_id", "split").collect()}
    assert a == b and a


def test_stratified_split_inexact_mode_is_scan_only_and_close(spark):
    docs = _docs(spark)
    out = stratified_split(docs, ["lang"], key_col="doc_id", exact=False)
    # no Exchange in the plan: the split is a pure filter-scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    n = docs.count()
    got = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert abs(got.get("train", 0) / n - 0.8) < 0.05


def test_stratified_split_covers_every_row_once(spark):
    docs = _docs(spark)
    out = stratified_split(docs, ["lang"], key_col="doc_id")
    assert out.count() == docs.count()
    assert out.where(F.col("split").isNull()).count() == 0


def test_stratified_split_validation(spark):
    docs = _docs(spark)
    with pytest.raises(ValueError):
        stratified_split(docs, ["lang"], splits=[("train", 1.0)])
    with pytest.raises(ValueError):
        stratified_split(docs, ["lang"], splits=[("a", 0.5), ("a", 0.5)])
    with pytest.raises(ValueError):
        stratified_split(docs, ["lang"], splits=[("a", 0.7), ("b", 0.2)])
    with pytest.raises(ValueError):
        stratified_split(docs, [])


def test_stratified_split_tiny_strata(spark):
    # a 1-row stratum: train/val get floor(0) rows, the row lands in
    # the LAST split (cumulative-floor semantics)
    docs = spark.createDataFrame(
        [(1, "only"), (2, "big"), (3, "big"), (4, "big")],
        "doc_id long, lang string",
    )
    got = {r.doc_id: r.split for r in
           stratified_split(docs, ["lang"], key_col="doc_id").collect()}
    assert got[1] == "test"
