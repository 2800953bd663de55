"""Composed cleaning pipeline (operators/pipeline.py)."""

import numpy as np
import pandas as pd
import pytest

from hll_spark.operators.pipeline import clean_corpus


@pytest.fixture(scope="module")
def messy_corpus(spark):
    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(400)]

    def doc(seed, n=120):
        return " ".join(np.random.default_rng(seed).choice(words, n).tolist())

    base = doc(1)
    near = base.rsplit(" ", 5)[0] + " zz1 zz2 zz3 zz4 zz5"
    texts = {
        0: base,                      # keeper
        1: base,                      # exact dup of 0 -> dropped
        2: near,                      # near-dup of 0 -> dropped
        3: doc(2),                    # clean -> kept
        4: "#x " * 80,                # symbol soup -> quality-dropped
        5: "\n".join(["same line"] * 9 + ["x y z"]),  # dup lines -> dropped
        6: doc(4),                    # clean -> kept
    }
    pdf = pd.DataFrame(
        {"doc_id": list(texts), "text": list(texts.values()),
         "lang": ["en", "en", "en", "de", "en", "en", "fr"]}
    )
    return spark.createDataFrame(pdf)


def test_clean_corpus_end_to_end(spark, messy_corpus):
    kept = sorted(
        r.doc_id for r in clean_corpus(messy_corpus).select("doc_id").collect()
    )
    assert kept == [0, 3, 6]


def test_clean_corpus_minhash_variant_agrees(spark, messy_corpus):
    exact = sorted(
        r.doc_id for r in clean_corpus(messy_corpus).select("doc_id").collect()
    )
    scale = sorted(
        r.doc_id
        for r in clean_corpus(messy_corpus, exact_neardup=False)
        .select("doc_id")
        .collect()
    )
    assert exact == scale  # the at-scale path keeps the same corpus here


def test_crawl_ingest_composition(spark):
    from hll_spark.operators.pipeline import crawl_ingest

    rows = []
    for k in range(30):
        url = f"https://h{k % 4}.example.{'org' if k % 2 else 'com'}/d/{k}"
        # two fetches per url; newest (ts=1) carries the kept text
        rows.append((url, 0, 2 * k, f"old text for {k} old text", "en"))
        rows.append((url, 1, 2 * k + 1, f"fresh words number {k} fresh words", "en"))
    crawls = spark.createDataFrame(
        rows, ["url", "warc_ts", "fetch_id", "text", "lang"]
    )
    out = crawl_ingest(
        crawls,
        tiebreak=["fetch_id"],
        blocklist=["example.org"],
        host_cap=5,
        clean=False,
    )
    got = out.collect()
    # schema preserved, host helper column dropped
    assert out.columns == ["url", "warc_ts", "fetch_id", "text", "lang"]
    # only the newest fetch of each url survives
    assert all(r.warc_ts == 1 and "fresh" in r.text for r in got)
    # .org branch gone; cap 5 per host on the two .com hosts
    from collections import Counter

    hosts = Counter(r.url.split("/")[2] for r in got)
    assert set(hosts) == {"h0.example.com", "h2.example.com"}
    assert all(c <= 5 for c in hosts.values())

    # clean=True path still runs and only shrinks the row set
    cleaned = crawl_ingest(
        crawls,
        tiebreak=["fetch_id"],
        blocklist=["example.org"],
        host_cap=5,
        neardup_threshold=0.99,
    )
    kept_urls = {r.url for r in cleaned.collect()}
    assert kept_urls <= {r.url for r in got}


def test_crawl_ingest_reserved_host_column(spark):
    import pytest as _pytest

    from hll_spark.operators.pipeline import crawl_ingest

    crawls = spark.createDataFrame(
        [("https://a.com/x", 1, "t", "h")],
        ["url", "warc_ts", "text", "host"],
    )
    with _pytest.raises(ValueError, match="host"):
        crawl_ingest(crawls, blocklist=["a.com"], clean=False)


def test_clean_corpus_cluster_dedup_rejects_string_ids(spark):
    import pytest as _pytest

    from hll_spark.operators.pipeline import clean_corpus

    df = spark.createDataFrame(
        [("u1", "some quality text with words here ok")],
        ["doc_id", "text"],
    )
    with _pytest.raises(ValueError, match="integral id"):
        clean_corpus(df, id_col="doc_id", cluster_dedup=True)
