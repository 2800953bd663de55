"""Deterministic training-shard layout (plans/shards.py)."""

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from hll_spark.plans.shards import (
    assign_shards,
    shard_manifest,
    write_training_shards,
)


def _h(key, seed=0):
    """The portable 60-bit hash, recomputed independently."""
    return int(hashlib.md5(f"{key}:{seed}".encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") * 3 % 997).alias("size"),
    )


def test_assignment_matches_portable_hash(spark, corpus):
    got = {
        r.doc_id: r.shard_id
        for r in assign_shards(corpus, "doc_id", 16).collect()
    }
    for k, s in got.items():
        assert s == _h(k) % 16
    assert set(got.values()) == set(range(16))


def test_assignment_partitioning_invariant(corpus):
    a = sorted(
        (r.doc_id, r.shard_id)
        for r in assign_shards(corpus, "doc_id", 8).collect()
    )
    b = sorted(
        (r.doc_id, r.shard_id)
        for r in assign_shards(corpus.repartition(13), "doc_id", 8).collect()
    )
    assert a == b


def test_shards_are_balanced(corpus):
    counts = [
        r.n_rows
        for r in shard_manifest(corpus, "doc_id", 16).collect()
    ]
    assert len(counts) == 16 and sum(counts) == 2000
    # md5 uniformity: 2000/16 = 125 expected; allow wide slack
    assert min(counts) > 70 and max(counts) < 190


def test_manifest_checksums_match_independent_recompute(corpus):
    rows = {r.doc_id: r.size for r in corpus.collect()}
    expected = {}
    for k, size in rows.items():
        s = _h(k) % 16
        n, x, t = expected.get(s, (0, 0, 0))
        expected[s] = (n + 1, x ^ _h(k), t + size)
    got = {
        r.shard_id: (r.n_rows, r.key_xor, r.total_size)
        for r in shard_manifest(
            corpus, "doc_id", 16, size_col="size"
        ).collect()
    }
    assert got == expected


def test_write_reads_back_with_claimed_layout(spark, corpus, tmp_path):
    path = os.path.join(str(tmp_path), "shards")
    manifest = {
        r.shard_id: r.n_rows
        for r in write_training_shards(
            corpus, path, "doc_id", 8, sort_col="doc_id"
        ).collect()
    }
    back = spark.read.parquet(path)
    per_dir = {
        r.shard_id: r.n for r in
        back.groupBy("shard_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_dir == manifest
    # every row landed in the directory its key hashes to
    for r in back.select("doc_id", "shard_id").collect():
        assert r.shard_id == _h(r.doc_id) % 8


def test_validation(corpus):
    with pytest.raises(ValueError):
        assign_shards(corpus, "doc_id", 0)
    with pytest.raises(ValueError):
        assign_shards(
            assign_shards(corpus, "doc_id", 4), "doc_id", 4
        )
