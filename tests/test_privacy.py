"""Privacy ops: keyed pseudonymization determinism/linkage semantics
and the k-anonymity measurement."""

import hashlib

import pytest
from pyspark.sql import functions as F

from hll_spark.operators.privacy import (
    k_anonymity_report,
    pseudonymize,
    small_groups,
)


@pytest.fixture(scope="module")
def people(spark):
    rows = [
        (1, "alice@x.com", "10001", 34),
        (2, "bob@x.com", "10001", 34),
        (3, "carol@y.com", "10001", 35),
        (4, "dave@y.com", "94103", 35),
        (5, None, "94103", 35),
    ]
    return spark.createDataFrame(
        rows, "uid bigint, email string, zip string, age int"
    )


def test_pseudonymize_matches_independent_hash(spark, people):
    out = {
        r["uid"]: r["email"]
        for r in pseudonymize(people, ["email"], secret="s3cret").collect()
    }
    want = hashlib.sha256(b"s3cret:email:alice@x.com").hexdigest()[:16]
    assert out[1] == want
    assert out[5] is None  # NULL stays NULL


def test_pseudonymize_join_stable_and_column_salted(spark, people):
    a = pseudonymize(people, ["email"], "k1")
    b = pseudonymize(people.select("uid", "email"), ["email"], "k1")
    joined = a.join(b.withColumnRenamed("uid", "uid2"), "email").where(
        F.col("uid") == F.col("uid2")
    )
    assert joined.count() == 4  # all non-null emails still join
    # different secret -> different tokens
    c = {
        r["uid"]: r["email"]
        for r in pseudonymize(people, ["email"], "k2").collect()
    }
    ar = {r["uid"]: r["email"] for r in a.collect()}
    assert all(ar[u] != c[u] for u in (1, 2, 3, 4))
    # same value in a different COLUMN -> different token
    two = people.withColumn("email2", F.col("email"))
    t = pseudonymize(two, ["email", "email2"], "k1").collect()[0]
    assert t["email"] != t["email2"]


def test_pseudonymize_validation(spark, people):
    with pytest.raises(ValueError, match="non-empty"):
        pseudonymize(people, [], "s")
    with pytest.raises(ValueError, match="not in frame"):
        pseudonymize(people, ["nope"], "s")
    with pytest.raises(ValueError, match="token_len"):
        pseudonymize(people, ["email"], "s", token_len=4)


def test_k_anonymity_report(spark, people):
    r = k_anonymity_report(people, ["zip", "age"], k=2).collect()[0]
    # groups: (10001,34)x2, (10001,35)x1, (94103,35)x2
    assert r["n_rows"] == 5
    assert r["n_groups"] == 3
    assert r["n_groups_below_k"] == 1
    assert r["rows_below_k"] == 1
    assert r["min_group_size"] == 1
    assert not r["is_k_anonymous"]
    ok = k_anonymity_report(people, ["zip"], k=2).collect()[0]
    assert ok["is_k_anonymous"] and ok["n_groups_below_k"] == 0


def test_small_groups_and_validation(spark, people):
    got = {
        (r["zip"], r["age"]): r["n"]
        for r in small_groups(people, ["zip", "age"], k=2).collect()
    }
    assert got == {("10001", 35): 1}
    with pytest.raises(ValueError, match="k must"):
        small_groups(people, ["zip"], k=0)
    with pytest.raises(ValueError, match="non-empty"):
        k_anonymity_report(people, [], k=2)
