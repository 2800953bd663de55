"""as-of join + sessionization unit tests (operators/relational.py)."""

import pandas as pd
import pytest

from hll_spark.operators.relational import asof_join, session_counts, sessionize


@pytest.fixture(scope="module")
def trades_quotes(spark):
    quotes = pd.DataFrame(
        {
            "sym": ["A", "A", "A", "B"],
            "qts": pd.to_datetime(
                ["2024-01-01 09:00", "2024-01-01 10:00", "2024-01-01 11:00",
                 "2024-01-01 09:30"]
            ),
            "bid": [10.0, 11.0, 12.0, 50.0],
        }
    )
    trades = pd.DataFrame(
        {
            "sym": ["A", "A", "A", "B", "B"],
            "tts": pd.to_datetime(
                ["2024-01-01 08:30", "2024-01-01 10:00", "2024-01-01 10:30",
                 "2024-01-01 09:29", "2024-01-01 12:00"]
            ),
            "qty": [1, 2, 3, 4, 5],
        }
    )
    return spark.createDataFrame(trades), spark.createDataFrame(quotes)


def test_asof_join_semantics(spark, trades_quotes):
    trades, quotes = trades_quotes
    out = asof_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts",
        right_cols=["bid"],
    ).toPandas()
    got = {
        (r.sym, str(r.tts)): (r.asof_bid if pd.notna(r.asof_bid) else None)
        for r in out.itertuples()
    }
    assert got[("A", "2024-01-01 08:30:00")] is None  # before any quote
    assert got[("A", "2024-01-01 10:00:00")] == 11.0  # inclusive at equal ts
    assert got[("A", "2024-01-01 10:30:00")] == 11.0
    assert got[("B", "2024-01-01 09:29:00")] is None
    assert got[("B", "2024-01-01 12:00:00")] == 50.0
    assert len(out) == 5  # every left row survives


def test_sessionize(spark):
    pdf = pd.DataFrame(
        {
            "u": ["x"] * 4 + ["y"] * 2,
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00", "2024-01-01 00:30",  # session 0
                    "2024-01-01 02:00",                        # session 1 (gap>1h)
                    "2024-01-01 02:59",                        # session 1
                    "2024-01-01 00:00", "2024-01-02 00:00",   # y: 0, 1
                ]
            ),
        }
    )
    df = spark.createDataFrame(pdf)
    s = sessionize(df, "u", "ts", gap_seconds=3600).toPandas()
    x = s[s.u == "x"].sort_values("ts")["session_id"].tolist()
    assert x == [0, 0, 1, 1]
    counts = {
        r["u"]: r["n_sessions"]
        for r in session_counts(df, "u", "ts", 3600).collect()
    }
    assert counts == {"x": 2, "y": 2}


def test_asof_join_carries_whole_row_not_per_column(spark):
    """A NULL field in the latest matching right row must stay NULL —
    per-column last(ignorenulls) would back-fill it from an older right
    row, mixing two right rows into one output (ADVICE round 1)."""
    quotes = pd.DataFrame(
        {
            "sym": ["A", "A"],
            "qts": pd.to_datetime(["2024-01-01 09:00", "2024-01-01 10:00"]),
            "bid": [10.0, None],   # latest quote has NULL bid
            "ask": [11.0, 12.5],
        }
    )
    trades = pd.DataFrame(
        {
            "sym": ["A"],
            "tts": pd.to_datetime(["2024-01-01 10:30"]),
            "qty": [1],
        }
    )
    out = asof_join(
        spark.createDataFrame(trades),
        spark.createDataFrame(quotes),
        on="sym", left_ts="tts", right_ts="qts",
        right_cols=["bid", "ask"],
    ).toPandas()
    assert len(out) == 1
    row = out.iloc[0]
    assert str(row.asof_qts) == "2024-01-01 10:00:00"
    assert pd.isna(row.asof_bid)      # NOT back-filled to 10.0
    assert row.asof_ask == 12.5


def test_asof_join_ignores_null_right_ts(spark):
    quotes = pd.DataFrame(
        {
            "sym": ["A", "A"],
            "qts": pd.to_datetime(["2024-01-01 09:00", pd.NaT]),
            "bid": [10.0, 99.0],
        }
    )
    trades = pd.DataFrame(
        {"sym": ["A"], "tts": pd.to_datetime(["2024-01-01 10:00"]), "qty": [1]}
    )
    out = asof_join(
        spark.createDataFrame(trades),
        spark.createDataFrame(quotes),
        on="sym", left_ts="tts", right_ts="qts", right_cols=["bid"],
    ).toPandas()
    assert out.iloc[0].asof_bid == 10.0  # the NULL-ts quote never matches


def test_consistent_sample_properties(spark):
    from pyspark.sql import functions as F

    from hll_spark.operators.relational import consistent_sample

    users = spark.range(0, 50_000).withColumnRenamed("id", "user_id")
    events = (
        spark.range(0, 200_000)
        .withColumn("user_id", (F.col("id") % 50_000))
        .withColumnRenamed("id", "event_id")
    )
    su = consistent_sample(users, "user_id", 0.1)
    n = su.count()
    assert abs(n / 50_000 - 0.1) < 0.01  # fraction accuracy
    # determinism across partitionings
    n2 = consistent_sample(users.repartition(17), "user_id", 0.1).count()
    assert n2 == n
    # cross-table consistency: sampled events' users == sampled users
    se = consistent_sample(events, "user_id", 0.1)
    assert se.count() == 4 * n  # each user has exactly 4 events
    diff = se.select("user_id").distinct().exceptAll(su.select("user_id"))
    assert diff.count() == 0
    # nesting: a 5% sample is a subset of the 10% sample (same seed)
    s5 = consistent_sample(users, "user_id", 0.05)
    assert s5.exceptAll(su).count() == 0
