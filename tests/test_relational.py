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
