"""Structured Streaming stateful sketch tests (file source, availableNow)."""

import numpy as np
import pandas as pd
import pytest

from hll_spark.sketchlib.hll import HllConfig
from hll_spark.streaming.stateful import streaming_hll_distinct, windowed_hll_distinct

CFG = HllConfig(log2m=14, regwidth=5)


def run_stream(spark, src_dir, ckpt_dir, build_query, out_dir):
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema("user_id long, event_type string, ts timestamp")
        .parquet(src_dir)
    )
    out = build_query(stream)

    def sink(bdf, bid):
        bdf.withColumn("batch_id", F.lit(bid)).write.mode("append").parquet(out_dir)

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # latest emitted row per key wins (update-mode semantics)
    all_rows = spark.read.parquet(out_dir).toPandas()
    return (
        all_rows.sort_values("batch_id")
        .groupby("key", as_index=False)
        .last()
    )


def test_streaming_distinct_incremental(spark, tmp_path):
    rng = np.random.default_rng(0)
    src = str(tmp_path / "src")
    pdf1 = pd.DataFrame(
        {
            "user_id": rng.integers(0, 300, 2000),
            "event_type": rng.choice(["a", "b"], 2000),
            "ts": pd.Timestamp("2024-01-01"),
        }
    )
    spark.createDataFrame(pdf1).write.mode("append").parquet(src)

    result = run_stream(
        spark,
        src,
        str(tmp_path / "ck1"),
        lambda s: streaming_hll_distinct(s, "user_id", "event_type", CFG),
        str(tmp_path / "out1"),
    )
    got = result.set_index("key")["distinct_estimate"].to_dict()
    exact = pdf1.groupby("event_type")["user_id"].nunique().to_dict()
    assert got == exact  # explicit tier -> exact

    # second micro-batch: state carries over, counts grow incrementally
    pdf2 = pd.DataFrame(
        {
            "user_id": rng.integers(300, 500, 1000),
            "event_type": ["a"] * 1000,
            "ts": pd.Timestamp("2024-01-01"),
        }
    )
    spark.createDataFrame(pdf2).write.mode("append").parquet(src)
    result2 = run_stream(
        spark,
        src,
        str(tmp_path / "ck1"),
        lambda s: streaming_hll_distinct(s, "user_id", "event_type", CFG),
        str(tmp_path / "out1"),
    )
    both = pd.concat([pdf1, pdf2])
    exact2 = both.groupby("event_type")["user_id"].nunique().to_dict()
    got2 = result2.set_index("key")["distinct_estimate"].to_dict()
    assert got2["a"] == exact2["a"]


def test_windowed_distinct_with_watermark(spark, tmp_path):
    rng = np.random.default_rng(1)
    src = str(tmp_path / "wsrc")
    ts = pd.Timestamp("2024-01-01 00:00:00") + pd.to_timedelta(
        rng.integers(0, 3 * 3600, 3000), unit="s"
    )
    pdf = pd.DataFrame(
        {
            "user_id": rng.integers(0, 400, 3000),
            "event_type": ["x"] * 3000,
            "ts": ts,
        }
    )
    spark.createDataFrame(pdf).write.mode("append").parquet(src)
    result = run_stream(
        spark,
        src,
        str(tmp_path / "ck2"),
        lambda s: windowed_hll_distinct(s, "user_id", "ts", "1 hour", "2 hours", CFG),
        str(tmp_path / "wout"),
    )
    pdf["win"] = pdf["ts"].dt.floor("h").astype(str)
    exact = pdf.groupby("win")["user_id"].nunique()
    got = result.set_index("key")["distinct_estimate"]
    assert len(got) == len(exact)
    for win, n in exact.items():
        assert got[win] == n, win
