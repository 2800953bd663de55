"""Skew handling evidence: AQE splits a skewed join partition at
runtime (complementing the salted-repartition path in agg.py —
BENCH/BASELINE.md §2 skew story)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    # one hot key carrying ~85% of the fact rows; thresholds lowered so
    # the test-sized data trips the same machinery a 100 TB skew would
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.5",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        n = 400_000
        rng = np.random.default_rng(0)
        keys = np.where(rng.random(n) < 0.85, 7, rng.integers(0, 5000, n))
        pads = [
            bytes(rng.integers(0, 256, 48, dtype=np.uint8)).hex()
            for _ in range(256)
        ]
        fact = spark.createDataFrame(
            pd.DataFrame(
                {"k": keys, "pad": [pads[i % 256] + str(i) for i in range(n)]}
            )
        ).repartition(8)
        dim = spark.createDataFrame(
            pd.DataFrame({"k": range(5001), "v": range(5001)})
        )
        joined = fact.join(dim, "k")
        rows = joined.collect()  # executes joined's own query execution
        assert len(rows) == n
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not mark the skewed join"
        assert "skewed" in plan.split("AQEShuffleRead")[1][:40]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
