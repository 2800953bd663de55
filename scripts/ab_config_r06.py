"""A/B a config variant against the bench session (guide §1): same
query methodology (warm + best-of-3), extra confs from argv.

Usage: python scripts/ab_config_r06.py KEY=VAL [KEY=VAL ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def main():
    confs = [a.split("=", 1) for a in sys.argv[1:] if "=" in a]
    from pyspark.sql import SparkSession

    from hll_spark.session import apply_malloc_tunables, pin_jvm_heap

    builder = pin_jvm_heap(apply_malloc_tunables(SparkSession.builder), "12g")
    builder = (
        builder.master(f"local[{bench.CPUS}]")
        .appName("hll_spark-ab")
        .config("spark.sql.shuffle.partitions", str(bench.CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "64m")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
    )
    for k, v in confs:
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    timings = {}
    for name in bench.BASE_QUERIES:
        qs[name](spark, bench.SF_DIR).collect()
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, bench.SF_DIR).collect()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
    print(json.dumps({"confs": dict(confs), "total": round(sum(timings.values()), 3),
                      "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
