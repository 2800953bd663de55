"""spark-submit entry point for the flagship distinct-url job.

Cluster usage (north_star deployment shape):

    python scripts/package_pyfiles.py            # -> dist/hll_spark.zip
    spark-submit \
      --py-files dist/hll_spark.zip \
      --conf spark.sql.adaptive.enabled=true \
      --conf spark.sql.shuffle.partitions=<2-3x total cores> \
      scripts/submit_flagship.py \
      --input <iceberg-table-or-parquet-path> \
      --checkpoint <checkpoint-root> --job-id <id> [--by lang]

Reads the pages table, builds the distinct-url HLL (p=14) with a durable
level-0 checkpoint (resume = rerun the same command), prints estimates.
"""

import argparse

from pyspark.sql import SparkSession, functions as F

from hll_spark.operators.agg import hll_estimate_udf, hll_spec
from hll_spark.plans.checkpoint import CheckpointStore, checkpointed_sketch_aggregate
from hll_spark.sketchlib.hll import HllConfig


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--job-id", required=True)
    ap.add_argument("--column", default="url")
    ap.add_argument(
        "--extract",
        action="store_true",
        help="sketch distinct EXTRACTED text: run the Arrow extraction "
        "kernel over the html column first (narrow map, same stage "
        "chain, same checkpoint/resume semantics) and sketch the result",
    )
    ap.add_argument("--by", default=None, help="optional group column")
    ap.add_argument("--log2m", type=int, default=14)
    ap.add_argument("--regwidth", type=int, default=5)
    args = ap.parse_args()

    from hll_spark.session import apply_malloc_tunables

    spark = (
        apply_malloc_tunables(SparkSession.builder)
        .appName("hll-flagship")
        .getOrCreate()
    )
    try:
        # catalog table unless it looks like a filesystem path
        if "/" in args.input or args.input.endswith(".parquet"):
            df = spark.read.parquet(args.input)
        else:
            df = spark.read.table(args.input)
    except Exception as exc:  # one-line operator-facing error
        print(f"error: cannot read input '{args.input}': {exc}", flush=True)
        spark.stop()
        raise SystemExit(2)

    cfg = HllConfig(log2m=args.log2m, regwidth=args.regwidth)
    column = args.column
    if args.extract:
        from hll_spark.operators.extract import extract_pages

        df = extract_pages(df, "html", "__etext", engine="arrow")
        column = "__etext"
    store = CheckpointStore(spark, args.checkpoint)
    sketches = checkpointed_sketch_aggregate(
        df,
        column,
        hll_spec(cfg),
        store,
        args.job_id,
        by=[args.by] if args.by else None,
    )
    est = hll_estimate_udf()
    out = sketches.withColumn("estimate", est(F.col("sketch"))).drop("sketch")
    for row in out.collect():
        print(row.asDict())
    spark.stop()


if __name__ == "__main__":
    main()
