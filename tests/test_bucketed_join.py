"""Bucketed co-located joins: the write-time lever that removes the
join shuffle entirely (SURVEY §2.2 joins row / 100 TB design)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from hll_spark.sources.tables import write_bucketed_table


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed_table(
        orders, "orders_b", ["o_orderkey"], n_buckets=8, sort_by=["o_orderkey"]
    )
    write_bucketed_table(
        lineitem, "lineitem_b", ["l_orderkey"], n_buckets=8, sort_by=["l_orderkey"]
    )
    a = spark.table("orders_b")
    b = spark.table("lineitem_b")
    # disable broadcast so the small test tables take the same SMJ path
    # a 100 TB fact-fact join would
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, a.o_orderkey == b.l_orderkey).groupBy(
            "o_orderdate"
        ).agg(F.count("*").alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # no shuffle on either join input: bucketing pre-co-located them
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        # correctness: same row count as the plain-parquet join
        n_bucketed = joined.agg(F.sum("n")).collect()[0][0]
        plain = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert n_bucketed == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
