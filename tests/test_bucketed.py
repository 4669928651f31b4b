"""Bucketed-table co-located joins via the public API (write_bucketed /
read_bucketed / cobucket_join); tests/test_bucketing.py covers the raw
fact-vs-fact writer path.

The plan assertions are the point: a bucketed fact⋈fact join must scan
both sides WITHOUT an Exchange (the shuffle was paid at write time),
and a groupBy on the bucket key must aggregate without one either.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from min_flink_spark.sources.bucketed import (
    cobucket_join,
    read_bucketed,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_pair(spark, sf_dir):
    """orders + a per-order lineitem rollup, both bucketed by orderkey."""
    warehouse = tempfile.mkdtemp(prefix="graft-bucketed-")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    items = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    write_bucketed(
        orders, "b3_orders", ["o_orderkey"], 8, path=f"{warehouse}/b3_orders"
    )
    write_bucketed(
        items, "b3_items", ["l_orderkey"], 8, path=f"{warehouse}/b3_items"
    )
    yield "b3_orders", "b3_items"
    spark.sql("DROP TABLE IF EXISTS b3_orders")
    spark.sql("DROP TABLE IF EXISTS b3_items")
    shutil.rmtree(warehouse, ignore_errors=True)


def test_cobucket_join_has_no_exchange(spark, bucketed_pair):
    left, right = bucketed_pair
    # force the join shape a 100 TB fact⋈fact sees (no broadcast escape)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, left).join(
            read_bucketed(spark, right),
            on=F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # correctness: same result as the direct (shuffling) join
        n = joined.count()
        assert n == read_bucketed(spark, right).count()  # every rollup matches
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucket_key_aggregation_has_no_exchange(spark, bucketed_pair):
    left, _ = bucketed_pair
    agg = (
        read_bucketed(spark, left)
        .groupBy("o_orderkey")
        .agg(F.sum("o_totalprice").alias("t"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_cobucket_join_helper_matches_plain_join(spark, sf_dir, bucketed_pair):
    left, right = bucketed_pair
    got = {
        (r["o_orderkey"], r["n_items"])
        for r in cobucket_join(
            spark, left, right, on=[F.col("o_orderkey") == F.col("l_orderkey")]
        ).collect()
    }
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    items = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_items"))
    )
    expected = {
        (r["o_orderkey"], r["n_items"])
        for r in orders.join(
            items, on=F.col("o_orderkey") == F.col("l_orderkey")
        ).collect()
    }
    assert got == expected


def test_write_bucketed_rejects_bad_bucket_count(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    with pytest.raises(ValueError, match="num_buckets"):
        write_bucketed(df, "b_bad", ["o_orderkey"], 0)
