"""Bucketed-table co-located join: pre-shuffled storage eliminates the
exchange at query time — the 100 TB answer to repeated joins on the
same key (pay the shuffle once at write time)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # saveAsTable writes to the default warehouse (cwd/spark-warehouse,
    # gitignored) — spark.sql.warehouse.dir is static config.
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("b_orders")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("b_lineitem")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_exchange(spark, sf_dir, bucketed_tables):
    joined = spark.table("b_orders").join(
        spark.table("b_lineitem"),
        on=F.col("o_orderkey") == F.col("l_orderkey"),
    )
    # defeat broadcast so the co-location is what avoids the shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan  # both sides pre-bucketed on the key

    got = joined.count()
    want = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .join(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
            on=F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert got == want
