"""Connected components, approximate-aggregate error bounds, pivot."""

from pyspark.sql import functions as F

from min_flink_spark.operators.graph import connected_components


def test_connected_components_basic(spark):
    # two components: {1,2,3,4} (chain) and {10,11}; 20-21-22 triangle
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a bigint, doc_b bigint",
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_long_chain(spark):
    """Label propagation must cross a diameter-8 path (several rounds)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 108)], "doc_a bigint, doc_b bigint"
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert set(got.values()) == {100} and len(got) == 9


def test_approx_count_distinct_error_bound(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = ev.agg(F.countDistinct("user_id")).first()[0]
    approx = ev.agg(F.approx_count_distinct("user_id", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.1  # 2% rsd target, 10% guard


def test_approx_percentile_near_exact(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = ev.agg(F.expr("percentile(value, 0.5)")).first()[0]
    approx = ev.agg(F.expr("approx_percentile(value, 0.5, 1000)")).first()[0]
    assert abs(approx - exact) <= 0.05 * (abs(exact) + 1)


def test_pivot_row_sums_match_counts(spark, sf_dir):
    from min_flink_spark.queries.analytics_q import EVENT_TYPES, q_pivot

    piv = q_pivot(spark, sf_dir)
    total = piv.select(
        sum([F.col(t) for t in EVENT_TYPES], F.lit(0)).alias("s")
    ).agg(F.sum("s")).first()[0]
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert total == n_events
