"""Hive-style partition layout: static pruning and dynamic partition
pruning (DPP) must both reach the scan — at 100 TB these decide whether
a date-bounded query reads 1 day or 10 years."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from min_flink_spark.sources import write_partitioned


@pytest.fixture(scope="module")
def part_events(spark, sf_dir):
    d = tempfile.mkdtemp(prefix="graft-part-")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "day", F.to_date("ts")
    )
    write_partitioned(ev, f"{d}/events", ["day"])
    yield f"{d}/events"
    shutil.rmtree(d, ignore_errors=True)


def test_static_partition_pruning_reaches_scan(spark, part_events):
    ev = spark.read.parquet(part_events)
    one_day = ev.filter(F.col("day") == "2024-01-05")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # the day filter must land in PartitionFilters (directory pruning),
    # NOT in PushedFilters (row-level) and NOT as a post-scan Filter
    assert "PartitionFilters: [" in plan
    assert "isnotnull(day" in plan
    # correctness: pruned read equals full-scan filter
    full = spark.read.parquet(part_events).collect()
    want = [r for r in full if str(r["day"]) == "2024-01-05"]
    assert one_day.count() == len(want) > 0


def test_dynamic_partition_pruning_fires_on_dim_join(spark, part_events):
    """Fact partitioned by day ⋈ dim filtered to 3 days: Spark must
    insert a dynamicpruning subquery on the fact's partition column so
    only the 3 matching directories are read at runtime."""
    ev = spark.read.parquet(part_events)
    dim = (
        spark.createDataFrame(
            [("2024-01-05", "a"), ("2024-01-06", "b"), ("2024-01-07", "c"),
             ("2024-01-08", "zz"), ("2024-01-09", "zz")],
            "d string, tag string",
        )
        .select(F.col("d").cast("date").alias("d"), "tag")
        # DPP's heuristic wants a SELECTIVE predicate on the dim side —
        # an unfiltered dim is assumed non-pruning
        .filter(F.col("tag") != "zz")
    )
    joined = ev.join(dim, ev["day"] == dim["d"]).groupBy("tag").count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    got = {r["tag"]: r["count"] for r in joined.collect()}
    # correctness vs unpartitioned-source join
    raw = (
        spark.read.parquet(part_events)
        .join(dim, F.col("day") == F.col("d"))
        .groupBy("tag")
        .count()
    )
    assert got == {r["tag"]: r["count"] for r in raw.collect()}
    assert sum(got.values()) > 0
