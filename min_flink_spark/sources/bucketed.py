"""Bucketed tables: shuffle-free co-located joins and aggregations.

The single biggest cost of a 100 TB fact⋈fact join is the shuffle of
both sides. Bucketing pays that shuffle ONCE at write time: rows are
hash-clustered into ``num_buckets`` files per side using Spark's own
join-hash function, so any later equi-join or aggregation on the bucket
key reads co-located partitions and skips the Exchange entirely — the
plan goes straight to (optionally sort-free) SortMergeJoin over the
bucketed scans. This is the "pre-partition the join" technique the
reference can't express at all (its KeyGroupStreamPartitioner.java:32-56
re-partitions per job); a table format makes it durable.

Contract for shuffle-free joins (all three must match on both sides):
  1. same bucket columns (and join ON exactly those columns),
  2. same ``num_buckets``,
  3. bucketed scans enabled (``spark.sql.sources.bucketing.enabled``,
     on by default).
``sort_cols == bucket_cols`` additionally removes the per-partition
sort before a SortMergeJoin (file-level sort order is recorded in the
catalog).

Sizing at scale: pick ``num_buckets`` so one bucket of the LARGER side
is ~128-512 MB (bucket count is fixed at write time — too few buckets
caps join parallelism, too many makes small files). Buckets also bound
aggregation memory: a groupBy on the bucket key runs map-side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed parquet table in the session catalog.

    ``sort_cols`` defaults to ``bucket_cols`` so downstream sort-merge
    joins on the bucket key skip their sort as well as their shuffle.
    ``path`` makes it an external table (data survives catalog drop).
    """
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")
    w = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table back; the catalog carries the bucket spec,
    so joins/aggs on the bucket key plan without an Exchange."""
    return spark.table(name)


def cobucket_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key — the zero-
    shuffle fact⋈fact path. Callers are responsible for having written
    both sides with identical bucket specs (see module docstring);
    Spark falls back to a plain shuffle join when the specs differ, so
    the result is always correct — assert the plan in tests when the
    shuffle-free property is load-bearing."""
    return read_bucketed(spark, left_name).join(
        read_bucketed(spark, right_name), on=on, how=how
    )
