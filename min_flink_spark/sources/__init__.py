"""Bounded sources (reference §2.1) + the driver's testdata tables.

The reference ships exactly one source (``FromElementsFunction.java:14``)
— everything else here (parquet with predicate pushdown, multi-format
readers) is the generalized surface a Spark-first engine gets for free.
Streaming sources live in ``min_flink_spark.streaming``.
"""

from __future__ import annotations

import os
from collections.abc import Iterable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from min_flink_spark.core import stream as _stream

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def from_elements(spark: SparkSession, data: Iterable[Any], schema: Any = None) -> "_stream.Stream":
    return _stream.Stream(spark.createDataFrame(list(data), schema=schema))


def read_parquet(spark: SparkSession, path: str) -> "_stream.Stream":
    return _stream.Stream(spark.read.parquet(path))


def read_table(spark: SparkSession, sf_dir: str, name: str) -> "_stream.Stream":
    return _stream.Stream(load_table(spark, sf_dir, name))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, names: Iterable[str] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: Iterable[str] = TABLES) -> None:
    """Register the testdata tables as temp views for spark.sql use."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def read_csv(
    spark: SparkSession, path: str, schema: Any = None, header: bool = True, **options
) -> "_stream.Stream":
    """CSV source. Always pass a schema in production — inference scans
    the data twice, and at 100 TB that is a full extra pass."""
    r = spark.read.option("header", str(header).lower())
    for k, v in options.items():
        r = r.option(k, v)
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    return _stream.Stream(r.csv(path))


def read_json(
    spark: SparkSession, path: str, schema: Any = None, **options
) -> "_stream.Stream":
    """JSON-lines source; same schema-first contract as read_csv."""
    r = spark.read
    for k, v in options.items():
        r = r.option(k, v)
    if schema is not None:
        r = r.schema(schema)
    return _stream.Stream(r.json(path))


def read_orc(spark: SparkSession, path: str) -> "_stream.Stream":
    return _stream.Stream(spark.read.orc(path))
