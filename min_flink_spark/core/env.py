"""StreamExecutionEnvironment — source construction entry point.

Facade over the reference's environment (reference
``FSJ/api/environment/StreamExecutionEnvironment.java:159-204``:
fromElements / fromCollection / addSource / execute). In Spark the
"execute" step is implicit (actions trigger jobs), so ``execute()`` is
kept only as a no-op for API familiarity.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

from pyspark.sql import SparkSession

from min_flink_spark.core.stream import Stream
from min_flink_spark.sources import from_elements, read_table


class StreamExecutionEnvironment:
    def __init__(self, spark: SparkSession):
        self.spark = spark

    @classmethod
    def get_execution_environment(cls, spark: SparkSession | None = None) -> "StreamExecutionEnvironment":
        from min_flink_spark.session import get_spark

        return cls(spark or get_spark())

    def from_elements(self, data: Iterable[Any], schema: Any = None) -> Stream:
        """Bounded in-memory source (StreamExecutionEnvironment.java:159)."""
        return from_elements(self.spark, data, schema)

    def from_collection(self, data: Iterable[Any], schema: Any = None) -> Stream:
        return self.from_elements(data, schema)

    def read_table(self, sf_dir: str, name: str) -> Stream:
        """Parquet table source with pushdown/pruning intact."""
        return read_table(self.spark, sf_dir, name)

    def add_source(self, fn) -> Stream:
        """Custom source (StreamExecutionEnvironment.java:189
        ``addSource(SourceFunction)`` analog): ``fn(spark) -> DataFrame``
        builds whatever frame it wants; the engine wraps it."""
        return Stream(fn(self.spark))

    def sql(self, query: str) -> Stream:
        """SQL entry point over registered views (sources.register_views)
        — the reference has no SQL at all; on Spark the full ANSI surface
        is part of the engine."""
        return Stream(self.spark.sql(query))

    def set_parallelism(self, n: int) -> "StreamExecutionEnvironment":
        self.spark.conf.set("spark.sql.shuffle.partitions", str(n))
        return self

    def execute(self, job_name: str = "job") -> None:
        """No-op: Spark actions execute eagerly at the sink."""
        return None
