"""Aggregates every query module into the driver-facing registry."""

from min_flink_spark.registry import ORACLE, QUERIES

# Importing a module registers its queries via the @query decorator.
from min_flink_spark.queries import analytics_q  # noqa: F401
from min_flink_spark.queries import core_surface  # noqa: F401
from min_flink_spark.queries import functions_q  # noqa: F401
from min_flink_spark.queries import llm  # noqa: F401
from min_flink_spark.queries import pipeline_q  # noqa: F401
from min_flink_spark.queries import relational  # noqa: F401
from min_flink_spark.queries import streaming_q  # noqa: F401
from min_flink_spark.queries import windows  # noqa: F401

__all__ = ["ORACLE", "QUERIES"]
