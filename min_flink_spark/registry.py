"""Query registry shared by all query modules.

Every operator exposed to the driver's oracle gate registers here via
``@query(name, oracle_sql)``. Column names must be aliased identically
in the Spark plan and the oracle SQL (driver compares by sorted column
name). ``oracle=None`` → rows-only check (non-SQL-expressible op).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
