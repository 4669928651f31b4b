"""Skew mitigation: salted two-phase aggregation and salted joins.

AQE's skew-join splitting handles most skew at runtime, but a hot KEY
in an aggregation (one key = 30% of all rows) still funnels into one
reducer. Salting splits each key into ``salts`` sub-keys for the
partial aggregate, then combines partials in a second (tiny) agg —
classic two-phase rebalancing, results bit-equal to the direct plan
for decomposable aggregates (sum/count/min/max).

The salt is md5-derived from a stable column (NOT rand()): identical
results on retry/replay, which matters for exactly-once sinks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from min_flink_spark.functions.hashing import hash_bucket

_PARTIAL = {
    "sum": F.sum,
    "count": F.count,
    "min": F.min,
    "max": F.max,
}
_COMBINE = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing partial counts
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_col: Column,
    salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: groupBy(keys + salt) → groupBy(keys).

    ``aggs`` maps output name → (op, column); ``salt_col`` is any
    stable, roughly-uniform column (e.g. the row's id). Decomposable
    ops only — avg must be expressed as sum/count by the caller.
    """
    salt = hash_bucket(salt_col, salts).alias("_salt")
    partial = df.groupBy(*[F.col(k) for k in keys], salt).agg(
        *[_PARTIAL[op](col).alias(name) for name, (op, col) in aggs.items()]
    )
    return partial.groupBy(*[F.col(k) for k in keys]).agg(
        *[_COMBINE[op](name).alias(name) for name, (op, _) in aggs.items()]
    )
