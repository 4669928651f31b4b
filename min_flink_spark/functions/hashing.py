"""The engine's cross-engine determinism primitive.

Every dedup / sampling / sketch operator derives its randomness from
md5 — bit-identical in Spark, DuckDB, and any other engine — never from
engine-private ``hash()``/``rand()``. This is what makes the oracle
strategy work: the full signature pipelines replay exactly in SQL.

DuckDB twin of ``md5_prefix_int(col, start)``:
``CAST(('0x' || substr(md5(x), start, 8)) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_prefix_int(col: Column, start: int = 1) -> Column:
    """32 bits of md5(col) starting at hex digit ``start`` (1-based),
    as a non-negative bigint."""
    return F.conv(F.substring(F.md5(col), start, 8), 16, 10).cast("bigint")


def hash_bucket(col: Column, buckets: int) -> Column:
    """Deterministic [0, buckets) bucket of any column — THE primitive
    behind reproducible sampling, salting, and ANN seeding. DuckDB twin:
    ``CAST(('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 8)) AS BIGINT) % buckets``."""
    return F.pmod(md5_prefix_int(col.cast("string")), F.lit(buckets))
