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


def _spread_bits16(x: Column) -> Column:
    """Interleave a zero bit after each of the low 16 bits of ``x``
    (the Morton 'part1by1' step) — pure shift/mask codegen."""
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def zorder_key(x: Column, y: Column) -> Column:
    """Morton (Z-order) interleave of two bigint columns, 16 bits each
    → one 32-bit locality key.

    Sorting/range-partitioning a table by ``zorder_key(a, b)`` before
    writing clusters rows that are close in BOTH dimensions into the
    same parquet row groups, so min/max statistics prune scans for
    range predicates on EITHER column — the standard multi-dimensional
    data-skipping layout (cf. Databricks Delta OPTIMIZE ZORDER BY).
    Inputs must already be non-negative and < 2^16 (bucket/normalize
    first — ``hash_bucket(col, 65536)`` or a rank/floor bucket); values
    are masked to 16 bits, NOT validated, because a per-row branch
    would leave codegen.

    DuckDB twin (same shift/mask chain, see queries for the SQL):
    engine-independent integer arithmetic, oracle-replayable.
    """
    m = F.lit(0xFFFF)
    return _spread_bits16(x.bitwiseAND(m)).bitwiseOR(
        F.shiftleft(_spread_bits16(y.bitwiseAND(m)), 1)
    )
