"""Either type mapping — the reference's EitherTypeInfo as a tagged
struct.

The reference ships ``Either<L, R>`` with serializer support
(``flink-core/.../api/java/typeutils/EitherTypeInfo.java``) even though
the trimmed API surface never produces one. Spark has no sum types;
the faithful columnar mapping (SURVEY §1.2) is the tagged struct
``struct<tag: string, left: L, right: R>`` with exactly one non-null
branch — relationally queryable (filter/group by tag), codegen-friendly
(plain struct ops, no UDF), and mechanically reversible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LEFT = "left"
RIGHT = "right"


def either_left(value: Column, right_type: str) -> Column:
    """Left(value): the right branch is a typed NULL so both branches
    keep a stable schema across the union."""
    return F.struct(
        F.lit(LEFT).alias("tag"),
        value.alias("left"),
        F.lit(None).cast(right_type).alias("right"),
    )


def either_right(value: Column, left_type: str) -> Column:
    return F.struct(
        F.lit(RIGHT).alias("tag"),
        F.lit(None).cast(left_type).alias("left"),
        value.alias("right"),
    )


def is_left(either: Column) -> Column:
    return either["tag"] == LEFT


def is_right(either: Column) -> Column:
    return either["tag"] == RIGHT


def get_left(either: Column) -> Column:
    return either["left"]


def get_right(either: Column) -> Column:
    return either["right"]


def union_either(
    left_df: DataFrame,
    right_df: DataFrame,
    left_value: Column,
    right_value: Column,
    left_type: str,
    right_type: str,
    carry: list[str] | None = None,
) -> DataFrame:
    """Merge two differently-typed streams into one Either-typed stream
    (column ``either``), optionally carrying shared columns through —
    the canonical EitherTypeInfo production: one edge, two payload
    types."""
    carry = carry or []
    l = left_df.select(
        *[F.col(c) for c in carry], either_left(left_value, right_type).alias("either")
    )
    r = right_df.select(
        *[F.col(c) for c in carry], either_right(right_value, left_type).alias("either")
    )
    return l.unionByName(r)
