"""Field-expression addressing — the reference's FieldAccessorFactory.

The reference resolves aggregate/key field expressions three ways
(``FieldAccessorFactory.java:52-190``): positional tuple indexes
(``0``/``"f0"``), flat POJO names, and RECURSIVE dotted paths into
nested types (``"user.address.zip"``). Spark-side, flat names map to
columns, positions map through ``df.columns``, and dotted paths map to
struct fields — reading one is ``F.col("a.b")``; replacing one rebuilds
the enclosing struct(s) with ``Column.withField`` from the inside out.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_POSITIONAL = re.compile(r"^f?(\d+)$")


def resolve_field(df: DataFrame, field: str | int) -> str:
    """Normalize a reference-style field expression to a Spark column
    path: ``0``/``"f0"`` → the 0-based top-level column name
    (positional tuple addressing), ``"meta.width"`` stays a dotted
    struct path, a flat name stays itself. Raises on out-of-range
    positions and unknown top-level fields."""
    if isinstance(field, int):
        pos = field
    else:
        m = _POSITIONAL.match(field)
        if m and field not in df.columns:  # a literal column "f0" wins
            pos = int(m.group(1))
        else:
            top = field.split(".", 1)[0]
            if top not in df.columns:
                raise ValueError(
                    f"unknown field {field!r}: no top-level column {top!r} "
                    f"in {df.columns}"
                )
            return field
    if not 0 <= pos < len(df.columns):
        raise ValueError(
            f"positional field {field!r} out of range for {len(df.columns)} columns"
        )
    return df.columns[pos]


def is_nested(path: str) -> bool:
    return "." in path


def with_field_replaced(path: str, value: Column, read_prefix: str = "") -> Column:
    """Column expression for the TOP-LEVEL column of ``path`` with only
    the addressed (possibly deeply nested) field replaced by ``value`` —
    the write half of the reference's field accessor
    (``FieldAccessorFactory.java:52-190`` RecursiveProductFieldAccessor).

    ``path`` 'a.b.c' → ``col('a').withField('b', col('a.b').withField('c', v))``
    built inside-out, so sibling fields at every level survive.
    ``read_prefix`` (e.g. ``'_first.'``) redirects the parent-struct
    reads when the source structs live under another struct column.
    """
    parts = path.split(".")
    if len(parts) == 1:
        return value
    expr = value
    # build from the innermost struct outward
    for depth in range(len(parts) - 1, 0, -1):
        parent = read_prefix + ".".join(parts[:depth])
        expr = F.col(parent).withField(parts[depth], expr)
    return expr


def field_alias(path: str) -> str:
    """Output name Spark gives a projected nested field (last segment)."""
    return path.split(".")[-1]
