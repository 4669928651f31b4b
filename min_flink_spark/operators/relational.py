"""Relational operators beyond the reference's surface.

The reference has no joins/sorts/set-ops at all (SURVEY §2.5 —
``DataStream.java:42-314`` is the complete API), so these are the
generalized "Flink-capability" surface, specified by ANSI-SQL semantics
and oracle-checked. Each helper is a declarative DataFrame rewrite so
Catalyst picks the physical strategy; the scale notes on each function
are the design contract for the 100 TB target.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_join(
    fact: DataFrame, dim: DataFrame, on: list[str] | Column, how: str = "inner"
) -> DataFrame:
    """Join with an explicit broadcast hint on the dimension side.

    At 100 TB the fact side must never shuffle for a small-dim join;
    ``F.broadcast`` pins the hash-build side regardless of stale stats.
    """
    return fact.join(F.broadcast(dim), on=on, how=how)


def top_k(
    df: DataFrame,
    k: int,
    order_by: list[Column],
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Top-k rows, optionally per group.

    Per-group: one hash shuffle + per-partition sort (row_number) — no
    global sort. Global: Spark's sort-limit pushes the limit into each
    partition (TakeOrderedAndProject), so only k rows per partition
    reach the driver-side merge; pass a deterministic tie-break column
    in ``order_by`` or equal-valued rows make the cut arbitrarily.
    """
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*order_by)
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )
    return df.orderBy(*order_by).limit(k)


def distinct_rows(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    return (df.select(*cols) if cols else df).distinct()


def global_index(
    df: DataFrame,
    order_by: list[Column],
    index_col: str = "pos",
    num_partitions: int | None = None,
) -> DataFrame:
    """Assign each row its 1-based position in the TOTAL order given by
    ``order_by`` (callers must make the key unique — add an id tiebreak)
    without ever funneling data through one task.

    A naive ``row_number() OVER (ORDER BY ...)`` collapses the whole
    dataset into a single window partition — the canonical scale-killer
    for epoch shuffling at 100 TB. Instead:

      1. range-partition + sort within partitions on the key
         (the same machinery as a distributed ORDER BY),
      2. count rows per partition — only ``num_partitions`` longs cross
         to the driver, never data,
      3. add ``cumulative_offset[pid] + local_running_count`` per
         partition in one Arrow ``mapInPandas`` pass (narrow, preserves
         the sorted partition order).

    The result is identical to the single-partition ``row_number`` (the
    oracle replays exactly that) at O(rows/partitions) peak memory.

    Block lifetime: the checkpoint blocks belong to the INTERNAL ranged
    frame, not the returned DataFrame — ``.unpersist()`` on the result
    is a no-op. The backing frame is exposed as
    ``result._graft_backing``: in a per-epoch loop call
    ``result._graft_backing.unpersist()`` after consuming each epoch to
    free its blocks deterministically; otherwise they are freed only
    when the result's last reference drops and the ContextCleaner runs.
    Holding N epochs' results alive pins N copies.
    """
    spark = df.sparkSession
    n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        df.repartitionByRange(n, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("_pid", F.spark_partition_id())
        # materialize once: the per-partition counts and the index pass
        # would otherwise each re-run the range shuffle
        .localCheckpoint(eager=True)
    )
    counts = {
        r["_pid"]: r["c"]
        for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_schema = ranged.drop("_pid").schema.add(index_col, "long")
    out_cols = [f.name for f in out_schema.fields]

    def _index(batches):
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            base = offsets[int(pdf["_pid"].iloc[0])]
            pdf = pdf.drop(columns=["_pid"])
            pdf[index_col] = range(base + seen + 1, base + seen + 1 + len(pdf))
            seen += len(pdf)
            yield pdf[out_cols]

    out = ranged.mapInPandas(_index, schema=out_schema)
    out._graft_backing = ranged  # for deterministic block release (see docstring)
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    strict: bool = False,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_ts <= left_ts`` (``<`` when ``strict``) per key.

    Implemented as union → single co-partitioned window sort →
    last-non-null carry-forward, i.e. ONE shuffle on the key, linear in
    |left|+|right|. Never a range cross-join (which explodes at scale);
    equivalent to DuckDB's native ASOF JOIN used as the oracle.
    """
    lcols = left.columns
    payload = F.struct(*[F.col(c) for c in right_values])
    # Right rows sort before left rows at equal timestamp so that a
    # right row at exactly left_ts is visible (non-strict semantics);
    # strict flips the tag order.
    right_tag, left_tag = (1, 0) if strict else (0, 1)
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_ts"),
        F.lit(right_tag).alias("_side"),
        payload.alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
    )
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_ts"),
        F.lit(left_tag).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c) for c in lcols if c not in on],
    )
    # _payload as the third sort key: right rows tied on (key, _ts)
    # would otherwise order arbitrarily, making the carried payload
    # nondeterministic (run-to-run AND vs the oracle). Left rows all
    # have a null payload, so their relative order stays irrelevant.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_ts"), F.col("_side"), F.col("_payload").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).withColumn(
        "_matched", F.last(F.col("_payload"), ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == left_tag).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"_matched.{v}").alias(f"r_{v}") for v in right_values],
    )
    return out
