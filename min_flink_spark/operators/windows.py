"""Event-time windows: tumbling / sliding / session.

The reference retains only the ``Time`` duration class — every window
operator was trimmed (SURVEY §2.9: only ``FSJ/api/windowing/time/
Time.java`` survives) — so Flink-capability parity means exposing
Spark's native window aggregations. These helpers work identically on
batch DataFrames and Structured Streaming inputs (add
``with_watermark`` first for streaming late-data bounds).

Scale: a window aggregation is ONE hash shuffle on (key, window);
sliding windows replicate each row size/slide times before the shuffle
— keep that ratio small at 100 TB (e.g. 1d/6h = 4×, not 1d/1min).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _flatten(aggregated: DataFrame, struct_col: str, prefix: str) -> DataFrame:
    rest = [c for c in aggregated.columns if c != struct_col]
    return aggregated.select(
        F.col(f"{struct_col}.start").alias(f"{prefix}_start"),
        F.col(f"{struct_col}.end").alias(f"{prefix}_end"),
        *[F.col(c) for c in rest],
    )


def tumble(
    df: DataFrame, ts: str, size: str, keys: list[str] | None = None, *aggs: Column
) -> DataFrame:
    """Fixed, non-overlapping windows of ``size`` over event-time ``ts``."""
    out = df.groupBy(F.window(ts, size), *(keys or [])).agg(*aggs)
    return _flatten(out, "window", "window")


def slide(
    df: DataFrame,
    ts: str,
    size: str,
    step: str,
    keys: list[str] | None = None,
    *aggs: Column,
) -> DataFrame:
    """Overlapping windows of ``size`` advancing every ``step``; each row
    lands in size/step windows."""
    out = df.groupBy(F.window(ts, size, step), *(keys or [])).agg(*aggs)
    return _flatten(out, "window", "window")


def session(
    df: DataFrame,
    ts: str,
    gap: str | Column,
    keys: list[str] | None = None,
    *aggs: Column,
) -> DataFrame:
    """Gap-based session windows: events within ``gap`` of each other
    merge; window end = last event + gap. ``gap`` may be a per-row
    Column expression (DYNAMIC gap — e.g. shorter sessions for
    high-intent event types); sessions merge while event intervals
    [ts, ts+gap(event)) overlap."""
    out = df.groupBy(F.session_window(ts, gap), *(keys or [])).agg(*aggs)
    return _flatten(out, "session_window", "session")


def with_watermark(df: DataFrame, ts: str, delay: str) -> DataFrame:
    """Watermark = event-time bound for state cleanup & late-data drop
    (reference Watermark.java:42-50 — unreachable there; first-class
    here). No-op on batch DataFrames."""
    return df.withWatermark(ts, delay) if df.isStreaming else df


def count_window(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    n: int,
    *aggs: Column,
) -> DataFrame:
    """COUNT-based tumbling windows: per key, consecutive blocks of
    exactly ``n`` rows in ``order_by`` order (the countWindow surface
    of the reference's API family; trimmed there with the rest of the
    window stack). Emits (keys..., window_id, aggs...) — window_id is
    the 0-based block index; the final block may be partial.

    Scale: one shuffle+sort per key (the row_number window), then a
    hash aggregation that reuses the same partitioning — no second
    exchange. Unlike time windows, count windows REQUIRE a total
    per-key order; pass a unique tiebreaker (e.g. an id) in
    ``order_by`` or block assignment is nondeterministic under
    parallelism."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*order_by)
    block = F.floor((F.row_number().over(w) - 1) / n).cast("bigint")
    return (
        df.withColumn("window_id", block)
        .groupBy(*keys, "window_id")
        .agg(*aggs)
    )


def sliding_count_window(
    df: DataFrame,
    keys: list[str],
    order_by: list[str],
    size: int,
    slide: int,
    *aggs: Column,
) -> DataFrame:
    """COUNT-based SLIDING windows — the reference family's
    ``countWindow(size, slide)``: per key, window ``j`` covers rows
    ``[j·slide, j·slide + size)`` in ``order_by`` position, so each row
    lands in up to ``ceil(size/slide)`` windows. Emits
    (keys..., window_id, aggs...) for every window that has ≥1 row;
    trailing windows may be partial, mirroring the tumbling variant.

    Plan: one shuffle+sort for the per-key row_number, then a bounded
    explode (size/slide window ids per row — a constant, not a
    fan-out in the data) and a hash aggregation on the SAME key
    partitioning. Requires a unique tiebreaker in ``order_by`` for
    deterministic block assignment, like count_window."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*order_by)
    # window functions and generators cannot share a projection —
    # materialize the 0-based position first, then explode
    positioned = df.withColumn("_pos", F.row_number().over(w) - 1)
    pos = F.col("_pos")
    # windows containing pos: j in [max(0, ceil((pos-size+1)/slide)), floor(pos/slide)]
    lo = F.greatest(
        F.lit(0).cast("bigint"),
        F.ceil((pos - F.lit(size) + 1) / F.lit(slide)).cast("bigint"),
    )
    hi = F.floor(pos / F.lit(slide)).cast("bigint")
    return (
        positioned.withColumn("window_id", F.explode(F.sequence(lo, hi)))
        .groupBy(*keys, "window_id")
        .agg(*aggs)
    )
