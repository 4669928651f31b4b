"""Event-time window queries over the events table, oracle-checked.

DuckDB oracles: tumbling = time_bucket; sliding = slide-enumeration via
generate_series (valid because size is a multiple of step); session =
gaps-and-islands (boundary flag → cumulative session id → group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from min_flink_spark.operators.windows import session, slide, tumble
from min_flink_spark.registry import query
from min_flink_spark.sources import load_table


@query(
    "tumbling_window_daily",
    oracle="""
    SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
           time_bucket(INTERVAL '1 day', ts) + INTERVAL '1 day' AS window_end,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumble(
        load_table(spark, sf_dir, "events"),
        "ts",
        "1 day",
        ["event_type"],
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("total_value"),
    )


@query(
    "sliding_window_1d_6h",
    oracle="""
    SELECT time_bucket(INTERVAL '6 hours', ts) - i * INTERVAL '6 hours' AS window_start,
           time_bucket(INTERVAL '6 hours', ts) - i * INTERVAL '6 hours'
             + INTERVAL '1 day' AS window_end,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value
    FROM events CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) g
    GROUP BY 1, 2
    """,
)
def q_slide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-day windows every 6h → each event replicated 4×, then one hash
    shuffle; the replication factor (size/step) is the scale knob."""
    return slide(
        load_table(spark, sf_dir, "events"),
        "ts",
        "1 day",
        "6 hours",
        None,
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("total_value"),
    )


@query(
    "session_window_4h",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER w <= INTERVAL '4 hours' THEN 0 ELSE 1 END AS new_session
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT min(ts) AS session_start,
           max(ts) + INTERVAL '4 hours' AS session_end,
           user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value
    FROM numbered GROUP BY user_id, session_id
    """,
)
def q_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session(
        load_table(spark, sf_dir, "events"),
        "ts",
        "4 hours",
        ["user_id"],
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("total_value"),
    )


@query(
    "session_window_dynamic_gap",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN event_type = 'purchase' THEN INTERVAL 2 HOUR
                  ELSE INTERVAL 4 HOUR END AS gap
      FROM events
    ),
    flagged AS (
      SELECT user_id, ts, value, gap,
             CASE WHEN ts > max(ts + gap) OVER
                    (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR max(ts + gap) OVER
                    (PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM g
    ),
    numbered AS (
      SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT min(ts) AS session_start,
           max(ts + gap) AS session_end,
           user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value
    FROM numbered GROUP BY user_id, session_id
    """,
)
def q_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC-gap session windows: purchases close a session after 2 h,
    everything else after 4 h — the per-row gap expression the static
    reference trim can't express at all. Sessions merge while the
    per-event intervals [ts, ts+gap) overlap; the oracle replays the
    merge as gaps-and-islands over a running max of interval ends."""
    ev = load_table(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "purchase", F.lit("2 hours")).otherwise(
        F.lit("4 hours")
    )
    return session(
        ev,
        "ts",
        gap,
        ["user_id"],
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("total_value"),
    )


@query(
    "resample_1h_forward_fill",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts,
             CAST(round(value * 1000000) AS BIGINT) AS v_u
      FROM events WHERE user_id < 20
    ),
    hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour,
             CAST(sum(v_u) AS BIGINT) AS v_u
      FROM ev GROUP BY 1, 2
    ),
    bounds AS (
      SELECT user_id, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY 1
    ),
    spine AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS hour
      FROM bounds
    ),
    joined AS (
      SELECT s.user_id, s.hour, h.v_u,
             CASE WHEN h.v_u IS NOT NULL THEN 1 ELSE 0 END AS observed
      FROM spine s LEFT JOIN hourly h
        ON s.user_id = h.user_id AND s.hour = h.hour
    )
    SELECT user_id, hour,
           last_value(v_u IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) / 1000000.0 AS value_filled,
           CAST(observed AS BIGINT) AS observed
    FROM joined
    """,
)
def q_resample_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with gap fill: per-user hourly spine
    (sequence+explode between each user's own bounds — the spine never
    materializes driver-side and a sparse user costs only their span),
    left join of hourly totals, forward fill via last-non-null window
    carry (the same primitive as the as-of join). Hour totals
    accumulate in exact micro-units so the filled series is bit-stable;
    ``observed`` distinguishes measured hours from filled ones.

    Scale: one shuffle for the hourly agg, one for the spine join, one
    window pass per user — all keyed on user_id, no global ordering."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20).select(
        "user_id",
        "ts",
        F.round(F.col("value") * 1000000).cast("bigint").alias("v_u"),
    )
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.sum("v_u").alias("v_u"))
    bounds = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("h0"), F.col("h1"), F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    joined = spine.join(hourly, ["user_id", "hour"], "left").select(
        "user_id",
        "hour",
        "v_u",
        F.when(F.col("v_u").isNotNull(), 1).otherwise(0).cast("bigint").alias("observed"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        "hour",
        (F.last("v_u", ignorenulls=True).over(w) / 1000000.0).alias("value_filled"),
        "observed",
    )


@query(
    "count_window_blocks",
    oracle="""
    WITH numbered AS (
      SELECT user_id,
             CAST((row_number() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) - 1) // 10
                  AS BIGINT) AS window_id,
             CAST(round(value * 1000000) AS BIGINT) AS vu
      FROM events
    )
    SELECT user_id, window_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(vu AS DECIMAL(18,0))) AS DOUBLE) / 1000000.0
             AS total_value
    FROM numbered GROUP BY user_id, window_id
    """,
)
def q_count_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based tumbling windows (countWindow parity): per user,
    consecutive 10-event blocks in (ts, event_id) order; exact
    micro-unit value sums. One sort + one co-partitioned aggregation."""
    from min_flink_spark.operators.windows import count_window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 1000000).cast("bigint").alias("vu"),
    )
    return count_window(
        ev,
        ["user_id"],
        ["ts", "event_id"],
        10,
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(F.col("vu").cast("decimal(18,0)")).cast("double") / 1000000.0).alias(
            "total_value"
        ),
    )


@query(
    "count_window_sliding",
    oracle="""
    WITH pos AS (
      SELECT user_id, event_id,
             CAST(round(value * 1000000) AS BIGINT) AS vm,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY event_id) - 1 AS p
      FROM events
    ),
    spans AS (
      SELECT user_id, event_id, vm, p,
             unnest(generate_series(
               greatest(0, CAST(ceil((p - 5 + 1) / 2.0) AS BIGINT)),
               p // 2)) AS window_id
      FROM pos
    )
    SELECT user_id, CAST(window_id AS BIGINT) AS window_id,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(vm) AS BIGINT) AS value_micro
    FROM spans GROUP BY user_id, window_id
    """,
)
def q_count_window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding COUNT windows (size 5, slide 2) per user — the
    countWindow(size, slide) half of the reference family's window
    surface (operators/windows.sliding_count_window): each event joins
    up to ceil(5/2)=3 windows via a bounded in-row explode; one
    shuffle, aggregation reuses the sort's partitioning. Micro-unit
    sums keep the hash exact."""
    from min_flink_spark.operators.windows import sliding_count_window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.round(F.col("value") * 1000000).cast("bigint").alias("vm"),
    )
    return sliding_count_window(
        ev,
        ["user_id"],
        [F.col("event_id").asc()],
        5,
        2,
        F.count(F.lit(1)).alias("n"),
        F.sum("vm").alias("value_micro"),
    )
