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
