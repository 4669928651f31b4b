"""Real-time funnel monitoring — the round-3 streaming surface composed.

One event stream drives three concurrent analyses the way a production
monitoring job would:

    event stream (file source, schema-pinned)
      ├─ side_output: error events split off to a quarantine sink
      │  (OutputTag pattern — null-safe partition, nothing dropped)
      ├─ CEP followed-by: click → purchase within 1 h, latest-match-wins
      │  (streaming/cep.py; trailing-window keyed state)
      ├─ CEP absence: click with NO purchase within 1 h → timeout alert
      │  (the per-key timer pattern; alerts fire when the user's own
      │  event time passes the deadline)
      └─ connect: clicks + purchases co-processed under ONE per-user
         state → live conversion snapshot (CoProcessFunction surface)

All four run on the same key shuffle discipline (user_id), keyed state
is bounded by the pattern window, and every per-row computation is
vectorized numpy inside Arrow batches — no row-at-a-time Python.

Run: python examples/realtime_funnel.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from min_flink_spark import get_spark
from min_flink_spark.core.stream import Stream
from min_flink_spark.queries.streaming_q import _ClickPurchaseCoProcess
from min_flink_spark.streaming.cep import AbsenceFunction, FollowedByFunction
from min_flink_spark.streaming.connect import connect_keyed
from min_flink_spark.streaming.runner import (
    run_to_completion,
    shuffle_partitions,
    stream_parquet,
)
from min_flink_spark.streaming.stateful import process_keyed

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)
HOUR_US = 3_600_000_000


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="realtime-funnel", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    src = f"{sf_dir}/events.parquet"

    # -- 0. error quarantine via side output (batch view of the stream)
    batch = Stream(spark.read.parquet(src))
    main_s, errors = batch.side_output(F.col("event_type") == "error")
    print(f"quarantined errors: {errors.df.count()}; main: {main_s.df.count()}")

    def keyed_events(stream_df):
        return stream_df.select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
            "event_id",
            "event_type",
        )

    # -- 1. conversions: click followed by purchase within 1 h
    with shuffle_partitions(spark, 8):
        matches = run_to_completion(
            process_keyed(
                keyed_events(stream_parquet(spark, src, EVENTS_SCHEMA)),
                ["user_id"],
                FollowedByFunction("click", "purchase", HOUR_US),
                output_mode="update",
            ),
            output_mode="update",
        )
    print(f"click→purchase conversions (1 h): {matches.count()}")

    # -- 2. timeout alerts: click with no purchase within 1 h
    with shuffle_partitions(spark, 8):
        alerts = run_to_completion(
            process_keyed(
                keyed_events(stream_parquet(spark, src, EVENTS_SCHEMA)),
                ["user_id"],
                AbsenceFunction("click", "purchase", HOUR_US),
                output_mode="update",
            ),
            output_mode="update",
        )
    print(f"abandonment alerts: {alerts.count()}")

    # -- 3. live per-user snapshot: two streams, one shared state
    s1 = stream_parquet(spark, src, EVENTS_SCHEMA)
    s2 = stream_parquet(spark, src, EVENTS_SCHEMA)
    clicks = s1.filter(F.col("event_type") == "click").select("user_id", "event_id")
    purchases = s2.filter(F.col("event_type") == "purchase").select(
        "user_id", F.round(F.col("value") * 1000000).cast("bigint").alias("vu")
    )
    with shuffle_partitions(spark, 8):
        snap = run_to_completion(
            connect_keyed(
                clicks,
                purchases,
                ["user_id"],
                _ClickPurchaseCoProcess(),
                output_mode="update",
            ),
            output_mode="update",
        )
    top = snap.orderBy(F.desc("purchase_value")).limit(3).collect()
    print("top purchase-value users:", [(r.user_id, r.purchase_value) for r in top])


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
