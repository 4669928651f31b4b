"""Sketch-based telemetry over an append-only event corpus — the
never-rescan-history pattern at 100 TB.

Production shape: each day's partition is scanned ONCE to produce three
tiny mergeable summaries, which are stored; every dashboard question
after that is answered from summaries alone:

    day partition (scanned once)
      → log₂-histogram sketch   — later: any percentile, any key
      → bottom-k (KMV) sketch   — later: distinct counts, uniform
                                  samples, segment overlap/rollup
      → count-min grid          — later: per-item frequencies
      → Misra-Gries summary     — later: guaranteed top-k heavy items
      → chunked bitmap index    — later: EXACT set algebra (retention)
    stored per-day summaries
      → merge (counter addition / order-statistic closure /
               mergeable-summaries subtraction / bit_or)
      → quantiles / distinct rollup / heavy-item estimates / top-k /
        exact day-over-day retention

This demo simulates two "days" with the events table's day-of-month
parity, builds per-day partials, merges, and answers:
  1. p50/p90/p99 of value per event type        (histogram sketch)
  2. distinct users per type AND overall        (KMV + rollup merge)
  3. estimated frequency of the hottest items   (CMS, never-undercount)
  4. guaranteed top-5 items overall             (MG, deterministic)
  5. EXACT users active on BOTH days            (bitmap retention)

Every number is reproducible bit-for-bit by any engine (md5-based
hashing, integer arithmetic) — the same operators are gate-checked
against DuckDB in queries/pipeline_q.py / analytics_q.py. Run:
    python examples/sketch_telemetry.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from min_flink_spark import get_spark
from min_flink_spark.operators.bitmap import (
    bitmap_index,
    bitmap_pair_ops,
    merge_bitmap_indexes,
)
from min_flink_spark.operators.pipeline import (
    bottom_k_sketch,
    cms_estimate,
    count_min_sketch,
    kmv_distinct_estimate,
    log_histogram_sketch,
    merge_bottom_k,
    merge_cms,
    merge_histogram_sketches,
    merge_mg_summaries,
    misra_gries_summary,
    sketch_quantiles,
)


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark(app_name="sketch-telemetry")
    spark.sparkContext.setLogLevel("ERROR")
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_type",
            "user_id",
            F.round(F.col("value") * 1_000_000).cast("bigint").alias("vm"),
            (F.dayofmonth(F.col("ts").cast("timestamp")) % 2).alias("day"),
        )
    )

    # ---- the once-per-day pass: all three summaries ride one scan
    # (day is just a sketch key; in production each day writes its own
    # summary tables and the raw partition is never read again)
    hist = log_histogram_sketch(ev, ["day", "event_type"], F.col("vm"))
    kmv = bottom_k_sketch(ev, ["day", "event_type"], "user_id", k=16)
    cms = count_min_sketch(
        ev.select(
            "day",
            F.concat_ws("-", "event_type", (F.col("vm") % 7)).alias("item"),
        ),
        "item",
        keys=["day"],
    )

    by_day = lambda df, d, drop: df.filter(F.col("day") == d).drop(drop)  # noqa: E731

    # ---- 1. percentiles from merged histogram partials
    h = merge_histogram_sketches(
        by_day(hist, 0, "day"), by_day(hist, 1, "day")
    )
    print("\n-- p50/p90/p99 value (micro-units lower bound) per type --")
    for r in (
        sketch_quantiles(h, ["event_type"], [50, 90, 99])
        .orderBy("event_type", "pct")
        .collect()
    ):
        print(f"  {r['event_type']:10s} p{r['pct']}: >= {r['lo_micro']}")

    # ---- 2. distinct users per type + overall rollup, sketches only
    per_type = merge_bottom_k(
        [by_day(kmv, 0, "day"), by_day(kmv, 1, "day")], ["event_type"], k=16
    )
    print("\n-- distinct users (KMV estimate) --")
    for r in kmv_distinct_estimate(per_type, ["event_type"], k=16).collect():
        print(f"  {r['event_type']:10s} ~{r['distinct_est']}")
    total = merge_bottom_k(
        [per_type.select(F.lit("ALL").alias("k"), "pos", "hash", "id")], ["k"], k=16
    )
    (tot,) = kmv_distinct_estimate(total, ["k"], k=16).collect()
    print(f"  ALL        ~{tot['distinct_est']}  (rolled up from the per-type sketches)")

    # ---- 3. hot-item frequencies from the merged CMS grid
    grid = merge_cms(by_day(cms, 0, "day"), by_day(cms, 1, "day"))
    probes = spark.createDataFrame(
        [(f"click-{i}",) for i in range(3)] + [(f"purchase-{i}",) for i in range(3)],
        "item string",
    )
    print("\n-- hot-item frequency estimates (CMS, never undercounts) --")
    for r in cms_estimate(grid, probes, "item").orderBy("item").collect():
        print(f"  {r['item']:12s} ~{r['cms_est']}")

    # ---- 4. guaranteed top-k from merged per-day MG summaries
    # (each day's m=64 summary is stored; the range merge is the
    # mergeable-summaries step — est ∈ [true − N/m, true] end-to-end)
    mg_daily = misra_gries_summary(
        ev.select(
            "day",
            F.concat_ws("-", "event_type", (F.col("vm") % 7)).alias("item"),
        ),
        "item",
        m=64,
        keys=["day"],
    )
    mg = merge_mg_summaries(
        mg_daily.select("item", F.col("est").alias("cnt")), 64
    )
    print("\n-- top-5 items (Misra-Gries, deterministic bounds) --")
    for r in mg.orderBy(F.col("est").desc(), "item").limit(5).collect():
        print(f"  {r['item']:12s} >= {r['est']}")

    # ---- 5. EXACT day-over-day retention from per-day bitmap partials
    bmp = bitmap_index(
        ev.select(F.concat(F.lit("day"), F.col("day")).alias("seg"), "user_id"),
        "seg",
        "user_id",
    )
    merged_bmp = merge_bitmap_indexes(bmp)
    (ret,) = bitmap_pair_ops(merged_bmp, "seg").collect()
    print(
        "\n-- exact retention (bitmap) --\n "
        f" day0 users {ret['n_a']}, day1 users {ret['n_b']}, "
        f"both days {ret['n_inter']}, either {ret['n_union']}"
    )

    print(
        "\nSummary sizes: histogram", h.count(), "rows; KMV", per_type.count(),
        "rows; CMS grid", grid.count(), "rows; MG", mg.count(),
        "rows; bitmap", merged_bmp.count(),
        "words — the raw events were scanned once per day.",
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
