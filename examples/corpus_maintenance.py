"""Day-2 corpus maintenance: what runs AFTER the initial curation ships.

The initial pipeline (examples/curation_pipeline.py) builds the corpus;
this one keeps it healthy as a new snapshot arrives — touching only the
delta wherever the operator family allows it:

    yesterday's snapshot + today's snapshot
      → snapshot_diff (change-data-feed: added/removed/changed per doc)
      → changed ∪ added docs only:
          → char-entropy + MAD outlier quality gates
          → incremental near-dup check against the STORED band index
            (old corpus never rescanned)
          → model quality scoring (load-once Arrow path)
      → per-source stats maintained by MERGE (grouped_stats on the
        delta ⊎ stored partials ≡ full recompute, bit-exact)
      → trend_slope drift check over the merged history

Every stage is a pure DataFrame function; the only driver-side values
are bounded metadata (diff counts, merged stats rows). Run:
    python examples/corpus_maintenance.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from min_flink_spark import get_spark
from min_flink_spark.functions.text import char_entropy_micro
from min_flink_spark.operators.dedup import incremental_near_dup, near_dup_index
from min_flink_spark.operators.inference import fake_quality_scorer, score_with_model
from min_flink_spark.operators.pipeline import (
    bottom_k_sketch,
    grouped_stats,
    kmv_distinct_estimate,
    log_histogram_sketch,
    merge_bottom_k,
    merge_grouped_stats,
    merge_histogram_sketches,
    sketch_quantiles,
    snapshot_diff,
)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="corpus-maintenance")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # two deterministic snapshots standing in for yesterday/today
    yesterday = docs.filter(F.col("doc_id") % 7 != 0)
    today = docs.filter(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
        ).otherwise(F.col("text")),
    )

    # 1. change-data-feed
    diff = snapshot_diff(yesterday, today, ["doc_id"], F.md5("text"))
    print("diff:", {r.status: r.cnt for r in
                    diff.groupBy("status").agg(F.count("*").alias("cnt")).collect()})

    # 2. only new/changed docs go through the expensive stages
    touched = today.join(
        diff.filter(F.col("status").isin("added", "changed")).select("doc_id"),
        "doc_id",
    )

    # quality gates: entropy band + model score
    gated = touched.withColumn("entropy_micro", char_entropy_micro(F.col("text")))
    gated = score_with_model(gated, fake_quality_scorer("text"))
    kept = gated.filter(
        F.col("entropy_micro").between(1_500_000, 6_000_000)
        & (F.col("model_score") > 0.05)
    )

    # 3. fuzzy dedup of the delta against the stored index — the old
    # corpus costs one narrow join, never a text pass
    stored_index = near_dup_index(yesterday, "text", "doc_id")
    matches, new_rows = incremental_near_dup(kept, stored_index, threshold=0.7)
    dupes = matches.select(F.col("new_id").alias("doc_id")).distinct()
    fresh = kept.join(dupes, "doc_id", "left_anti")
    print("delta kept:", fresh.count(), "near-dups dropped:", dupes.count())
    new_rows.unpersist()  # caller owns the persisted index lifetime

    # 4. per-source stats: merge stored partials with the delta's
    stored = grouped_stats(yesterday, ["source"], F.col("n_chars"))
    delta = grouped_stats(fresh, ["source"], F.col("n_chars"))
    merged = merge_grouped_stats(stored, delta)
    print("merged stats rows:", merged.count())

    # 5. maintained quantiles: the stored log-histogram sketch merges
    # with the delta's (count addition — bit-identical to a rescan),
    # then p50/p95 resolve on the sketch-sized frame
    vm = F.col("n_chars").cast("bigint")
    sk_stored = log_histogram_sketch(yesterday, ["source"], vm)
    sk_delta = log_histogram_sketch(fresh, ["source"], vm)
    qs = sketch_quantiles(
        merge_histogram_sketches(sk_stored, sk_delta), ["source"], [50, 95]
    )
    print("maintained quantile rows:", qs.count())

    # 6. maintained distinct-author reach per source: bottom-k (KMV)
    # sketches merge the same way; estimate without rescanning history
    bk_stored = bottom_k_sketch(yesterday, ["source"], "doc_id", k=8)
    bk_delta = bottom_k_sketch(fresh, ["source"], "doc_id", k=8)
    bk = merge_bottom_k([bk_stored, bk_delta], ["source"], k=8)
    print(
        "distinct-doc estimates:",
        {r["source"]: r["distinct_est"]
         for r in kmv_distinct_estimate(bk, ["source"], k=8).collect()},
    )

    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
