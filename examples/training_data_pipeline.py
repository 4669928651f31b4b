"""End-to-end LLM training-data pipeline on the engine's operators —
the curriculum every large-scale corpus goes through, each stage the
gate-checked operator, chained:

    raw documents
      1. language ID            (functions/text.language_guess)
      2. quality filter         (operators/pipeline.quality_filter,
                                 C4/Gopher-style, per-rule audit flags)
      3. exact dedup            (operators/dedup.exact_dedup)
      4. near-dup clustering    (minhash_lsh_pairs → keep_best_per_cluster:
                                 LSH candidates, connected components,
                                 one best doc per cluster)
      5. decontamination        (operators/pipeline.contamination_overlap
                                 vs the held-out eval slice)
      6. deterministic split    (split_train_val_test — md5 buckets,
                                 stable under corpus growth)
      7. token counting         (functions/text.token_count)
      8. sequence packing       (pack_sequences — greedy per md5 bucket,
                                 parallel across buckets)

Every stage is pure DataFrame ops (codegen or Arrow), no driver loops;
at 100 TB the same code runs with more buckets/partitions. Run:
    python examples/training_data_pipeline.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from min_flink_spark import get_spark
from min_flink_spark.functions.text import language_guess, quality_score, token_count
from min_flink_spark.operators.dedup import (
    exact_dedup,
    keep_best_per_cluster,
    minhash_lsh_pairs,
)
from min_flink_spark.operators.pipeline import (
    contamination_overlap,
    pack_sequences,
    quality_filter,
    split_train_val_test,
)


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark(app_name="training-data-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()
    print(f"raw docs: {n0}")

    # 1. language ID (n-gram/stopword heuristic, pure codegen)
    docs = docs.withColumn("lang_guess", language_guess(F.col("text")))

    # 2. quality filter — keep, with auditable per-rule flags
    flagged = quality_filter(docs)
    kept = flagged.filter(F.col("keep")).select(*docs.columns)
    n1 = kept.count()
    print(f"after quality filter: {n1}  (dropped {n0 - n1}, every drop carries its rule flags)")

    # 3. exact dedup on normalized-content fingerprint
    uniq = exact_dedup(kept)
    n2 = uniq.count()
    print(f"after exact dedup: {n2}  (removed {n1 - n2} verbatim copies)")

    # 4. near-dup clustering: LSH candidates → CC clusters → best doc
    scored = uniq.withColumn("quality", quality_score(F.col("text")))
    pairs = minhash_lsh_pairs(scored, num_hashes=16, bands=4)
    survivors = keep_best_per_cluster(scored, pairs)
    n3 = survivors.count()
    print(f"after near-dup removal: {n3}  (collapsed {n2 - n3} near-dups into cluster reps)")

    # 5/6. deterministic split FIRST, then decontaminate train vs test
    # (the split is md5-stable, so the test slice is reproducible)
    split = split_train_val_test(survivors, "doc_id", weights=(90, 5, 5))
    train = split.filter(F.col("split") == "train")
    test = split.filter(F.col("split") == "test").select("doc_id", "text")
    overlap = contamination_overlap(
        train.select("doc_id", "text"), test, n=8
    ).filter(F.col("overlap_frac") >= 0.5)
    clean_train = train.join(overlap.select("doc_id"), "doc_id", "left_anti")
    n4, n_test = clean_train.count(), test.count()
    print(f"train after decontamination vs {n_test} test docs: {n4}")

    # 7/8. token counts → packed training shards
    sized = clean_train.select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    )
    packed = pack_sequences(sized, capacity=512, num_buckets=16)
    stats = packed.groupBy("bucket", "bin").agg(
        F.sum(F.least(F.col("n_tokens"), F.lit(512))).alias("fill")
    ).agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.avg(F.col("fill") / 512).alias("avg_fill"),
    ).first()
    print(
        f"packed into {stats['n_bins']} bins of 512 tokens, "
        f"avg fill {stats['avg_fill']:.1%} — ready to shard"
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
