"""End-to-end training-data curation pipeline.

The composition a corpus team would actually run, start to finish, on
the engine's operators — every stage scale-architected (codegen
filters, hash-agg dedup, banded LSH, inverted-index decontamination,
bucketed packing; no collects, no cartesians):

    raw docs
      → quality filter (C4/Gopher rules, auditable flags)
      → PII redaction
      → exact dedup (md5 fingerprint, min-id canonical)
      → near-dup dedup (MinHash+LSH candidates → cluster → keep min id)
      → benchmark decontamination (8-gram overlap)
      → domain mixing to target source proportions
      → drift gate vs the raw snapshot (promotion check)
      → token counting + greedy sequence packing into 512-token bins
      → deterministic epoch shuffle (seeded global permutation index)
      → parquet shards

Run: python examples/curation_pipeline.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tempfile

from pyspark.sql import functions as F

from min_flink_spark import get_spark
from min_flink_spark.functions.text import token_count
from min_flink_spark.functions.text import normalize_whitespace, strip_html
from min_flink_spark.operators.dedup import (
    dedup_substrings,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from min_flink_spark.operators.graph import connected_components
from min_flink_spark.operators.pipeline import (
    cap_per_group,
    contamination_overlap,
    domain_mix,
    drift_report,
    pack_sequences,
    quality_filter,
    redact_pii,
)
from min_flink_spark.operators.relational import global_index


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="curation-pipeline")
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    n0 = docs.count()

    # 0. extraction + normalization: HTML → visible text (no-op on an
    # already-clean corpus; the pass every web crawl needs), collapse
    # whitespace — pure codegen, no shuffle
    docs = docs.withColumn("text", normalize_whitespace(strip_html(F.col("text"))))

    # 1. quality filter — keep decision with auditable per-rule flags
    q = quality_filter(docs)
    kept = q.filter("keep").select("doc_id", "text")
    n1 = kept.count()

    # 2. PII scrub
    clean = redact_pii(kept).select("doc_id", "text")

    # 3. exact dedup
    exact = exact_dedup(clean, "text", "doc_id")
    n2 = exact.count()

    # 4. near-dup dedup: LSH candidates, exact-Jaccard verified, then
    # connected components → keep min id per cluster. Verification
    # matters: raw band collisions include sub-threshold pairs, and
    # dropping on candidates alone over-deletes.
    cand = minhash_lsh_pairs(exact, "text", "doc_id")
    verified = ngram_jaccard_pairs(exact, threshold=0.7, text_col="text", id_col="doc_id")
    pairs = cand.join(verified.select("doc_a", "doc_b"), ["doc_a", "doc_b"])
    clusters = connected_components(pairs, "doc_a", "doc_b")
    canonical = clusters.groupBy("component").agg(F.min("node").alias("keep_id"))
    drop = clusters.join(
        canonical, clusters["component"] == canonical["component"]
    ).filter(F.col("node") != F.col("keep_id")).select(F.col("node").alias("doc_id"))
    deduped = exact.join(drop, "doc_id", "left_anti")
    # pin the expensive lineage (LSH + components) ONCE: step 4b joins
    # a derived frame back onto this one, which would otherwise re-run
    # the whole dedup lineage twice inside a single plan
    deduped = deduped.localCheckpoint(eager=True)
    n3 = deduped.count()

    # 4b. span-level pass: dedup_substrings rebuilds text in NORMALIZED
    # token space (case/punctuation gone), so here it is used as a
    # duplication SCORE — drop docs that are mostly repeated spans,
    # keep the ORIGINAL text of the survivors
    span_scores = dedup_substrings(deduped, "text", "doc_id", k=8).select(
        "doc_id",
        (F.col("n_kept") / F.greatest(F.col("n_tokens"), F.lit(1))).alias(
            "_unique_frac"
        ),
        (F.col("n_tokens") == 0).alias("_no_tokens"),
    )
    deduped = (
        deduped.join(span_scores, "doc_id")
        # zero-token docs have no spans at all — 0/0 must not read as
        # "fully duplicated"
        .filter((F.col("_unique_frac") >= 0.3) | F.col("_no_tokens"))
        .drop("_unique_frac", "_no_tokens")
    )

    # 5. decontamination vs a held-out eval slice
    evalset = docs.filter(F.col("doc_id") % 97 == 0)
    train = deduped.filter(F.col("doc_id") % 97 != 0)
    overlap = contamination_overlap(train, evalset, n=8)
    contaminated = overlap.filter(F.col("overlap_frac") > 0.5).select("doc_id")
    final = train.join(contaminated, "doc_id", "left_anti")
    n4 = final.count()

    # 6. domain mixing: rebalance sources to target proportions
    # (waterfilling — never upsamples; deterministic hash rows).
    # Targets are built from the sources that SURVIVED curation — a
    # fully-filtered source must drop out of the mix, not crash it.
    sourced = final.join(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "source"),
        "doc_id",
    )
    present = sorted(r["source"] for r in sourced.select("source").distinct().collect())
    targets = {s: (3 if s in ("src0", "src1", "src2", "src3", "src4") else 1)
               for s in present}
    mixed = domain_mix(sourced, "source", "doc_id", targets)
    # absolute per-domain cap on top of the ratio mix (one crawler seed
    # must not dominate regardless of proportions)
    mixed = cap_per_group(mixed, ["source"], "doc_id", k=100)
    # the curated lineage above (LSH dedup + components + decontam) is
    # expensive; checkpoint once so the 4 downstream consumers (count,
    # drift, packing, final write) don't each re-run it
    mixed = mixed.localCheckpoint(eager=True)
    n5 = mixed.count()

    # 7. drift gate: sanity-check the curated snapshot against raw
    # before promoting (nulls / mean length shifts surface here)
    raw_lens = docs.select("doc_id", F.length("text").cast("bigint").alias("len"))
    cur_lens = mixed.select("doc_id", F.length("text").cast("bigint").alias("len"))
    drift = drift_report(raw_lens, cur_lens, ["len"]).first()

    # 8. token counts + packing into 512-token training bins
    counted = mixed.select(
        "doc_id", token_count(F.col("text")).cast("bigint").alias("n_tokens")
    )
    packed = pack_sequences(counted, capacity=512, num_buckets=16)
    n_bins = packed.select("bucket", "bin").distinct().count()

    # 9. deterministic epoch shuffle: reproducible global order for the
    # training loader (never a one-task window)
    shuffled = global_index(
        mixed.select("doc_id"),
        order_by=[
            F.md5(F.concat(F.lit("epoch-0:"), F.col("doc_id").cast("string"))),
            F.col("doc_id"),
        ],
        index_col="epoch_pos",
    )

    out = tempfile.mkdtemp(prefix="curated_")
    (
        mixed.join(packed, "doc_id")
        .join(shuffled, "doc_id")
        .write.mode("overwrite")
        .parquet(out)
    )

    print(f"raw={n0} quality_kept={n1} exact_deduped={n2} "
          f"near_deduped={n3} decontaminated={n4} mixed={n5} bins={n_bins} "
          f"len_drift={drift['mean_delta']:.1f}")
    print(f"shards: {out}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
