"""End-to-end streaming ingestion pipeline.

The continuous half of the corpus lifecycle (the batch half is
examples/curation_pipeline.py): documents arrive as files, and each
micro-batch is cleaned, de-duplicated against EVERYTHING already
ingested, and appended exactly once — then the accumulated small files
are compacted for scan efficiency. Every stage is the operator a real
cluster would run:

    file stream (schema-pinned, N files/trigger)
      → HTML strip + whitespace normalize (codegen regex)
      → quality gate (length bounds)
      → per-batch exact dedup + incremental dedup vs the fingerprint
        index of ALL previously-ingested docs (anti-join on the narrow
        md5 index — the corpus itself is never rescanned)
      → incremental FUZZY dedup vs the near-dup index (MinHash band
        join + signature-agreement estimate, threshold 0.7; within-
        batch near-dups dropped keeping the min doc_id; survivors'
        band rows appended to the index)
      → exactly-once append, two independent layers:
        (a) every batch writes to its OWN batch=<id> directory with
            overwrite semantics, so a replayed batch rewrites the same
            directory instead of appending duplicates (the fn itself is
            idempotent — Structured Streaming redelivers a batch after
            a crash between sink write and offset commit);
        (b) idempotent_foreach_batch's ledger skips fully-delivered
            batches without re-running them at all.
        The index anti-join reads every batch directory EXCEPT the
        current one, so a replay cannot anti-join its own half-written
        fingerprints and lose the batch.
      → small-file compaction (byte-derived partition count)

Run: python examples/streaming_ingest.py [sf_dir]
"""

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from min_flink_spark import get_spark
from min_flink_spark.functions.text import fingerprint, normalize_whitespace, strip_html
from min_flink_spark.operators.dedup import exact_dedup
from min_flink_spark.sources import compact_parquet
from min_flink_spark.streaming.runner import (
    idempotent_foreach_batch,
    run_foreach_batch,
    shuffle_partitions,
    stream_files,
)

DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark(app_name="streaming-ingest-example")
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="ingest_")
    corpus_dir = os.path.join(work, "corpus")
    index_dir = os.path.join(work, "fp_index")
    nd_index_dir = os.path.join(work, "near_dup_index")
    ledger_dir = os.path.join(work, "ledger")
    ckpt_dir = os.path.join(work, "ckpt")

    src = stream_files(
        spark, f"{sf_dir}/documents.parquet", DOCS_SCHEMA, "parquet",
        max_files_per_trigger=1,
    )

    cleaned = (
        src.withColumn("text", normalize_whitespace(strip_html(F.col("text"))))
        .filter(F.length("text").between(20, 1_000_000))
    )

    def ingest(batch_df, batch_id: int):
        spark_ = batch_df.sparkSession
        # per-batch exact dedup first (cheap), then the incremental
        # anti-join against the persistent fingerprint index — reading
        # every PRIOR batch's directory but never the current one (a
        # replayed batch must not anti-join its own partial write)
        batch = exact_dedup(batch_df, "text", "doc_id").withColumn(
            "_fp", fingerprint(F.col("text"))
        )
        prior = [
            os.path.join(index_dir, d)
            for d in (os.listdir(index_dir) if os.path.isdir(index_dir) else [])
            if d.startswith("batch=") and d != f"batch={batch_id}"
        ]
        if prior:
            seen = spark_.read.parquet(*prior)
            batch = batch.join(seen, batch["_fp"] == seen["fp"], "left_anti")
        batch = batch.localCheckpoint(eager=True)  # pin the anti-joined
        # content: both writes below must see the same rows
        # FUZZY stage: drop batch docs that near-duplicate anything
        # already ingested (MinHash band join against the stored
        # near-dup index — old text never rescanned), then drop
        # within-batch near-dups keeping the min doc_id
        from min_flink_spark.operators.dedup import incremental_near_dup

        nd_prior = [
            os.path.join(nd_index_dir, d)
            for d in (os.listdir(nd_index_dir) if os.path.isdir(nd_index_dir) else [])
            if d.startswith("batch=") and d != f"batch={batch_id}"
        ]
        nd_index = spark_.read.parquet(*nd_prior) if nd_prior else None
        matches, nd_rows = incremental_near_dup(
            batch, nd_index, threshold=0.7
        )
        dupes = matches.select(F.col("new_id").alias("doc_id")).distinct()
        batch = batch.join(dupes, "doc_id", "left_anti").localCheckpoint(eager=True)
        nd_keep = nd_rows.join(dupes, nd_rows["doc_id"] == dupes["doc_id"], "left_anti")
        # batch-scoped OVERWRITE directories = idempotent on redelivery
        batch.drop("_fp").write.mode("overwrite").parquet(
            f"{corpus_dir}/batch={batch_id}"
        )
        batch.select(F.col("_fp").alias("fp")).write.mode("overwrite").parquet(
            f"{index_dir}/batch={batch_id}"
        )
        nd_keep.write.mode("overwrite").parquet(f"{nd_index_dir}/batch={batch_id}")
        # incremental_near_dup persists its index frame so the matches
        # join and the write above share one computation; the caller
        # (us) owns that lifetime — release it now so cached blocks
        # don't accumulate across micro-batches on a long stream.
        nd_rows.unpersist()

    with shuffle_partitions(spark, 8):
        run_foreach_batch(
            cleaned,
            idempotent_foreach_batch(ingest, ledger_dir),
            output_mode="append",
            checkpoint_dir=ckpt_dir,
        )

    # glob the batch dirs directly (no hive partition-discovery column)
    n_docs = spark.read.parquet(f"{corpus_dir}/batch=*").count()
    n_fp = spark.read.parquet(f"{index_dir}/batch=*").count()

    # table maintenance: collapse the per-batch small files (partition
    # discovery keeps batch as a lineage column in the compacted table)
    compacted = os.path.join(work, "corpus_compacted")
    n_parts = compact_parquet(spark, corpus_dir, compacted, target_file_mb=256)

    print(f"ingested={n_docs} fingerprints={n_fp} compacted_partitions={n_parts}")
    print(f"corpus: {compacted}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
