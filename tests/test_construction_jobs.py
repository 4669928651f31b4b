"""Registry-wide construction-silence pin (VERDICT r8 item 5 /
r9 item 3): building a query's DataFrame must not run Spark jobs —
construction is plan DECLARATION, and an eager job there executes on
every import-construct cycle (driver gate, plan audit, bench warmup)
before any action is requested. The classical offender was
q_heavy_hitters' `freqItems(...).first()` (fixed in r10: the sketch is
now an in-plan MG broadcast join); this test pins the remaining class
EXACTLY so it can't silently grow back.

The allowlist below is every query whose construction-time jobs are
structural, with the reason:

- iterative graph / clustering algorithms materialize per round
  (eager localCheckpoint) — for them, iteration IS construction, and
  the per-round release discipline is tested in test_ckpt_release;
- write-then-read round trips (multi-format, partitioned, bucketed,
  schema-evolution, csv-quarantine) must produce the files their scan
  reads;
- bounded-metadata probes (#partitions / #sources / #centroids longs,
  k-means training, literal Bloom masks) are the audited `.collect()`
  allowlist from the round verdicts — bounded by construction, never
  data-sized.

Streaming queries are excluded wholesale (same rule as the plan
audit): their construction runs the micro-batch pipeline by design.

`load_table` is memoized per session (sources/__init__.py) — without
that, every `spark.read.parquet` fires a one-task footer job and ALL
~200 batch queries would show construction jobs that have nothing to
do with their plans.
"""

from __future__ import annotations

from min_flink_spark.core.ckpt import release_backing
from min_flink_spark.queries import QUERIES
from min_flink_spark.sources import TABLES, load_table

# query -> why construction legitimately runs jobs
ALLOWED_CONSTRUCTION_JOBS = {
    # ---- iterative: per-round eager checkpoints ----
    "pagerank_copurchase": "3 power-iteration rounds, checkpoint each",
    "triangle_counts_copurchase": "pair/degree/orientation checkpoints "
    "+ bounded 3-scalar packing-width probe",
    "lpa_communities_copurchase": "3 label rounds, checkpoint each",
    "bfs_reach_copurchase": "per-hop frontier checkpoints",
    "kcore_copurchase": "3 peel rounds, checkpoint each",
    "dedup_clusters": "connected-components rounds over the dup graph",
    "dedup_keep_best": "same CC rounds (keep-best rides dedup_clusters)",
    "semantic_dedup_survivors": "CC rounds over the embedding dup graph",
    "ann_ivf_topk": "k-means training iterations for the IVF centroids",
    "ann_pq_topk": "k-means training per PQ subspace",
    "bpe_merge_training": "3 greedy merge rounds, checkpoint each "
    "(r13: lineage recomputation multiplied the corpus tokenize 7x)",
    "bpe_tokenized_lengths": "same trainer rounds + the type-table "
    "checkpoint shared by the trainer and apply legs (was 9 scans)",
    "epoch_shuffle_index": "global_index: internal range checkpoint + "
    "#partitions-longs offset probe",
    "exact_percentile_grid": "distributed value-at-rank path: the range-"
    "sliced frame is localCheckpoint(eager)-pinned at construction (r14 "
    "ReuseExchange pin — _pid/_lrk must come from ONE physical sample; "
    "release discipline tested in test_pipeline_ops)",
    # ---- write-then-read round trips ----
    "multi_format_roundtrip": "writes csv/json/orc before re-reading",
    "partitioned_pruned_read": "writes the partitioned table it prunes",
    "bucketed_cobucket_join_stats": "writes the bucketed tables",
    "schema_evolution_union": "writes the v1/v2 parquet generations",
    "csv_corrupt_record_quarantine": "writes the corrupt-lines csv",
    # ---- audited bounded-metadata probes ----
    "bloom_prefilter_join": "literal-mask cutover: m/64-word array "
    "collected to the driver (bounded by m, not data)",
    "contrastive_negative_pairs": "bounded corpus-count scalar for the "
    "negative-sampling rate",
    "domain_mix_sample": "#sources count longs for the waterfilling rate",
}


def test_construction_runs_no_unpinned_jobs(spark, sf_dir):
    """Construct every non-streaming registry query under a job group
    and assert the set that ran ANY job equals the pinned allowlist —
    equality, not subset, so a fixed query must also leave the pin."""
    sc = spark.sparkContext
    for t in TABLES:  # warm the per-session table memo
        load_table(spark, sf_dir, t)

    ran_jobs = set()
    for name, fn in QUERIES.items():
        if name.startswith("streaming_"):
            continue
        group = f"construct::{name}"
        sc.setJobGroup(group, name)
        try:
            df = fn(spark, sf_dir)
        finally:
            sc.setJobGroup(None, None)
        if sc.statusTracker().getJobIdsForGroup(group):
            ran_jobs.add(name)
            release_backing(df)  # free checkpoint blocks as we go

    unpinned = ran_jobs - set(ALLOWED_CONSTRUCTION_JOBS)
    stale = set(ALLOWED_CONSTRUCTION_JOBS) - ran_jobs
    assert not unpinned, (
        f"queries now run jobs at CONSTRUCTION time (the freqItems "
        f"class): {sorted(unpinned)} — make the plan lazy or pin with "
        f"a written reason"
    )
    assert not stale, (
        f"allowlisted queries no longer run construction jobs — drop "
        f"them from the pin: {sorted(stale)}"
    )
