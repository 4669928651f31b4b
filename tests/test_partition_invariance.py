"""Parallelism invariance: registry queries must return IDENTICAL rows
under different shuffle widths — the property that makes the oracle
strategy valid on a 1000-executor cluster, not just at the test
config. Covers the operator families where partition count could
plausibly leak: md5-threshold sampling, LSH banding, global
permutation indexing, weighted top-k, and exact money aggregation."""

import pytest

from min_flink_spark.queries import QUERIES

CASES = [
    "dedup_minhash_lsh",
    "epoch_shuffle_index",
    "weighted_sample_topk",
    "pricing_summary",
    "semantic_dedup_survivors",
    # r7: integer-micro prototype argmin, integer bin counts, and the
    # (hash, id)-total-ordered KMV sketches must not depend on how the
    # corpus is partitioned
    "prototype_label_agreement",
    "sketch_quantiles_merged",
    "kmv_distinct_users",
    "kmv_segment_overlap",
    # r8: counter grids (pure hash-agg), bit_or masks (commutative OR),
    # and the two-level sketch rollup are partition-count-free by
    # construction — pin it
    "cms_term_frequencies",
    "bloom_prefilter_join",
    "kmv_rollup_distinct",
]


def _rows(spark, sf_dir, name, partitions):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        df = QUERIES[name](spark, sf_dir)
        return sorted(tuple(r) for r in df.collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@pytest.mark.parametrize("name", CASES)
def test_result_invariant_under_shuffle_width(spark, sf_dir, name):
    a = _rows(spark, sf_dir, name, 3)
    b = _rows(spark, sf_dir, name, 17)
    assert a == b
