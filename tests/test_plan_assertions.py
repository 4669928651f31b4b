"""Plan-shape locks for the bench headliners (VERDICT r1 item 7): the
expensive queries must keep the plan they were tuned to — a broadcast
that silently degrades to a shuffle, or a bucketed join that regrows a
cartesian, is a perf regression the wall-clock bench may hide in noise.
"""

import pytest

from min_flink_spark.queries import QUERIES


def _plan(spark, sf_dir, name) -> str:
    return QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_shipping_priority_plan_broadcasts_dim(spark, sf_dir):
    """TPC-H-Q3 shape: the filtered customer dim must broadcast into
    orders (never shuffle it), and the top-10 must be
    TakeOrderedAndProject (never a global sort)."""
    plan = _plan(spark, sf_dir, "shipping_priority")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_left_join_order_item_stats_plan_hash_join(spark, sf_dir):
    """Two fact tables joined on the shared key: any HASH-based join is
    acceptable (at test SF the aggregated side is small enough to
    broadcast; at scale it becomes a shuffle join on the same key) —
    but never a nested-loop/cartesian."""
    plan = _plan(spark, sf_dir, "left_join_order_item_stats")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert any(j in plan for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))


def test_dedup_minhash_lsh_plan_is_bucketed(spark, sf_dir):
    """The LSH self-join must be an equi-join on (band, band_key) —
    a CartesianProduct or nested loop means the banding collapsed."""
    plan = _plan(spark, sf_dir, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_near_dup_plan_is_bucketed(spark, sf_dir):
    """The production near-dup path joins on (tbl, sig) buckets; the
    quadratic baseline must stay behind exact=True."""
    plan = _plan(spark, sf_dir, "embedding_near_dup_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pricing_summary_pushdown(spark, sf_dir):
    """The flagship scan must push the shipdate filter and prune to the
    7 referenced columns (a full-width scan at 100 TB is the bug)."""
    plan = _plan(spark, sf_dir, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate," in plan
    assert "l_comment" not in plan  # column pruning reached the scan


def test_volume_shipping_plan_single_shuffle_join(spark, sf_dir):
    """Q7 shape: of the six joins, only lineitem⋈orders may be a
    shuffle join — customer/supplier/nation(×2) must all broadcast,
    and the date filter must reach the lineitem scan."""
    plan = _plan(spark, sf_dir, "volume_shipping")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate," in plan


def test_market_share_plan_part_filter_prunes_fact(spark, sf_dir):
    """Q8 shape: the PROMO part filter must broadcast into lineitem
    (pruning the fact before the wide joins) and the share must come
    from ONE aggregation — no self-join of yearly totals."""
    plan = _plan(spark, sf_dir, "market_share")
    assert plan.count("BroadcastHashJoin") >= 5
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    "name",
    [
        "embedding_cosine_topk",
        "top3_orders_per_priority",
        "tfidf_top_terms",
        "per_domain_cap",
    ],
)
def test_topk_plans_keep_window_group_limit(spark, sf_dir, name):
    """Per-group top-k queries rely on Spark ≥3.5's WindowGroupLimit
    rewrite (partial limit BEFORE the shuffle) for their scale story —
    without it every group's full candidate list crosses the wire and
    sorts. Lock it so a Spark upgrade or query edit can't silently
    degrade to a full window sort (VERDICT r2 item 7)."""
    plan = _plan(spark, sf_dir, name)
    assert "WindowGroupLimit" in plan


def test_tfidf_no_forced_vocabulary_broadcast(spark, sf_dir):
    """The df/freq joins in the TF-IDF family must NOT carry a broadcast
    HINT: the vocabulary side is unbounded at 100 TB, and a forced hint
    blocks AQE from falling back to a shuffle join (VERDICT r2 item 3).
    AQE may still CHOOSE a broadcast at test scale — the lock is on the
    logical plan carrying no hint, not on the physical join choice.
    Exactly ONE hint is allowed per query: the 1-row corpus-total scalar
    (bounded by construction)."""
    for name in ("tfidf_top_terms", "unigram_surprisal_score"):
        df = QUERIES[name](spark, sf_dir)
        logical = df._jdf.queryExecution().analyzed().toString()
        n_hints = logical.count("ResolvedHint")
        assert n_hints <= 1, f"{name}: {n_hints} broadcast hints (max 1, the scalar)"


def test_global_index_no_single_partition_exchange(spark, sf_dir):
    """The epoch-shuffle index must never collapse to one partition
    (SinglePartition exchange = the 100 TB scale-killer)."""
    from pyspark.sql import functions as F

    from min_flink_spark.operators.relational import global_index

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    out = global_index(
        docs, [F.md5(F.col("doc_id").cast("string")), F.col("doc_id")], num_partitions=4
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert out.rdd.getNumPartitions() > 1


def _shuffles(plan: str) -> int:
    return (
        plan.count("Exchange")
        - plan.count("BroadcastExchange")
        - plan.count("ReusedExchange")
    )


def test_bigram_plan_is_map_side_until_count(spark, sf_dir):
    """Bigram construction must stay inside the token array (positional
    transform + explode) — the only shuffle allowed is the count agg's,
    plus the top-20 cut as TakeOrderedAndProject. A positional self-join
    (the oracle's relational formulation) would add a join shuffle."""
    plan = _plan(spark, sf_dir, "bigram_top_pairs")
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert _shuffles(plan) <= 1
    assert "TakeOrderedAndProject" in plan


def test_vocab_oov_plan_bounded_broadcast(spark, sf_dir):
    """The vocab join must broadcast (the build side is bounded at V=500
    rows BY CONSTRUCTION — unlike the TF-IDF df table this hint is
    legitimate at any corpus size) and the top-V cut must be
    TakeOrderedAndProject, never a global sort."""
    plan = _plan(spark, sf_dir, "vocab_oov_rate")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_conversation_assembly_single_shuffle(spark, sf_dir):
    """Ordered collect must be ONE two-phase object-hash aggregate on
    the thread key — a sort-based fallback or an extra exchange means
    the array_sort pattern regressed to a global sort."""
    plan = _plan(spark, sf_dir, "conversation_assembly")
    assert "ObjectHashAggregate" in plan
    assert _shuffles(plan) == 1
    assert "CartesianProduct" not in plan


def test_skew_report_no_global_sort(spark, sf_dir):
    """The heavy-key cut must be TakeOrderedAndProject over the per-key
    counts; the only single-partition exchange allowed is the 1-row
    totals scalar."""
    plan = _plan(spark, sf_dir, "skew_report")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("SinglePartition") <= 2  # scalar agg + its broadcast


def test_runtime_bloom_filter_semi_join_reduction(spark, sf_dir):
    """Scale technique lock: Spark's runtime bloom-filter injection
    (spark.sql.optimizer.runtime.bloomFilter.*, on by default in
    session.py via Spark's own default) must fire for the canonical
    shape — a big fact shuffle-joined to a selectively filtered side —
    pre-filtering the fact scan with might_contain before the shuffle.
    The size thresholds are scoped down here because testdata is far
    below the 10 GiB production threshold; at 100 TB the defaults fire
    on their own."""
    from pyspark.sql import functions as F

    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, "runtime bloom filter was not injected"
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


@pytest.mark.parametrize(
    "name",
    [
        "customer_order_distribution",
        "small_quantity_revenue",
        "large_volume_customers",
        "idle_rich_customers",
        "part_value_concentration",
        "lateral_top2_orders",
    ],
)
def test_decorrelated_shapes_never_nested_loop(spark, sf_dir, name):
    """Every decorrelated-subquery query must plan as hash/sort-merge
    joins — a CartesianProduct or BroadcastNestedLoopJoin means the
    decorrelation regressed to a per-row rescan (the 100 TB killer the
    rewrite exists to avoid). Scalar 1-row broadcasts are fine and do
    not appear as BNLJ because the filters are equi-comparisons."""
    plan = _plan(spark, sf_dir, name)
    assert "CartesianProduct" not in plan
    if name == "part_value_concentration":
        # its only join IS the 1-row scalar crossJoin (threshold
        # broadcast back) — no keyed join exists to assert on
        return
    assert any(
        j in plan for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )


def test_aqe_skew_join_splits_hot_partition(spark):
    """Scale technique lock #2: with AQE skew-join on (session default),
    a hot key whose partition exceeds the skew threshold is SPLIT at
    runtime (skew=true in the final sort-merge join) — the built-in
    complement to operators/skew.py's explicit salting. Thresholds are
    scoped down because test data is small; production defaults fire on
    real skew."""
    from pyspark.sql import functions as F

    overrides = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    prev = {k: spark.conf.get(k) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        fact = spark.range(200000).select(
            F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id") % 97).alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("payload"),
        )
        dim = spark.range(97).select(
            F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("dv")
        )
        j = fact.join(dim, "k")
        # collect() executes THIS DataFrame's queryExecution, making its
        # final adaptive plan inspectable (count() would plan separately)
        assert len(j.collect()) == 200000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, "AQE did not split the skewed partition"
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)


def test_all_query_outputs_scalar(spark, sf_dir):
    """The driver's canonicalizer pandas-sorts every output column and
    crashes on list/dict cells (round-3: `TypeError: unhashable type:
    'list'` redded both ANN queries on an ARRAY<BIGINT> column, values
    never compared). Lock the whole registry to scalar-only top-level
    output schemas — arrays must be stringified (concat_ws Spark-side,
    array_to_string/string_agg oracle-side) before they reach the
    gate."""
    banned = ("array", "map", "struct", "variant")
    offenders = {}
    for name, fn in QUERIES.items():
        schema = fn(spark, sf_dir).schema
        bad = [f.name for f in schema.fields if f.dataType.typeName() in banned]
        if bad:
            offenders[name] = bad
    assert not offenders, f"non-scalar output columns: {offenders}"


def test_no_forced_broadcast_of_sf_scaling_tables():
    """A broadcast HINT on a table whose row count scales with SF
    (customer 150k×SF, supplier 10k×SF, part 200k×SF, orders/lineitem
    facts) is a 100 TB executor OOM: the hint overrides AQE's
    size-based choice, which would broadcast while small and shuffle at
    scale (VERDICT r3 item 4). Hints are allowed only on
    fixed-cardinality tables (nation=25, region=5), literal/bounded
    frames, and 1-row scalars. Source-scan the package so a hint can't
    sneak back in under any query."""
    import pathlib
    import re

    pkg = pathlib.Path(__file__).resolve().parent.parent / "min_flink_spark"
    pat = re.compile(r"F\.broadcast\(\s*(customer|supplier|lineitem|orders|part)\b")
    hits = []
    for py in sorted(pkg.rglob("*.py")):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if pat.search(line):
                hits.append(f"{py.relative_to(pkg.parent)}:{i}: {line.strip()}")
    assert not hits, "forced broadcast of SF-scaling table(s):\n" + "\n".join(hits)


def test_char_entropy_plan_has_zero_shuffles(spark, sf_dir):
    """The entropy signal is per-row by construction — any Exchange in
    the plan means the higher-order-function formulation regressed to
    an explode+groupBy (corpus-sized shuffle at 100 TB)."""
    plan = _plan(spark, sf_dir, "char_entropy_quality")
    assert _shuffles(plan) == 0
    assert "Exchange" not in plan.replace("BroadcastExchange", "")


def test_scd2_plan_single_shuffle(spark, sf_dir):
    """Changelog compaction must be ONE partitioning (the key) reused
    by both window passes — a second exchange means the two windows
    stopped sharing their sort."""
    plan = _plan(spark, sf_dir, "scd2_user_state_intervals")
    assert _shuffles(plan) == 1
    assert "CartesianProduct" not in plan


def test_late_shipment_plan_semi_join_with_residual(spark, sf_dir):
    """The EXISTS must decorrelate to one LeftSemi hash/merge join
    carrying the inequality as a residual condition — never a per-row
    rescan (BroadcastNestedLoopJoin/CartesianProduct)."""
    plan = _plan(spark, sf_dir, "late_shipment_priority_counts")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pagerank_plan_no_cartesian(spark, sf_dir):
    """Three unrolled rounds must stay equi-join shaped (rank⋈edges on
    the key); a cartesian/nested loop means an iteration's join
    condition was lost."""
    plan = _plan(spark, sf_dir, "pagerank_copurchase")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_triangle_wedge_joins_are_hash_not_sort_merge(spark, sf_dir):
    """The wedge stream is O(E^1.5) rows; sorting it (SortMergeJoin)
    was the dominant cost before the SHUFFLE_HASH hints — lock the
    hash-join choice so a hint regression can't silently reintroduce
    the big-side sorts."""
    plan = _plan(spark, sf_dir, "triangle_counts_copurchase")
    assert "ShuffledHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_collect_confined_to_bounded_metadata_sites():
    """Doctrine lock: `.collect()` in the package is allowed ONLY at
    the audited bounded-metadata sites (scalar watermark, per-partition
    offset counts, per-source totals, k×dim centroids, the facade's
    user-facing sink, and streaming oracle sinks that inherently need
    rows on the driver). A new collect anywhere else is presumptively
    a driver-side data path and must be justified here."""
    import pathlib
    import re

    allowed = {
        "streaming/runner.py",    # 1-row max-event-time scalar (late router)
        "operators/relational.py",  # per-partition offset counts (global_index)
        "operators/graph.py",     # 3-scalar max-deg/max-id packing probe
        "operators/pipeline.py",  # per-source totals (domain_mix)
        "operators/similarity.py",  # k×dim centroids (IVF); PQ's m×n_codes
        # codebooks / per-partition partial sums / broadcast-side query
        # vectors — all bounded metadata by the shared small-queries
        # contract
        "core/stream.py",         # Stream.collect — the user-facing sink
        "queries/streaming_q.py",  # streaming oracle sinks (bounded partials)
    }
    pkg = pathlib.Path(__file__).resolve().parent.parent / "min_flink_spark"
    offenders = []
    for py in sorted(pkg.rglob("*.py")):
        rel = str(py.relative_to(pkg))
        if rel in allowed:
            continue
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if re.search(r"\.collect\(\)", line):
                offenders.append(f"{rel}:{i}: {line.strip()}")
    assert not offenders, "unaudited .collect() site(s):\n" + "\n".join(offenders)


def _unpartitioned_windows(df):
    """Window nodes with an EMPTY partitionSpec in the optimized
    logical plan — each one is a single-task global sort at runtime
    (the `WindowExec: No Partition Defined` warning)."""
    hits = []

    def walk(node):
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            hits.append(node.simpleStringWithNodeId())
        for i in range(node.children().length()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return hits


@pytest.mark.parametrize(
    "name",
    ["rfm_customer_scores", "concurrent_sessions_sweep", "funnel_time_to_convert"],
)
def test_no_unpartitioned_window_in_descaled_trio(spark, sf_dir, name):
    """VERDICT r4/r5 carried item: these three carried a global-sort /
    single-reducer-percentile stage over SF-scaling rows. They are now
    global_rank / prefix_sum_over_groups decompositions — any Window
    node with no PARTITION BY regressing into their plans reintroduces
    the single-task bottleneck."""
    df = QUERIES[name](spark, sf_dir)
    assert _unpartitioned_windows(df) == []


def test_funnel_interpolation_matches_percentile_aggregate(spark, sf_dir):
    """The value-at-rank + linear-interpolation p50/p90 must be
    bit-identical to Spark's exact percentile() aggregate (which is
    itself pinned to DuckDB quantile_cont by the oracle) on the real
    funnel delays."""
    import math

    from pyspark.sql import functions as F

    from min_flink_spark.sources import load_table

    got = QUERIES["funnel_time_to_convert"](spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", us)).alias("c_us"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("p_us"),
    )
    want = (
        firsts.filter(
            F.col("c_us").isNotNull()
            & F.col("p_us").isNotNull()
            & (F.col("p_us") >= F.col("c_us"))
        )
        .select(((F.col("p_us") - F.col("c_us")) / 1000000.0).alias("delay_sec"))
        .agg(
            F.count(F.lit(1)).alias("n_converted"),
            F.expr("percentile(delay_sec, 0.5)").alias("p50_sec"),
            F.expr("percentile(delay_sec, 0.9)").alias("p90_sec"),
        )
        .collect()[0]
    )
    assert got["n_converted"] == want["n_converted"] > 0
    assert math.isclose(got["p50_sec"], want["p50_sec"], rel_tol=0, abs_tol=0)
    assert math.isclose(got["p90_sec"], want["p90_sec"], rel_tol=0, abs_tol=0)


def test_plan_audit_flags_rogue_cartesian(spark, sf_dir):
    """The plan-audit stage must FAIL on an unadjudicated cartesian
    (VERDICT r6 item 2): feed audit() a deliberately cross-joined query
    not in EXPECTED_CROSS and assert the hard flag fires. Guards the
    run_all signal — a regression that reintroduces a data-scale
    cartesian must not print "ok"."""
    import tools.plan_audit as pa

    def rogue(spark_, sf):
        n = spark_.read.parquet(f"{sf}/nation.parquet")
        r = spark_.read.parquet(f"{sf}/region.parquet")
        return n.crossJoin(r).selectExpr("count(*) AS c")

    rows = pa.audit(spark, sf_dir, queries={"rogue_cartesian_probe": rogue})
    (name, stats, flags), = rows
    assert name == "rogue_cartesian_probe"
    assert stats["cartesian"] >= 1
    assert "UNEXPECTED-CROSS" in flags
    # and the four adjudicated r6 crosses are allowlisted, with teeth:
    for q in ("ann_pq_topk", "rfm_customer_scores",
              "funnel_time_to_convert", "concurrent_sessions_sweep"):
        assert q in pa.EXPECTED_CROSS


def test_plan_audit_flags_rogue_global_window(spark, sf_dir):
    """VERDICT r7 item 3: the single-partition channel is fail-closed.
    A deliberately-introduced global window (Window.orderBy with no
    partitionBy — the classic accidental full-data funnel) on a query
    NOT in EXPECTED_SINGLE_PARTITION must raise a hard flag."""
    import tools.plan_audit as pa
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    def rogue(spark_, sf):
        # a running total over ALL rows — Catalyst can't rewrite this
        # into TakeOrderedAndProject (unlike a row_number+limit, which
        # LimitPushPastWindow absorbs), so the Exchange SinglePartition
        # funnel genuinely appears
        ev = spark_.read.parquet(f"{sf}/events.parquet")
        return ev.select(
            "event_id",
            F.sum("value").over(W.orderBy("event_id")).alias("cum"),
        ).groupBy().agg(F.max("cum").alias("m"))

    rows = pa.audit(spark, sf_dir, queries={"rogue_global_window_probe": rogue})
    (name, stats, flags), = rows
    assert stats is not None, flags
    assert stats["single_part"] >= 1
    assert "UNEXPECTED-SINGLE-PARTITION" in flags
    # every adjudicated entry carries a written rationale (fail-closed
    # means the allowlist IS the adjudication record)
    assert all(
        isinstance(v, str) and v for v in pa.EXPECTED_SINGLE_PARTITION.values()
    )


def test_copurchase_edge_build_shared_and_bucketed(spark, sf_dir):
    """VERDICT r6 item 6: the graph family shares ONE bucketed edge
    table per (session, sf_dir) — the lineitem self-join is paid once,
    and src-keyed aggregation over the table plans with ZERO shuffles
    off the co-located bucketed scan."""
    from min_flink_spark.queries.analytics_q import copurchase_edges

    e1 = copurchase_edges(spark, sf_dir)
    agg = e1.groupBy("src").count()
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    shuffles = (
        plan.count("Exchange")
        - plan.count("BroadcastExchange")
        - plan.count("ReusedExchange")
    )
    assert "Bucketed: true" in plan
    assert shuffles == 0, plan
    # second call must hit the session catalog, not rebuild: same table
    import hashlib
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    assert spark.catalog.tableExists(f"mfs_copurchase_v1_{tag}")
    # symmetry + no self-loops: the contract every consumer relies on
    import pyspark.sql.functions as F
    assert e1.filter(F.col("src") == F.col("dst")).limit(1).count() == 0
    swapped = e1.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    assert e1.exceptAll(swapped).limit(1).count() == 0


def test_cms_sketch_agg_is_map_side_combined(spark, sf_dir):
    """The CMS grid build must plan as a partial→final hash aggregate
    (map-side combine collapses each partition to ≤ depth×width rows
    BEFORE the shuffle) — the property that makes the sketch 100 TB
    shaped. A HashAggregate pair with partial_count proves it; so does
    the grid-sized exchange."""
    plan = _plan(spark, sf_dir, "cms_term_frequencies")
    assert "partial_count" in plan, "grid agg lost its map-side combine"
    # and the whole build is hash aggregation, never sort-based
    assert "SortAggregate" not in plan


def test_kmv_sketch_keeps_window_group_limit(spark, sf_dir):
    """bottom_k_sketch's per-key top-k must ride WindowGroupLimit
    (partial k-row cut BEFORE the shuffle: per-key state k rows) —
    the bottom-k scale contract."""
    plan = _plan(spark, sf_dir, "kmv_distinct_users")
    assert "WindowGroupLimit" in plan


def test_mg_summary_single_scan_single_python_stage(spark, sf_dir):
    """misra_gries_summary scans the token stream ONCE through one
    mapInPandas stage; everything after operates on the summary-sized
    frame. Two Python stages (or a sort-aggregate) would mean the raw
    data path regressed."""
    from pyspark.sql import functions as F

    from min_flink_spark.functions.text import tokens
    from min_flink_spark.operators.pipeline import misra_gries_summary

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    tok = docs.select(F.explode(tokens(F.col("text"))).alias("term"))
    out = misra_gries_summary(tok, "term", m=64)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # AQE plan text repeats the lineage under "== Initial Plan ==" —
    # judge the FINAL plan only
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("MapInPandas") == 1
    assert final.count("Scan parquet") == 1
    # the ranked and cut branches share the summed exchange (one real
    # summary shuffle, the second consumer reuses it)
    assert "ReusedExchange" in final
    assert "SortAggregate" not in final


def test_bloom_bigm_probe_is_scan_side_with_one_reused_build(spark):
    """The large-m Bloom probe (bloom_probe_filter at m = 2^20) must
    keep the runtime-filter shape: all k probes are broadcast hash
    joins pipelined on the fact side (no fact shuffle, no sort-merge,
    no python), and AQE must materialize the word-frame build exchange
    ONCE, reusing it across the other k−1 joins (the identical-subplan
    alias discipline in bloom_probe_tag)."""
    from min_flink_spark.operators.relational import (
        bloom_probe_filter,
        bloom_word_frame,
    )

    from pyspark.sql import functions as F

    members = spark.range(0, 500).select(F.col("id").alias("k"))
    words = bloom_word_frame(members, "k", m_bits=1 << 20, k_hashes=3)
    fact = spark.range(0, 20_000).select(F.col("id").alias("k"))
    probe = bloom_probe_filter(fact, "k", words, 1 << 20, 3)
    # collect() on THIS frame: the final AQE plan is only attached to
    # the executed QueryExecution (a count() would run a separate one)
    assert len(probe.collect()) >= 500  # no false negative at this density
    final = (
        probe._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert final.count("BroadcastHashJoin") == 3
    assert final.count("ReusedExchange") == 2, "word build ran more than once"
    assert "SortMergeJoin" not in final and "ShuffledHashJoin" not in final
    assert "EvalPython" not in final


def test_bloom_probe_rejects_colliding_fact_columns(spark):
    """ADVICE r9: the probe plumbs fixed helper columns (_bp/_bw/_bm/
    _hit{i}/bloom_pass) through the fact frame — a caller column with
    one of these names must be refused loudly, not silently dropped by
    the per-iteration drop() or left to an ambiguous-join error."""
    import pytest

    from pyspark.sql import functions as F

    from min_flink_spark.operators.relational import (
        bloom_probe_tag,
        bloom_word_frame,
    )

    members = spark.range(0, 50).select(F.col("id").alias("k"))
    words = bloom_word_frame(members, "k", m_bits=1 << 10, k_hashes=2)
    for bad in ("_bw", "bloom_pass", "_hit1"):
        fact = spark.range(0, 10).select(
            F.col("id").alias("k"), F.lit(1).alias(bad)
        )
        with pytest.raises(ValueError, match="collide"):
            bloom_probe_tag(fact, "k", words, 1 << 10, 2)
    # _hit2 is outside k_hashes=2's helper set — not reserved, passes
    fact = spark.range(0, 10).select(
        F.col("id").alias("k"), F.lit(1).alias("_hit2")
    )
    assert bloom_probe_tag(fact, "k", words, 1 << 10, 2).count() == 10


def test_bucket_pruned_point_lookup_plan(spark, sf_dir):
    """The point lookup on the bucket column must read a SUBSET of
    buckets (SelectedBucketsCount in the scan) and plan with ZERO
    exchanges — the bucketed groupBy on the bucket key is map-side
    only. A missing SelectedBucketsCount means bucket pruning silently
    regressed to a full-table scan."""
    import re

    q = QUERIES["bucket_pruned_point_lookup"](spark, sf_dir)
    q.collect()
    plan = q._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, "bucket pruning missing from the scan"
    assert int(m.group(1)) <= 3 < int(m.group(2))
    assert "Exchange" not in plan.split("== Initial Plan ==")[0]
