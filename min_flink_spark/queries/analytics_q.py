"""Round-out analytics: pivot, percentiles, correlated subqueries,
approximate aggregates, duplicate clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from min_flink_spark.operators.graph import connected_components
from min_flink_spark.operators.relational import prefix_sum_over_groups
from min_flink_spark.queries.llm import SQL_CORPUS_NEAR, SQL_SHINGLES
from min_flink_spark.registry import query
from min_flink_spark.sources import load_table, register_views

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "pivot_event_counts",
    oracle=f"""
    SELECT user_id,
           {", ".join(f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS {t}" for t in EVENT_TYPES)}
    FROM events GROUP BY user_id
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation): one shuffle, values pinned
    so the output schema is static — required for a deterministic
    contract (and for Spark to skip the value-discovery job)."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, EVENT_TYPES)
    )


@query(
    "value_percentiles",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5)  AS p50,
           quantile_cont(value, 0.9)  AS p90,
           quantile_cont(value, 0.99) AS p99,
           min(value) AS vmin, max(value) AS vmax
    FROM events GROUP BY event_type
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles via operators/pipeline.
    exact_percentiles — value-at-rank evaluating DuckDB
    quantile_cont's op tree, NOT Spark's percentile() aggregate
    (r12: the two interpolation formulas are ULP-different at
    fractional ranks — first caught by the sf1 leg — and percentile()
    buffers every group value in one task, the single-reducer hazard).
    At 100 TB the same shape holds (distributed range sort per group)
    or switch to `approx_percentile` (t-digest, mergeable), exposed
    below as the certificate twin."""
    from min_flink_spark.operators.pipeline import exact_percentiles

    ev = load_table(spark, sf_dir, "events")
    pct = exact_percentiles(
        ev, "value", [0.5, 0.9, 0.99], ["p50", "p90", "p99"], keys=["event_type"]
    )
    ext = ev.groupBy("event_type").agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    return pct.join(ext, "event_type").select(
        "event_type", "p50", "p90", "p99", "vmin", "vmax"
    )


@query(
    "exact_percentile_grid",
    # quantile_cont over a derived column that (a) carries nulls mixed
    # into live groups (every 7th event_id) and (b) makes one whole
    # group all-null ('error') — quantile_cont ignores nulls and
    # returns NULL for an empty set, and GROUP BY keeps the all-null
    # group, exactly matching the operator's left-join-preserve
    # contract below.
    oracle="""
    WITH v AS (
      SELECT event_type,
             CASE WHEN event_type = 'error' OR event_id % 7 = 0
                  THEN NULL ELSE value END AS v
      FROM events
    )
    SELECT event_type,
           quantile_cont(v, 0.05) AS p05,
           quantile_cont(v, 0.25) AS p25,
           quantile_cont(v, 0.50) AS p50,
           quantile_cont(v, 0.75) AS p75,
           quantile_cont(v, 0.95) AS p95,
           CAST(count(v) AS BIGINT) AS n_vals
    FROM v GROUP BY event_type
    """,
)
def q_exact_percentile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-class pin of operators/pipeline.exact_percentiles'
    FULL contract (verdict r12 item 5) — previously exercised only
    through three queries that each used a narrow slice of it:

    - a multi-q grid (p05/p25/p50/p75/p95) computed in ONE pass — one
      distributed range sort per group, only rows AT the needed ranks
      surviving into the keys-sized final aggregate (never Spark's
      percentile(), whose buffer holds every group value in one task);
    - nulls mixed into live groups (ignored, as quantile_cont does);
    - an ALL-null group ('error'), which the operator drops and the
      caller must left-join back — pinned here with NULL percentiles
      and n_vals=0, the exact shape DuckDB's GROUP BY emits;
    - interpolation at fractional ranks evaluating quantile_cont's op
      tree ((⌈p⌉−p)·lo + (p−⌊p⌋)·hi), bit-identical to the replay.
    """
    from min_flink_spark.operators.pipeline import exact_percentiles

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.when(
            (F.col("event_type") == "error") | (F.col("event_id") % 7 == 0),
            F.lit(None),
        )
        .otherwise(F.col("value"))
        .alias("v"),
    )
    # expected_max_group_rows above the single-task bound: this gate
    # row pins the r13 TRUE-distributed value-at-rank path
    # (range-repartition + per-slice local ranks + offset broadcast —
    # no task ever holds a whole group) VIA the r14 auto-selection
    # (hint > max_single_task_rows → distributed), so the strategy
    # chooser itself sits under the driver gate; the three older
    # percentile queries pin the per-group window path.
    grid = exact_percentiles(
        ev, "v", [0.05, 0.25, 0.50, 0.75, 0.95],
        ["p05", "p25", "p50", "p75", "p95"], keys=["event_type"],
        expected_max_group_rows=30_000_000,
    )
    counts = ev.groupBy("event_type").agg(F.count("v").alias("n_vals"))
    # counts has every group (all-null included); grid lacks all-null
    # groups — the documented left-join-preserve composition. The
    # distributed path checkpoints its slice frame (r14 ReuseExchange
    # pin) — carry the backing so the gate can release it.
    from min_flink_spark.core.ckpt import carry_backing

    return carry_backing(
        counts.join(grid, "event_type", "left").select(
            "event_type", "p05", "p25", "p50", "p75", "p95", "n_vals"
        ),
        grid,
    )


@query(
    "approx_aggregates",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(count(*) AS BIGINT) AS n,
           TRUE AS approx_users_ok,
           TRUE AS approx_p50_ok
    FROM events GROUP BY event_type
    """,
)
def q_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates — the 100 TB path for distincts/percentiles
    (HLL / t-digest: mergeable, single-pass, bounded memory). Sketch
    estimates are engine-specific, so the driver row is an error-bound
    CERTIFICATE: exact counts (genuinely replayed by the oracle) plus
    booleans asserting |approx − exact| within the sketch's bound —
    HLL at rsd 0.02 stays far inside 10%, t-digest accuracy 1000 far
    inside 5% of the exact median. A sketch regression flips a boolean
    and reds the row."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("_au"),
        F.expr("approx_percentile(value, 0.5, 1000)").alias("_ap50"),
        F.countDistinct("user_id").alias("exact_users"),
        F.expr("percentile(value, 0.5)").alias("_p50"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        "n",
        (
            F.abs(F.col("_au") - F.col("exact_users")).cast("double")
            / F.col("exact_users")
            <= 0.10
        ).alias("approx_users_ok"),
        (
            F.abs(F.col("_ap50") - F.col("_p50"))
            / (F.abs(F.col("_p50")) + F.lit(1e-9))
            <= 0.05
        ).alias("approx_p50_ok"),
    )


@query(
    "correlated_subquery_big_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
    WHERE o_totalprice > (SELECT 1.8 * (CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                        / count(*))
                          FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
    """,
)
def q_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the engine's SQL entry point —
    Catalyst decorrelates it into an aggregate + join (no per-row
    re-execution, unlike the naive reading)."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        WHERE o_totalprice > (SELECT 1.8 * (CAST(sum(CAST(o2.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                                            / count(*))
                              FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        """
    )


@query(
    "dedup_clusters",
    # corpus/shingle fragments shared with llm.py so the mutation
    # constants and tokenization stay in lockstep with the Spark side
    oracle=f"""
    WITH RECURSIVE corpus AS ({SQL_CORPUS_NEAR}),
    {SQL_SHINGLES},
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    ),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    walk (node, component) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, w.component FROM edges e JOIN walk w ON e.v = w.node
      WHERE w.component < e.u OR w.component < e.v
    )
    SELECT node, CAST(min(component) AS BIGINT) AS component
    FROM walk GROUP BY node
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: exact-Jaccard(≥0.5) pairs → iterative min-label
    propagation (operators/graph.py). The oracle computes the same
    components with a recursive CTE — an iterative distributed
    algorithm checked against recursive SQL."""
    from min_flink_spark.operators.dedup import ngram_jaccard_pairs
    from min_flink_spark.queries.llm import _spark_near_corpus

    pairs = ngram_jaccard_pairs(
        _spark_near_corpus(spark, sf_dir), threshold=0.5
    ).select("doc_a", "doc_b")
    return connected_components(pairs).select(
        "node", F.col("component").cast("bigint").alias("component")
    )


@query(
    "grouping_sets_revenue",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT)
             AS grouping_id
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (a different lattice from rollup/cube:
    the two single-dimension margins + grand total, no cross cells) with
    grouping_id disambiguating real NULLs from margin NULLs — the ANSI
    mechanism rollup/cube compile into. One shuffle; the set expansion
    is map-side."""
    register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
               count(*) AS n,
               CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT)
                 AS grouping_id
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "explode_outer_tokens",
    oracle="""
    WITH t AS (
      SELECT event_id,
             list_filter(string_split_regex(lower(props), '[^a-z]+'),
                         x -> length(x) > 3) AS toks
      FROM events WHERE event_id < 500
    )
    SELECT event_id, u.tok
    FROM t, LATERAL unnest(CASE WHEN len(toks) = 0 THEN [NULL] ELSE toks END) u(tok)
    """,
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF with empty-input preservation (explode_outer vs explode):
    rows whose token array is empty still emit one null-token row — the
    flatMap-with-default contract a plain explode silently drops."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    toks = F.filter(
        F.split(F.lower("props"), "[^a-z]+"), lambda x: F.length(x) > 3
    )
    return ev.select("event_id", F.explode_outer(toks).alias("tok"))


@query(
    "median_and_central_tendency",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5) AS median_value,
           mode(event_type) AS modal_type,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def q_median_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """median via operators/pipeline.exact_percentiles (value-at-rank
    on quantile_cont's op tree — Spark's median()/percentile()
    interpolate as lo + (hi − lo)·frac, ULP-different from the oracle
    at even counts, r12; note DuckDB's own median() is DISCrete for
    even counts, hence quantile_cont in the oracle) and mode (tie-free
    on this data by construction)."""
    from min_flink_spark.operators.pipeline import exact_percentiles

    ev = load_table(spark, sf_dir, "events")
    med = exact_percentiles(
        ev, "value", [0.5], ["median_value"], keys=["event_type"]
    )
    rest = ev.groupBy("event_type").agg(
        F.mode("event_type").alias("modal_type"),
        F.count(F.lit(1)).alias("n"),
    )
    return med.join(rest, "event_type").select(
        "event_type", "median_value", "modal_type", "n"
    )


@query(
    "dedup_keep_best",
    oracle=f"""
    WITH RECURSIVE corpus AS ({SQL_CORPUS_NEAR}),
    {SQL_SHINGLES},
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
      FROM shingles a JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.5
    ),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ),
    walk (node, component) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, w.component FROM edges e JOIN walk w ON e.v = w.node
      WHERE w.component < e.u OR w.component < e.v
    ),
    comp AS (SELECT node, min(component) AS component FROM walk GROUP BY node),
    labeled AS (
      SELECT c.doc_id, coalesce(k.component, c.doc_id) AS component,
             length(c.text) AS quality
      FROM corpus c LEFT JOIN comp k ON k.node = c.doc_id
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY component
                                ORDER BY quality DESC, doc_id) AS rn,
             count(*) OVER (PARTITION BY component) AS csize
      FROM labeled
    )
    SELECT CAST(component AS BIGINT) AS component,
           CAST(doc_id AS BIGINT) AS kept_doc,
           CAST(quality AS BIGINT) AS kept_len,
           CAST(csize AS BIGINT) AS cluster_size
    FROM ranked WHERE rn = 1
    """,
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation endgame: near-dup pairs → clusters → keep ONE
    representative per cluster (longest text, ties to min doc_id), with
    singletons passing through as their own cluster. Distributed
    iterative components + per-cluster window pick, checked against a
    recursive-CTE + window oracle."""
    from min_flink_spark.operators.dedup import (
        keep_best_per_cluster,
        ngram_jaccard_pairs,
    )
    from min_flink_spark.queries.llm import _spark_near_corpus

    corpus = _spark_near_corpus(spark, sf_dir)
    pairs = ngram_jaccard_pairs(corpus, threshold=0.5).select("doc_a", "doc_b")
    docs = corpus.withColumn("quality", F.length("text").cast("bigint"))
    kept = keep_best_per_cluster(docs, pairs, id_col="doc_id", quality_col="quality")
    return kept.select(
        F.col("component").cast("bigint").alias("component"),
        F.col("doc_id").cast("bigint").alias("kept_doc"),
        F.col("quality").alias("kept_len"),
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
    )


@query(
    "declining_streak_users",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN value < lag(value) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id)
                  THEN 0 ELSE 1 END AS brk
      FROM events
    ),
    g AS (
      SELECT user_id,
             sum(brk) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS grp
      FROM o
    ),
    runs AS (
      SELECT user_id, grp, count(*) AS len FROM g GROUP BY user_id, grp
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(max(len) AS BIGINT) AS longest_decline
    FROM runs GROUP BY user_id
    HAVING max(len) >= 3
    """,
)
def q_declining_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern detection in batch (the MATCH_RECOGNIZE
    capability, expressed as gaps-and-islands): per user, the longest
    run of strictly declining values in (ts, event_id) order; keep
    runs spanning ≥3 events.

    Two window passes over ONE per-user sort (same partition key and
    ordering → Spark evaluates both in a single Window chain after one
    shuffle+sort), then two hash aggregations. No per-row Python; ties
    on ts resolve by event_id so the run segmentation is
    deterministic."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(F.col("value") < F.lag("value").over(w), F.lit(0)).otherwise(
        F.lit(1)
    )
    grp = F.sum(brk).over(
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = (
        ev.withColumn("grp", grp)
        .groupBy("user_id", "grp")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    return (
        runs.groupBy("user_id")
        .agg(F.max("len").alias("longest_decline"))
        .filter(F.col("longest_decline") >= 3)
    )


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SHARED symmetrized part co-purchase edge list — built ONCE
    per (session, sf_dir) and persisted as a parquet table bucketed on
    ``src``, then read back through the catalog by every graph-family
    query (pagerank / triangles / BFS / k-core). Each of the four used
    to re-pay the same lineitem self-join + distinct; now the build
    runs on the first call and the rest pay a bucketed co-located scan
    (VERDICT r6 item 6 — the pay-the-shuffle-once-at-write discipline
    of sources/bucketed.py exercised on an iterative workload).

    Contents: distinct directed pairs BOTH ways (u→v and v→u, no
    self-loops) — exactly the edge set pagerank/BFS/k-core consume;
    triangle counting derives its canonical undirected form with a
    plain ``src < dst`` filter on the same scan (no extra join). At
    100 TB this table is the graph-materialization step every
    production pipeline runs anyway; per-round joins on ``src`` then
    start from co-located buckets instead of a fresh shuffle.
    """
    import hashlib as _h
    import os as _os
    import shutil as _sh

    from min_flink_spark.sources.bucketed import write_bucketed

    tag = _h.sha1(sf_dir.encode()).hexdigest()[:10]
    # version marker: bump if the edge SEMANTICS ever change, so a
    # cross-session directory built by older code can't serve stale data
    name = f"mfs_copurchase_v1_{tag}"
    if spark.catalog.tableExists(name):
        return spark.table(name)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    tdir = _os.path.join(wh, name)
    done = _os.path.join(tdir, "_SUCCESS")
    if _os.path.exists(done):
        # a PRIOR session already materialized this exact artifact
        # (testdata is immutable, the name pins sf_dir + semantics) —
        # re-register the files instead of re-paying the self-join.
        # CLUSTERED BY restores the bucket spec the in-memory catalog
        # lost (bucket ids live in the writer's file-name suffixes), so
        # the cross-session path keeps the co-located plan property.
        spark.sql(
            f"CREATE TABLE {name} (src BIGINT, dst BIGINT) USING parquet "
            f"CLUSTERED BY (src) SORTED BY (src, dst) INTO 16 BUCKETS "
            f"LOCATION '{tdir}'"
        )
        return spark.table(name)
    spark.sql(f"DROP TABLE IF EXISTS {name}")  # half-written leftovers
    _sh.rmtree(tdir, ignore_errors=True)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") != F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )
    write_bucketed(edges, name, ["src"], 16, sort_cols=["src", "dst"])
    return spark.table(name)


# Three unrolled integer-PageRank rounds as SQL CTEs (the oracle twin of
# operators/graph.pagerank_integer). BIGINT sums are CAST back from
# DuckDB's HUGEINT; // is floor division on positive integers, matching
# Spark's `div`.
_PR_ITER = """
  {out} AS (
    SELECT n.node,
           CAST(150000 + (85 * COALESCE(s.m, 0)) // 100 AS BIGINT) AS rank
    FROM nodes n LEFT JOIN (
      SELECT e.dst AS node, CAST(SUM({prev}.rank // d.out_deg) AS BIGINT) AS m
      FROM e JOIN {prev} ON e.src = {prev}.node JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    ) s ON n.node = s.node
  )
"""


@query(
    "pagerank_copurchase",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
    ),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS out_deg FROM e GROUP BY src),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM nodes),
    {_PR_ITER.format(out="r1", prev="r0")},
    {_PR_ITER.format(out="r2", prev="r1")},
    {_PR_ITER.format(out="r3", prev="r2")}
    SELECT node AS part_id, rank AS rank_units
    FROM r3 ORDER BY rank DESC, node ASC LIMIT 100
    """,
)
def q_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative PageRank over the part co-purchase graph (parts
    sharing an order are linked both ways), 3 fixed rounds in pure
    integer arithmetic (operators/graph.pagerank_integer) — the
    importance-prior pass of link/citation curation pipelines, and the
    engine's demonstration of driver-looped iterative dataflow beyond
    label propagation (reference has no iteration surface; Flink's
    IterativeStream analog re-expressed as a deterministic unrolled
    plan). Integer floor-division ranks are bit-identical across
    engines and partitionings — no float drift over 3 rounds of
    re-aggregation. Edge build is per-order (bounded fan-out), never
    all-pairs — and paid ONCE per session: the four graph queries share
    the bucketed ``copurchase_edges`` table, so each round's src-side
    join starts from co-located buckets. Top-100 rides
    TakeOrderedAndProject."""
    from min_flink_spark.core.ckpt import carry_backing
    from min_flink_spark.operators.graph import pagerank_integer
    from min_flink_spark.operators.relational import top_k

    edges = copurchase_edges(spark, sf_dir)
    ranks = pagerank_integer(edges, iterations=3)
    out = top_k(
        ranks.select(F.col("node").alias("part_id"), F.col("rank").alias("rank_units")),
        k=100,
        order_by=[F.col("rank_units").desc(), F.col("part_id").asc()],
    )
    # top_k returns a NEW frame — carry the operator's checkpoint
    # release handle onto it (core.ckpt.release_backing after the
    # action), as the bfs/kcore wrappers do
    return carry_backing(out, ranks)


@query(
    "triangle_counts_copurchase",
    oracle="""
    WITH raw AS (
      SELECT DISTINCT least(a.l_partkey, b.l_partkey) AS a,
                      greatest(a.l_partkey, b.l_partkey) AS b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT a AS node FROM raw UNION ALL SELECT b FROM raw)
      GROUP BY node
    ),
    o AS (
      SELECT CASE WHEN (da.deg, raw.a) < (db.deg, raw.b)
                  THEN raw.a ELSE raw.b END AS src,
             CASE WHEN (da.deg, raw.a) < (db.deg, raw.b)
                  THEN raw.b ELSE raw.a END AS dst,
             CASE WHEN (da.deg, raw.a) < (db.deg, raw.b)
                  THEN db.deg ELSE da.deg END AS ddst
      FROM raw
      JOIN deg da ON da.node = raw.a
      JOIN deg db ON db.node = raw.b
    ),
    wedges AS (
      SELECT w1.src, w1.dst AS x, w2.dst AS y
      FROM o w1 JOIN o w2
        ON w1.src = w2.src AND (w1.ddst, w1.dst) < (w2.ddst, w2.dst)
    ),
    tri AS (
      SELECT wedges.src, x, y
      FROM wedges JOIN o ON o.src = x AND o.dst = y
    ),
    roles AS (
      SELECT src AS node FROM tri
      UNION ALL SELECT x FROM tri
      UNION ALL SELECT y FROM tri
    )
    SELECT node AS part_id, CAST(count(*) AS BIGINT) AS n_triangles
    FROM roles GROUP BY node
    """,
)
def q_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts over the co-purchase graph
    (operators/graph.triangle_counts): degree-ordered orientation
    bounds wedge generation by O(E^1.5) — the classic NodeIterator++ /
    compact-forward scheme, here as three equi-joins whose every
    intermediate is shuffle-partitionable by node id. The oracle
    replays orientation, wedge order, and closure verbatim via SQL row
    comparisons; counts are exact integers at any parallelism."""
    from min_flink_spark.operators.graph import triangle_counts

    # canonical undirected pairs = src<dst half of the shared
    # symmetrized bucketed table (one filter on a co-located scan; the
    # lineitem self-join is paid once per session across the family)
    edges = copurchase_edges(spark, sf_dir).filter(F.col("src") < F.col("dst"))
    from min_flink_spark.core.ckpt import carry_backing

    tri = triangle_counts(edges)
    out = tri.select(F.col("node").alias("part_id"), F.col("n_triangles"))
    # .select() returns a NEW frame — carry the operator's checkpoint
    # release handle onto it (core.ckpt.release_backing after the
    # action), as the bfs/kcore wrappers do
    return carry_backing(out, tri)


@query(
    "mad_outlier_flags",
    oracle="""
    WITH ev AS (
      SELECT event_id, event_type,
             CAST(round(value * 1000000) AS BIGINT) AS vm
      FROM events
    ),
    med AS (
      SELECT event_type, quantile_cont(vm, 0.5) AS med FROM ev GROUP BY event_type
    ),
    dev AS (
      SELECT ev.event_id, ev.event_type, abs(ev.vm - med.med) AS dev
      FROM ev JOIN med USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY event_type
    )
    SELECT dev.event_id, dev.event_type, dev.dev, mad.mad,
           dev.dev > 3 * mad.mad AS is_outlier
    FROM dev JOIN mad USING (event_type)
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier flags via median absolute deviation — the
    quality-filter statistic that, unlike z-scores, a few extreme rows
    cannot drag. Values ride as micro-unit integers so the two exact
    interpolated medians (Spark percentile ≡ DuckDB quantile_cont) and
    every derived |x−med| are bit-stable doubles (integers ± exact
    halves). Two grouped medians + two joins back on the type key; at
    100 TB swap `percentile` for the mergeable `approx_percentile`
    (same plan shape, t-digest state) — the flag threshold logic is
    unchanged."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 1000000).cast("bigint").alias("vm"),
    )
    med = ev.groupBy("event_type").agg(F.expr("percentile(vm, 0.5)").alias("med"))
    dev = ev.join(med, "event_type").select(
        "event_id", "event_type", F.abs(F.col("vm") - F.col("med")).alias("dev")
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(dev, 0.5)").alias("mad"))
    return dev.join(mad, "event_type").select(
        "event_id",
        "event_type",
        "dev",
        "mad",
        (F.col("dev") > 3 * F.col("mad")).alias("is_outlier"),
    )


@query(
    "trend_slope_by_type",
    oracle="""
    WITH anchor AS (SELECT min(ts) AS t0 FROM events),
    ev AS (
      SELECT event_type,
             (epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(t0 AS TIMESTAMP)))
               // 3600000000 AS x,
             CAST(round(value * 1000000) AS BIGINT) AS y
      FROM events CROSS JOIN anchor
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy,
             CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
      FROM ev GROUP BY event_type
    )
    SELECT event_type, n,
           -- int → double via VARCHAR: DuckDB's direct HUGEINT→DOUBLE
           -- cast is off by an ULP above 2^53 (measured r12:
           -- -3390571559116000000 → ...59997e+18), while its string
           -- parse is correctly rounded like Spark/Java/Python
           CAST(CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS VARCHAR) AS DOUBLE)
             / CAST(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS VARCHAR) AS DOUBLE)
             AS slope_micro_per_hour
    FROM s
    """,
)
def q_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key least-squares trend slope in closed form — drift
    detection over a metric stream (is 'value' rising for this event
    type?). One grouped pass accumulates n/Σx/Σy/Σxy/Σx² as EXACT
    integers (x = hours since the corpus anchor, y = micro-units), so
    numerator and denominator are identical integers in any engine and
    the single final division is bit-stable — closed-form regression
    without regr_slope's float-accumulation drift. The anchor is a
    1-row scalar; the aggregation is map-side combinable.

    WIDE accumulators are load-bearing, not optional (r12: the sf1 leg
    blew the old bigint closed form up with a real ARITHMETIC_OVERFLOW
    — n·Σxy ≈ 2×10⁵ · 2×10¹⁶ ≫ 2⁶³ at just 10× the gate data): sums
    ride decimal(18,0)-per-row → decimal(28,0) accumulators, the
    closed-form products evaluate in decimal(38,0), and the oracle
    mirrors with HUGEINT — both sides exact 38-digit integers, one
    final division."""
    ev0 = load_table(spark, sf_dir, "events")
    anchor = ev0.agg(F.min("ts").alias("t0"))
    ev = ev0.crossJoin(F.broadcast(anchor)).select(
        "event_type",
        F.expr(
            "(unix_micros(cast(ts as timestamp))"
            " - unix_micros(cast(t0 as timestamp))) div 3600000000"
        ).alias("x"),
        F.round(F.col("value") * 1000000).cast("bigint").alias("y"),
    )
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(18,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(18,0)")).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(18,0)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(18,0)")).alias("sxx"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    num = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return s.select(
        "event_type", "n", (num / den).alias("slope_micro_per_hour")
    )


@query(
    "funnel_time_to_convert",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'click'
                      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS c_us,
             min(CASE WHEN event_type = 'purchase'
                      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS p_us
      FROM events GROUP BY user_id
    ),
    converted AS (
      SELECT (p_us - c_us) / 1000000.0 AS delay_sec
      FROM firsts WHERE c_us IS NOT NULL AND p_us IS NOT NULL AND p_us >= c_us
    )
    SELECT CAST(count(*) AS BIGINT) AS n_converted,
           quantile_cont(delay_sec, 0.5) AS p50_sec,
           quantile_cont(delay_sec, 0.9) AS p90_sec,
           min(delay_sec) AS min_sec,
           max(delay_sec) AS max_sec
    FROM converted
    """,
)
def q_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, delay between FIRST
    click and FIRST purchase (converting users only), then EXACT
    percentiles across users — the product-analytics companion to the
    funnel-count query. One conditional-min grouped pass (map-side
    combinable, no self-join of the two event subsets); the exact
    p50/p90 are then computed as value-at-rank + linear interpolation
    over a ``global_rank`` of the delays instead of Spark's single-
    reducer ``percentile()`` aggregate, whose buffer holds EVERY value
    in one task (the 100× scale-killer this replaces). Rank positions
    ``pos = q·(n−1)`` (0-based) come in-plan from the rank frame's own
    count column; only the ≤6 rows at ranks {1, n, ⌊pos⌋+1, ⌈pos⌉+1}
    survive the filter into a constant-size final aggregate, and the
    interpolation ``(⌈pos⌉−pos)·v_lo + (pos−⌊pos⌋)·v_hi`` is the
    identical double op tree Spark's percentile() and DuckDB's
    quantile_cont both evaluate, so results stay bit-exact with the
    unchanged oracle (equality with percentile() is pinned by test).
    Ties in delay_sec are harmless: equal keys range-partition
    together and value-at-rank is tie-invariant."""
    from min_flink_spark.operators.relational import global_rank

    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", us)).alias("c_us"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("p_us"),
    )
    converted = firsts.filter(
        F.col("c_us").isNotNull()
        & F.col("p_us").isNotNull()
        & (F.col("p_us") >= F.col("c_us"))
    ).select(((F.col("p_us") - F.col("c_us")) / 1000000.0).alias("delay_sec"))
    ranked = global_rank(
        converted, [F.col("delay_sec").asc()], rank_col="_rk", total_col="_n"
    )

    def pos(q: float):
        return F.lit(q) * (F.col("_n") - 1).cast("double")

    def lo_rank(q: float):
        return F.floor(pos(q)).cast("bigint") + 1

    def hi_rank(q: float):
        return F.ceil(pos(q)).cast("bigint") + 1

    needed = ranked.filter(
        (F.col("_rk") == 1)
        | (F.col("_rk") == F.col("_n"))
        | (F.col("_rk") == lo_rank(0.5))
        | (F.col("_rk") == hi_rank(0.5))
        | (F.col("_rk") == lo_rank(0.9))
        | (F.col("_rk") == hi_rank(0.9))
    )

    def at(rank_expr):
        return F.max(F.when(F.col("_rk") == rank_expr, F.col("delay_sec")))

    one_row = needed.agg(
        F.coalesce(F.max("_n"), F.lit(0)).cast("bigint").alias("n_converted"),
        at(lo_rank(0.5)).alias("_v50lo"),
        at(hi_rank(0.5)).alias("_v50hi"),
        at(lo_rank(0.9)).alias("_v90lo"),
        at(hi_rank(0.9)).alias("_v90hi"),
        at(F.lit(1)).alias("min_sec"),
        at(F.col("_n")).alias("max_sec"),
    )

    def interp(q: float, lo: str, hi: str):
        p = F.lit(q) * (F.col("n_converted") - 1).cast("double")
        return F.when(F.ceil(p) == F.floor(p), F.col(lo)).otherwise(
            (F.ceil(p).cast("double") - p) * F.col(lo)
            + (p - F.floor(p).cast("double")) * F.col(hi)
        )

    return one_row.select(
        "n_converted",
        interp(0.5, "_v50lo", "_v50hi").alias("p50_sec"),
        interp(0.9, "_v90lo", "_v90hi").alias("p90_sec"),
        "min_sec",
        "max_sec",
    )


@query(
    "event_transition_probs",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    ),
    trans AS (
      SELECT event_type AS from_type, next_type AS to_type,
             CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    ),
    totals AS (
      SELECT from_type, CAST(sum(n) AS BIGINT) AS total
      FROM trans GROUP BY from_type
    )
    SELECT t.from_type, t.to_type, t.n,
           CAST(t.n AS DOUBLE) / tot.total AS prob
    FROM trans t JOIN totals tot USING (from_type)
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — the sequence-statistics pass behind next-action
    modeling and anomalous-flow detection. One per-user window (lead)
    on a single key shuffle, then two narrow aggregations; transition
    probability is one exact-integer division, so the matrix is
    bit-stable. event_id breaks timestamp ties."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    trans = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    totals = trans.groupBy("from_type").agg(F.sum("n").alias("total"))
    return trans.join(totals, "from_type").select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.col("total")).alias("prob"),
    )


@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, time_bucket(INTERVAL '1 day', min(ts)) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_day,
             datediff('day', f.cohort_day,
                      time_bucket(INTERVAL '1 day', e.ts)) AS day_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_day, CAST(day_offset AS BIGINT) AS day_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM activity
    WHERE day_offset BETWEEN 0 AND 7
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted as
    active at each day offset ≤7 — the product-analytics staple. The
    per-user first day is one grouped min (map-side combinable); the
    activity join is on the user key only (narrow row per user joins
    back); offsets are exact calendar-day integers, so every count is
    bit-stable."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    activity = (
        ev.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.date_trunc("day", F.col("ts")), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset").between(0, 7))
        .groupBy("cohort_day", F.col("day_offset").cast("bigint").alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


@query(
    "rfm_customer_scores",
    oracle="""
    WITH base AS (
      SELECT o_custkey AS c_custkey,
             max(o_orderdate) AS last_order,
             CAST(count(*) AS BIGINT) AS freq,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS monetary_cents
      FROM orders GROUP BY o_custkey
    )
    SELECT c_custkey,
           CAST(ntile(4) OVER (ORDER BY last_order DESC, c_custkey) AS BIGINT)
             AS r_score,
           CAST(ntile(4) OVER (ORDER BY freq DESC, c_custkey) AS BIGINT)
             AS f_score,
           CAST(ntile(4) OVER (ORDER BY monetary_cents DESC, c_custkey)
                AS BIGINT) AS m_score,
           freq, monetary_cents
    FROM base
    """,
)
def q_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM quartile scoring (recency / frequency / monetary) per
    customer — the segmentation pass behind lifecycle marketing and
    churn targeting. One grouped pass builds the three metrics
    (monetary in exact cents); quartiles are then EXACT ntile(4)
    replicas computed distributed: ``global_rank`` range-partitions
    each metric order (custkey tiebreak → total order), local
    partitioned row_number + offset self-join gives every customer its
    global rank with no single-partition window, and the ntile cut
    ranks (``b_j = j*(n div 4) + least(j, n mod 4)``) ride in-plan
    from the same count frame — score = 1 + #cut-ranks below. Values
    are bit-identical to ``ntile(4) OVER (ORDER BY ...)`` (the oracle
    replays exactly that); unlike the global window this survives 100×
    because the widest stage is a range-partitioned sort of one row
    per customer. Catalyst reuses both the orders aggregation exchange
    across the three rank branches and each range exchange between its
    window/count consumers."""
    from min_flink_spark.operators.relational import global_rank

    orders = load_table(spark, sf_dir, "orders")
    base = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "monetary_cents"
        ),
    )

    def quartile(metric: str, score_name: str) -> DataFrame:
        ranked = global_rank(
            base.select("c_custkey", metric),
            [F.col(metric).desc(), F.col("c_custkey").asc()],
            rank_col="_rk",
            total_col="_n",
        )
        base_sz = F.expr("_n div 4")
        rem = F.pmod(F.col("_n"), F.lit(4))

        def cut(j: int):
            return base_sz * j + F.least(F.lit(j), rem)

        score = (
            F.lit(1)
            + (F.col("_rk") > cut(1)).cast("int")
            + (F.col("_rk") > cut(2)).cast("int")
            + (F.col("_rk") > cut(3)).cast("int")
        ).cast("bigint")
        return ranked.select("c_custkey", score.alias(score_name))

    return (
        base.select("c_custkey", "freq", "monetary_cents")
        .join(quartile("last_order", "r_score"), "c_custkey")
        .join(quartile("freq", "f_score"), "c_custkey")
        .join(quartile("monetary_cents", "m_score"), "c_custkey")
        .select(
            "c_custkey", "r_score", "f_score", "m_score", "freq", "monetary_cents"
        )
    )


@query(
    "copurchase_pmi_top",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS total FROM baskets),
    item AS (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS c FROM baskets GROUP BY 1
    ),
    pair AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(count(*) AS BIGINT) AS c_ab
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 3
    )
    SELECT part_a, part_b, c_ab,
           CAST(round(ln(CAST(n.total AS DOUBLE) * pair.c_ab
                         / (ia.c * ib.c)) * 1000000) AS BIGINT) AS pmi_micro
    FROM pair
    JOIN item ia ON ia.l_partkey = pair.part_a
    JOIN item ib ON ib.l_partkey = pair.part_b
    CROSS JOIN n
    ORDER BY pmi_micro DESC, part_a ASC, part_b ASC LIMIT 50
    """,
)
def q_copurchase_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining: pointwise mutual information over part
    co-purchases — PMI = ln(N·c_ab/(c_a·c_b)) separates genuinely
    associated pairs from popularity artifacts (raw co-counts rank
    bestsellers together regardless of affinity). Basket dedup, one
    bounded per-order pair join (never all-pairs), min-support 3 cut
    BEFORE the item joins, micro-rounded ln per pair (exact-int hash),
    top-50 via TakeOrderedAndProject with full tiebreak."""
    from min_flink_spark.operators.relational import top_k

    baskets = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = baskets.agg(F.count_distinct("l_orderkey").alias("total"))
    item = baskets.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 3)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("ca"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("cb"))
    scored = (
        pair.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "c_ab",
            F.round(
                F.log(
                    F.col("total").cast("double")
                    * F.col("c_ab")
                    / (F.col("ca") * F.col("cb"))
                )
                * 1000000
            ).cast("bigint").alias("pmi_micro"),
        )
    )
    return top_k(
        scored,
        k=50,
        order_by=[
            F.col("pmi_micro").desc(),
            F.col("part_a").asc(),
            F.col("part_b").asc(),
        ],
    )


@query(
    "weekly_active_growth",
    oracle="""
    WITH wk AS (
      SELECT time_bucket(INTERVAL '7 days', ts,
                         TIMESTAMP '2024-01-01') AS week_start,
             CAST(count(DISTINCT user_id) AS BIGINT) AS wau,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1
    )
    SELECT week_start, wau, n_events,
           coalesce(lag(wau) OVER (ORDER BY week_start), 0) AS prev_wau,
           CASE WHEN lag(wau) OVER (ORDER BY week_start) IS NULL THEN 0.0
                ELSE CAST(wau - lag(wau) OVER (ORDER BY week_start) AS DOUBLE)
                     / lag(wau) OVER (ORDER BY week_start) END AS wow_growth
    FROM wk
    """,
)
def q_weekly_active_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: weekly active users anchored to a fixed
    epoch, with week-over-week growth rate — the north-star-metric
    query every product team schedules. One distinct-count aggregation
    per week, a single lag window over the handful of week rows (the
    ORDER BY runs on #weeks rows, not events), and one exact-int
    division."""
    ev = load_table(spark, sf_dir, "events")
    wk = ev.groupBy(
        # startTime 4 days: Spark's window grid anchors at the epoch
        # (1970-01-01, a Thursday); +4 days lands the grid on Mondays,
        # matching the oracle's 2024-01-01 (Monday) bucket origin
        F.window("ts", "7 days", startTime="4 days").alias("w")
    ).agg(
        F.count_distinct("user_id").alias("wau"),
        F.count(F.lit(1)).alias("n_events"),
    ).select(F.col("w.start").alias("week_start"), "wau", "n_events")
    w = Window.orderBy("week_start")
    prev = F.lag("wau").over(w)
    return wk.select(
        "week_start",
        "wau",
        "n_events",
        # coalesce: a NULL in a BIGINT column rides as NaN-in-float64
        # through the gate's pandas materialization, flipping the dtype
        F.coalesce(prev, F.lit(0)).alias("prev_wau"),
        F.when(prev.isNull(), F.lit(0.0))
        .otherwise((F.col("wau") - prev).cast("double") / prev)
        .alias("wow_growth"),
    )


@query(
    "concurrent_sessions_sweep",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       <= INTERVAL '4 hours'
                  THEN 0 ELSE 1 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    sessions AS (
      SELECT user_id, session_id, min(ts) AS s, max(ts) AS e
      FROM numbered GROUP BY user_id, session_id
    ),
    deltas AS (
      SELECT s AS t, 1 AS d FROM sessions
      UNION ALL
      SELECT e, -1 FROM sessions
    ),
    sweep AS (
      SELECT t, sum(sum(d)) OVER (ORDER BY t
                                  ROWS UNBOUNDED PRECEDING) AS live
      FROM deltas GROUP BY t
    )
    SELECT time_bucket(INTERVAL '1 day', t) AS day,
           CAST(max(live) AS BIGINT) AS peak_concurrency
    FROM sweep GROUP BY 1
    """,
)
def q_concurrent_sessions_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak session concurrency per day by SWEEP LINE: sessions
    (4-hour-gap islands) become ±1 boundary deltas, a running sum of
    the deltas gives the live count at every boundary, and the daily
    max is the capacity-planning number. Deltas are grouped by
    timestamp first so coincident starts and ends collapse
    deterministically before the running sum; ends tie with starts at
    the same instant by summing their deltas together (a session
    touching another's start counts as overlapping at that instant on
    both engines identically). The running sum is the two-level
    ``prefix_sum_over_groups`` decomposition — a DAY-partitioned
    window plus carry-in offsets from a triangle self-join over the
    per-day delta totals (calendar-bounded frame) — which produces
    values identical to the oracle's global ``sum() OVER (ORDER BY
    t)`` with no unpartitioned window: at 100× the widest stage sorts
    one day's boundaries, not the whole history."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    flagged = ev.select(
        "user_id",
        "ts",
        F.when(
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.lag(F.col("ts")).over(w).cast("timestamp"))
            <= 4 * 3600 * 1_000_000,
            0,
        )
        .otherwise(1)
        .alias("new_session"),
    )
    numbered = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sessions = numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    deltas = sessions.select(F.col("s").alias("t"), F.lit(1).alias("d")).unionByName(
        sessions.select(F.col("e").alias("t"), F.lit(-1).alias("d"))
    )
    per_t = deltas.groupBy("t").agg(F.sum("d").alias("dd"))
    sweep = prefix_sum_over_groups(
        per_t,
        F.date_trunc("day", F.col("t")),
        [F.col("t").asc()],
        "dd",
        out_col="live",
    )
    return sweep.groupBy(F.date_trunc("day", F.col("t")).alias("day")).agg(
        F.max("live").cast("bigint").alias("peak_concurrency")
    )


@query(
    "interevent_gap_histogram",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP))
             - lag(epoch_us(CAST(ts AS TIMESTAMP)))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT event_type,
           CAST(length(bin(gap_us // 1000000)) - 1 AS BIGINT)
             AS log2_gap_sec,
           CAST(count(*) AS BIGINT) AS n
    FROM gaps
    WHERE gap_us IS NOT NULL AND gap_us >= 1000000
    GROUP BY 1, 2
    """,
)
def q_interevent_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-scale latency histogram with EXACT integer bucketing: the
    gap to the user's previous event lands in bucket ⌊log₂(gap
    seconds)⌋ computed as ``length(bin(x)) − 1`` — a pure integer
    operation identical in any engine, where a float ln(x)/ln(2) drifts
    at bucket boundaries. The latency-distribution shape every
    operational dashboard wants, exactly replayable: one lag window on
    the user shuffle, one hash aggregation. Sub-second gaps are
    excluded (bucket 0 would conflate them with 1-second gaps)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = ev.select(
        "event_type",
        (us - F.lag(us).over(w)).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull() & (F.col("gap_us") >= 1000000))
    # `div`/`//`: explicit FLOOR division on both sides — a float
    # divide + cast truncates in Spark but rounds in DuckDB
    bucket = (
        F.length(F.bin(F.expr("gap_us div 1000000"))) - 1
    ).cast("bigint")
    return gaps.groupBy("event_type", bucket.alias("log2_gap_sec")).agg(
        F.count(F.lit(1)).alias("n")
    )


_BFS_ROUND = """
  d{h} AS (
    SELECT node, {h} AS hops FROM (
      SELECT DISTINCT e.dst AS node FROM e JOIN d{prev} ON e.src = d{prev}.node
    ) f WHERE NOT EXISTS (SELECT 1 FROM v{prev} x WHERE x.node = f.node)
  ),
  v{h} AS (SELECT * FROM v{prev} UNION ALL SELECT * FROM d{h})
"""


@query(
    "bfs_reach_copurchase",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
    ),
    d0 AS (SELECT DISTINCT src AS node, 0 AS hops FROM e WHERE src < 5),
    v0 AS (SELECT * FROM d0),
    {_BFS_ROUND.format(h=1, prev=0)},
    {_BFS_ROUND.format(h=2, prev=1)},
    {_BFS_ROUND.format(h=3, prev=2)}
    SELECT hops,
           CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(min(node) AS BIGINT) AS min_node,
           CAST(max(node) AS BIGINT) AS max_node,
           CAST(sum(node) AS BIGINT) AS node_checksum
    FROM v3 GROUP BY hops
    """,
)
def q_bfs_reach_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS (operators/graph.bfs_hops) over the part
    co-purchase graph from seed parts (ids < 5), 3 fixed hops — the
    k-hop-neighborhood primitive behind blast-radius analysis and
    GraphSAGE-style neighborhood sampling. Per round: frontier×edges
    equi-join + anti-join against the visited set (two key-joins,
    bucketing-co-locatable); visited is checkpointed per round and the
    only driver crossing is the empty-frontier early-exit scalar. The
    gate row carries the per-hop frontier census (count/extrema/id
    checksum), which pins every frontier's exact membership; the
    oracle replays the expansion with unrolled rounds."""
    from min_flink_spark.operators.graph import bfs_hops

    # shared bucketed edge table: per-hop frontier⋈edges joins on src
    # start from co-located buckets, and the lineitem self-join is paid
    # once per session across the graph family (no per-query
    # checkpoint needed — the scan IS the materialization)
    from min_flink_spark.core.ckpt import attach_backing

    edges = copurchase_edges(spark, sf_dir)
    seeds = edges.filter(F.col("src") < 5).select(F.col("src").alias("node"))
    reached = bfs_hops(edges, seeds, max_hops=3)
    out = reached.groupBy("hops").agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("node").cast("bigint").alias("min_node"),
        F.max("node").cast("bigint").alias("max_node"),
        F.sum("node").cast("bigint").alias("node_checksum"),
    )
    # the census is lazy over the final visited checkpoint — expose the
    # release handle (core.ckpt.release_backing after the action)
    return attach_backing(out, reached)


_KCORE_ROUND = """
  e{i} AS (
    SELECT s.src, s.dst FROM e{prev} s
    WHERE s.src IN (SELECT src FROM e{prev} GROUP BY src HAVING count(*) >= 100)
      AND s.dst IN (SELECT src FROM e{prev} GROUP BY src HAVING count(*) >= 100)
  )
"""

_KCORE_STATS = """
  SELECT {i} AS peel_round,
         CAST(count(*) AS BIGINT) AS n_directed_edges,
         CAST(count(DISTINCT src) AS BIGINT) AS n_nodes,
         CAST(COALESCE(sum(DISTINCT src), 0) AS BIGINT) AS node_checksum
  FROM e{i}
"""


@query(
    "kcore_copurchase",
    oracle=f"""
    WITH e0 AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
    ),
    {_KCORE_ROUND.format(i=1, prev=0)},
    {_KCORE_ROUND.format(i=2, prev=1)},
    {_KCORE_ROUND.format(i=3, prev=2)}
    {_KCORE_STATS.format(i=1)} UNION ALL
    {_KCORE_STATS.format(i=2)} UNION ALL
    {_KCORE_STATS.format(i=3)}
    """,
)
def q_kcore_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peeling (operators/graph.k_core, k=100, 3 fixed rounds)
    on the part co-purchase graph — dense-subgraph extraction: nodes
    of degree < 100 peel off with their edges each round, cascading
    until only the mutually-dense core survives (the degeneracy pass
    that strips periphery before expensive graph analytics). Each
    round is one hash-agg + two semi-joins on the shrinking,
    re-checkpointed edge list. The gate row carries the full peeling
    TRAJECTORY (per-round edge/node counts + id checksum), pinning
    every intermediate graph, not just the fixed point; the oracle
    replays the rounds unrolled. k=100 sits inside the degree range
    at every SF (median degree 89-119, max 138-222), so real
    cascading occurs at each scale."""
    from min_flink_spark.operators.graph import k_core

    # shared bucketed edge table (build paid once per session across
    # the graph family); degree hash-aggs on src run from co-located
    # buckets — no checkpoint needed, the scan is the materialization
    edges = copurchase_edges(spark, sf_dir)
    from min_flink_spark.core.ckpt import attach_backing

    rounds = k_core(edges, k=100, rounds=3)
    stats = None
    for i, df in enumerate(rounds, start=1):
        s = df.agg(
            F.lit(i).alias("peel_round"),
            F.count(F.lit(1)).alias("n_directed_edges"),
            F.count_distinct(F.col("src")).alias("n_nodes"),
            F.coalesce(F.sum_distinct(F.col("src")), F.lit(0))
            .cast("bigint")
            .alias("node_checksum"),
        )
        stats = s if stats is None else stats.unionByName(s)
    # the trajectory census reads every round's checkpoint — expose the
    # release handle (core.ckpt.release_backing after the action)
    return attach_backing(stats, *rounds)


_SKETCH_PCT = """
  SELECT event_type, CAST({q} AS INT) AS pct, CAST(min(bin) AS INT) AS bin
  FROM c WHERE 100 * cum >= {q} * total GROUP BY event_type
"""

# ONE ground truth for the sketch family: the batch-merge query, the
# streaming-state twin (queries/streaming_q.py), and the windowed
# range-merge variant must stay bit-identical — all decorators
# reference THIS spec (parametric only in the row population).
def sketch_quantiles_oracle(vm_where: str = "") -> str:
    return f"""
    WITH vm AS (
      SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS vm
      FROM events {vm_where}
    ),
    b AS (
      SELECT event_type,
             CASE WHEN vm <= 0 THEN -1
                  ELSE CAST(length(bin(vm)) - 1 AS INT) END AS bin,
             count(*) AS cnt
      FROM vm GROUP BY 1, 2
    ),
    t AS (SELECT event_type, sum(cnt) AS total FROM b GROUP BY 1),
    c AS (
      SELECT b.event_type, bin,
             sum(cnt) OVER (PARTITION BY b.event_type ORDER BY bin) AS cum,
             t.total
      FROM b JOIN t USING (event_type)
    ),
    hits AS (
      {_SKETCH_PCT.format(q=50)} UNION ALL
      {_SKETCH_PCT.format(q=90)} UNION ALL
      {_SKETCH_PCT.format(q=99)}
    )
    SELECT event_type, pct, bin,
           CASE WHEN bin < 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(1 AS BIGINT) << bin END AS lo_micro
    FROM hits
    """


SKETCH_QUANTILES_ORACLE = sketch_quantiles_oracle()


@query("sketch_quantiles_merged", oracle=SKETCH_QUANTILES_ORACLE)
def q_sketch_quantiles_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable log₂-histogram quantiles (operators/pipeline.
    log_histogram_sketch) — the one-pass distributed percentile
    primitive (the t-digest/KLL role) with EXACT cross-engine replay:
    per-event-type p50/p90/p99 computed from TWO per-shard partial
    sketches (odd/even day-of-month — the per-day incremental shape)
    merged by count addition. The oracle computes the quantiles
    DIRECTLY from all rows, so the gate row IS the proof that
    merge(sketch(A), sketch(B)) ≡ sketch(A ∪ B) bit-for-bit. Sketch
    size is keys × ≤64 bins regardless of data volume; at 100 TB the
    whole pass is one map-side-combine hash agg per shard plus a
    sketch-sized window — the underlying data is scanned once and
    never sorted."""
    from min_flink_spark.operators.pipeline import (
        log_histogram_sketch,
        merge_histogram_sketches,
        sketch_quantiles,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 1_000_000).cast("bigint").alias("vm"),
        (F.dayofmonth(F.col("ts").cast("timestamp")) % 2).alias("_shard"),
    )
    # ONE scan builds all per-shard partials (shard rides as a sketch
    # key); the shard split for the merge happens on the SKETCH-sized
    # frame — in production each day's partial is its own stored table
    partials = log_histogram_sketch(ev, ["_shard", "event_type"], F.col("vm"))
    parts = [
        partials.filter(F.col("_shard") == s).drop("_shard") for s in (0, 1)
    ]
    merged = merge_histogram_sketches(*parts)
    return sketch_quantiles(merged, ["event_type"], [50, 90, 99])


@query(
    "sketch_quantiles_windowed",
    oracle=sketch_quantiles_oracle(
        "WHERE time_bucket(INTERVAL '1 day', ts) >= TIMESTAMP '2024-01-08' "
        "AND time_bucket(INTERVAL '1 day', ts) < TIMESTAMP '2024-01-15'"
    ),
)
def q_sketch_quantiles_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series quantiles — the log₂-histogram leg of the summary ×
    event-time-window symmetry (kmv/cms/bitmap landed the other legs):
    per (1-day tumbling window, event_type) a ≤64-bin sketch is built
    from that day's partition alone (one scan, the window start rides
    as a sketch key), STORED, and any date range answers percentile
    queries by merging the stored partials — count addition over
    range × keys × 64 rows, never a rescan (sketch merge identity is
    exact: integer counts, zero drift). The gate row merges Jan 8-14
    and reports per-event-type p50/p90/p99; the oracle computes the
    same quantiles directly from the range's raw rows, so the row IS
    the proof that the stored-partials path equals the rescan path
    bit-for-bit."""
    from min_flink_spark.operators.pipeline import (
        log_histogram_sketch,
        merge_histogram_sketches,
        sketch_quantiles,
    )

    lo = F.lit("2024-01-08").cast("timestamp_ntz")
    hi = F.lit("2024-01-15").cast("timestamp_ntz")
    ev = load_table(spark, sf_dir, "events").select(
        F.window("ts", "1 day").getField("start").alias("day"),
        "event_type",
        F.round(F.col("value") * 1_000_000).cast("bigint").alias("vm"),
    )
    # the stored per-day partials (scan-once artifact)
    daily = log_histogram_sketch(ev, ["day", "event_type"], F.col("vm"))
    rng = daily.filter((F.col("day") >= lo) & (F.col("day") < hi)).drop("day")
    merged = merge_histogram_sketches(rng)
    return sketch_quantiles(merged, ["event_type"], [50, 90, 99])


@query(
    "sketch_quantiles_key_rollup",
    oracle=f"""
    WITH vm0 AS (
      SELECT event_type, CAST(round(value * 1000000) AS BIGINT) AS vm
      FROM events
      WHERE time_bucket(INTERVAL '1 day', ts) >= TIMESTAMP '2024-01-08'
        AND time_bucket(INTERVAL '1 day', ts) < TIMESTAMP '2024-01-15'
    ),
    g AS (
      SELECT event_type, vm FROM vm0
      UNION ALL SELECT '__ALL__' AS event_type, vm FROM vm0
    ),
    b AS (
      SELECT event_type,
             CASE WHEN vm <= 0 THEN -1
                  ELSE CAST(length(bin(vm)) - 1 AS INT) END AS bin,
             count(*) AS cnt
      FROM g GROUP BY 1, 2
    ),
    t AS (SELECT event_type, sum(cnt) AS total FROM b GROUP BY 1),
    c AS (
      SELECT b.event_type, bin,
             sum(cnt) OVER (PARTITION BY b.event_type ORDER BY bin) AS cum,
             t.total
      FROM b JOIN t USING (event_type)
    ),
    hits AS (
      {_SKETCH_PCT.format(q=50)} UNION ALL
      {_SKETCH_PCT.format(q=90)} UNION ALL
      {_SKETCH_PCT.format(q=99)}
    )
    SELECT event_type, pct, bin,
           CASE WHEN bin < 0 THEN CAST(0 AS BIGINT)
                ELSE CAST(1 AS BIGINT) << bin END AS lo_micro
    FROM hits
    """,
)
def q_sketch_quantiles_key_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEYED rollup over stored histogram partials (VERDICT r9 item 6
    — the key axis itself is mergeable, completing the log₂-histogram
    row of the mode matrix): the SAME stored (day, event_type)
    partials that sketch_quantiles_windowed range-merges also answer
    the COARSER grouping — global (all-event-type) percentiles — by
    summing the key axis away, exactly as the day axis merges away
    (integer counts, zero drift, both re-aggregations exact). One
    stored artifact serves every grouping at or above its key grain;
    neither the per-key nor the global answer rescans the raw rows.
    The gate row carries the Jan 8-14 per-event-type p50/p90/p99 AND
    the '__ALL__' rollup rows from one partial frame; the oracle
    computes both groupings directly from the range's raw rows, so
    the row proves rollup(partials) ≡ sketch(raw) on BOTH levels."""
    from min_flink_spark.operators.pipeline import (
        log_histogram_sketch,
        merge_histogram_sketches,
        sketch_quantiles,
    )

    lo = F.lit("2024-01-08").cast("timestamp_ntz")
    hi = F.lit("2024-01-15").cast("timestamp_ntz")
    ev = load_table(spark, sf_dir, "events").select(
        F.window("ts", "1 day").getField("start").alias("day"),
        "event_type",
        F.round(F.col("value") * 1_000_000).cast("bigint").alias("vm"),
    )
    # the stored per-(day, key) partials (scan-once artifact) — built
    # ONCE; both grouping levels below re-aggregate this sketch-sized
    # frame, so the union plans the raw scan a single time per branch
    # of the rollup, never per quantile
    daily = log_histogram_sketch(ev, ["day", "event_type"], F.col("vm"))
    rng = daily.filter((F.col("day") >= lo) & (F.col("day") < hi)).drop("day")
    per_key = merge_histogram_sketches(rng)
    fine = sketch_quantiles(per_key, ["event_type"], [50, 90, 99])
    # the key rollup: merge the KEY axis away from the same partials
    coarse = sketch_quantiles(
        merge_histogram_sketches(
            per_key.select(
                F.lit("__ALL__").alias("event_type"), "bin", "cnt"
            )
        ),
        ["event_type"],
        [50, 90, 99],
    )
    return fine.unionByName(coarse)


_LPA_ROUND = """
  l{t} AS (
    SELECT node, label FROM (
      SELECT e.dst AS node, l.label,
             row_number() OVER (PARTITION BY e.dst
                                ORDER BY count(*) DESC, l.label ASC) AS rn
      FROM e JOIN l{prev} l ON e.src = l.node
      GROUP BY 1, 2
    ) WHERE rn = 1
  )"""


@query(
    "lpa_communities_copurchase",
    oracle=f"""
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
    ),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
    {_LPA_ROUND.format(t=1, prev=0)},
    {_LPA_ROUND.format(t=2, prev=1)},
    {_LPA_ROUND.format(t=3, prev=2)},
    comm AS (
      SELECT label, CAST(count(*) AS BIGINT) AS n_members,
             CAST(sum(node) AS BIGINT) AS member_checksum
      FROM l3 GROUP BY 1
    )
    SELECT CAST(label AS BIGINT) AS label, n_members, member_checksum
    FROM comm ORDER BY n_members DESC, label ASC LIMIT 10
    """,
)
def q_lpa_communities_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-propagation community detection (operators/graph.
    label_propagation) over the part co-purchase graph, 3 synchronous
    rounds with the smallest-label tie-break — the sixth member of the
    iterative-graph family (CC, PageRank, triangles, BFS, k-core), and
    like them a pure function of (edges, rounds) so the oracle replays
    the rounds by unrolling. Per round: labels⋈edges on the bucketed
    src key, a (node, label) map-side-combined vote count, one
    node-partitioned argmax window; rounds are checkpointed and
    superseded blocks freed. The gate row is the top-10 community
    census (size + member-id checksum — pins exact membership, not
    just sizes); tie-break by label keeps the LIMIT deterministic."""
    from min_flink_spark.core.ckpt import attach_backing
    from min_flink_spark.operators.graph import label_propagation

    edges = copurchase_edges(spark, sf_dir)
    labels = label_propagation(edges, rounds=3)
    comm = labels.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("node").cast("bigint").alias("member_checksum"),
    )
    out = (
        comm.orderBy(F.col("n_members").desc(), F.col("label").asc())
        .limit(10)
        .select(
            F.col("label").cast("bigint").alias("label"),
            "n_members",
            "member_checksum",
        )
    )
    return attach_backing(out, labels)


@query(
    "bucket_pruned_point_lookup",
    oracle="""
    WITH e AS (
      SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
    )
    SELECT src, CAST(count(*) AS BIGINT) AS n_neighbors,
           CAST(sum(dst) AS BIGINT) AS neighbor_checksum
    FROM e WHERE src IN (10, 42, 99) GROUP BY 1
    """,
)
def q_bucket_pruned_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BUCKET PRUNING — the point-lookup complement to partition
    pruning (partitioned_pruned_read): an equality/IN filter on the
    bucket column of a bucketed table reads ONLY the buckets those
    values hash to (plan shows ``SelectedBucketsCount: ≤3 out of 16``),
    and the groupBy on the bucket key is map-side only — the whole
    lookup plans with ZERO exchanges (plan-locked). At 100 TB this is
    the difference between scanning a 6 TB table and reading a few
    hundred MB for a point query — the physical-design story
    (write_bucketed) paying off on the read path twice: shuffle-free
    joins (bucketed_cobucket_join_stats) AND pruned point lookups.
    The per-part neighbor census replays from the raw lineitem
    self-join on the oracle side."""
    edges = copurchase_edges(spark, sf_dir)
    return (
        edges.filter(F.col("src").isin(10, 42, 99))
        .groupBy("src")
        .agg(
            F.count(F.lit(1)).alias("n_neighbors"),
            F.sum("dst").cast("bigint").alias("neighbor_checksum"),
        )
    )
