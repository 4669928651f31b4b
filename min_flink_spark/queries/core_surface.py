"""Reference-surface queries (SURVEY §2.2-2.4): map/flatMap/filter/
keyBy/reduce family — the operators min-flink actually ships."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from min_flink_spark.core.stream import Stream
from min_flink_spark.registry import query
from min_flink_spark.sources import load_table


@query(
    "map_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           upper(l_returnflag) AS flag
    FROM lineitem
    WHERE l_quantity > 30 AND l_discount >= 0.05
    """,
)
def q_map_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map (StreamMap.java:28-42) + filter (StreamFilter.java:28-42) as
    pushdown-friendly column expressions."""
    return (
        Stream(load_table(spark, sf_dir, "lineitem"))
        .filter((F.col("l_quantity") > 30) & (F.col("l_discount") >= 0.05))
        .map(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.upper("l_returnflag").alias("flag"),
        )
        .df
    )


@query(
    "flatmap_wordcount",
    oracle="""
    SELECT word, count(*) AS cnt
    FROM (
      SELECT unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS word
      FROM documents
    )
    WHERE length(word) > 0
    GROUP BY word
    """,
)
def q_flatmap_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flatMap via explode (StreamFlatMap.java:28-51) — the reference's
    WordCount acceptance pipeline over the documents table."""
    return (
        Stream(load_table(spark, sf_dir, "documents"))
        .flat_map(F.split(F.lower("text"), "[^a-z0-9]+"), alias="word")
        .filter(F.length("word") > 0)
        .key_by("word")
        .count(alias="cnt")
        .df
    )


@query(
    "keyed_sum_first_record",
    # value replays the engine's ORDERED fold (r12): a bare sum(value)
    # adds in scan order, ULP-drifting from Spark's partial-aggregate
    # order once groups span partitions (first seen at sf1);
    # list_reduce over the event_id-ordered list IS the running sum in
    # arrival order — the reference's actual semantics — and matches
    # the Spark fold bit-for-bit (0.0 seed exact).
    oracle="""
    SELECT min_by(event_id, event_id) AS event_id,
           min_by(ts, event_id)       AS ts,
           user_id,
           min_by(event_type, event_id) AS event_type,
           list_reduce(list(value ORDER BY event_id), (a, b) -> a + b)
                                      AS value,
           min_by(props, event_id)    AS props
    FROM events GROUP BY user_id
    """,
)
def q_keyed_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """keyBy().sum() with the reference's field-replace semantics:
    non-aggregated fields come from the first-seen record
    (SumAggregator.java:68-76); arrival order = event_id. The float
    sum folds in arrival order on BOTH sides (see oracle note +
    functions/aggregations.keyed_agg_first_record). r13: the fold now
    carries a group-size guard (FOLD_MAX_GROUP_ROWS) — a pathological
    hot key fails loudly with remediation named instead of drifting
    into an executor OOM inside collect_list."""
    return (
        Stream(load_table(spark, sf_dir, "events"))
        .key_by("user_id")
        .sum("value", order_by="event_id")
        .df
    )


@query(
    "keyed_min_first_record",
    oracle="""
    SELECT min_by(event_id, event_id) AS event_id,
           min_by(ts, event_id)       AS ts,
           user_id,
           min_by(event_type, event_id) AS event_type,
           min(value)                 AS value,
           min_by(props, event_id)    AS props
    FROM events GROUP BY user_id
    """,
)
def q_keyed_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        Stream(load_table(spark, sf_dir, "events"))
        .key_by("user_id")
        .min("value", order_by="event_id")
        .df
    )


@query(
    "keyed_max_by_record",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY value DESC, event_id ASC) AS rn
      FROM events
    ) t WHERE rn = 1
    """,
)
def q_keyed_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """maxBy: whole extremal record, tie → first arrival
    (ComparableAggregator.java:79-86). Single hash-agg via max_by with a
    composite comparison struct — no window sort shuffle."""
    return (
        Stream(load_table(spark, sf_dir, "events"))
        .key_by("user_id")
        .max_by("value", order_by="event_id", first=True)
        .df
    )


@query(
    "keyed_min_by_record_last",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value, props FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY value ASC, event_id DESC) AS rn
      FROM events
    ) t WHERE rn = 1
    """,
)
def q_keyed_min_by_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        Stream(load_table(spark, sf_dir, "events"))
        .key_by("user_id")
        .min_by("value", order_by="event_id", first=False)
        .df
    )


@query(
    "running_reduce_sum",
    oracle="""
    SELECT user_id, event_id,
           CAST(CAST(value AS DECIMAL(28,10)) AS DOUBLE) AS value,
           CAST(sum(CAST(value AS DECIMAL(28,10)))
                  OVER (PARTITION BY user_id ORDER BY event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_sum_value
    FROM events
    """,
)
def q_running_reduce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous keyed reduce emission history
    (StreamGroupedReduce.java:35-53): one row per input with the running
    partial for its key.

    The running sum accumulates in DECIMAL(28,10), not double: double
    window sums are accumulation-order-dependent, so Spark and the
    oracle engine drift by ulps and a drifted value can straddle the
    gate's float-rounding boundary. Decimal partials are exact → the
    final cast to double is bit-identical on both sides.
    """
    ev = load_table(spark, sf_dir, "events").withColumn(
        "value", F.col("value").cast("decimal(28,10)")
    )
    out = (
        Stream(ev)
        .key_by("user_id")
        .running_reduce("value", "sum", order_by="event_id")
        .df
    )
    return out.select(
        "user_id",
        "event_id",
        F.col("value").cast("double").alias("value"),
        F.col("running_sum_value").cast("double").alias("running_sum_value"),
    )


@query(
    "union_rebalance",
    oracle="""
    SELECT event_type, count(*) AS cnt FROM (
      SELECT event_type FROM events WHERE value > 50
      UNION ALL
      SELECT event_type FROM events WHERE value <= 50
    ) GROUP BY event_type
    """,
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Stream(load_table(spark, sf_dir, "events"))
    hi = ev.filter(F.col("value") > 50).map("event_type")
    lo = ev.filter(F.col("value") <= 50).map("event_type")
    return hi.union(lo).key_by("event_type").count(alias="cnt").df


@query(
    "nested_field_sum_first_record",
    oracle="""
    WITH m AS (
      SELECT user_id, event_id, event_type,
             CAST(round(value * 1000000) AS BIGINT) AS vu
      FROM events
    )
    SELECT user_id,
           min(event_id) AS event_id,
           CAST(sum(vu) AS BIGINT) AS meta_value_u,
           arg_min(event_type, event_id) AS meta_event_type
    FROM m GROUP BY user_id
    """,
)
def q_nested_field_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dotted-path field addressing (FieldAccessorFactory.java:52-190):
    ``sum("meta.value_u")`` aggregates a NESTED struct field and writes
    the aggregate back into the first-seen record's struct via
    Column.withField — the reference's recursive field accessor on a
    struct-ified events table. The emitted struct is flattened for the
    gate (its canonicalizer cannot sort struct cells); values ride as
    fixed-point micro-units so the sum is engine-exact.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.struct(
            F.round(F.col("value") * 1000000).cast("bigint").alias("value_u"),
            F.col("event_type").alias("event_type"),
        ).alias("meta"),
    )
    out = Stream(ev).key_by("user_id").sum("meta.value_u", order_by="event_id").df
    return out.select(
        "user_id",
        "event_id",
        F.col("meta.value_u").alias("meta_value_u"),
        F.col("meta.event_type").alias("meta_event_type"),
    )


@query(
    "either_tagged_union",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'left' ELSE 'right' END AS tag,
           CASE WHEN o_totalprice > 200000 THEN o_totalprice END AS left_amount,
           CASE WHEN o_totalprice <= 200000 THEN o_orderstatus END AS right_status
    FROM orders WHERE o_orderkey < 2000
    """,
)
def q_either_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Either<double, string> as the tagged struct mapping of
    EitherTypeInfo.java (SURVEY §1.2): two typed branches union into one
    Either-typed edge, then flatten tag/branches for the gate. Exactly
    one branch is non-null per row by construction.
    """
    from min_flink_spark.functions.either import union_either

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    hi = orders.filter(F.col("o_totalprice") > 200000)
    lo = orders.filter(F.col("o_totalprice") <= 200000)
    both = union_either(
        hi,
        lo,
        left_value=F.col("o_totalprice"),
        right_value=F.col("o_orderstatus"),
        left_type="double",
        right_type="string",
        carry=["o_orderkey"],
    )
    return both.select(
        "o_orderkey",
        F.col("either.tag").alias("tag"),
        F.col("either.left").alias("left_amount"),
        F.col("either.right").alias("right_status"),
    )


@query(
    "custom_pysource_events",
    oracle="""
    WITH g AS (
      SELECT i,
        CASE (CAST(('0x' || substr(md5('t' || CAST(i AS VARCHAR)), 1, 8))
                   AS BIGINT) % 5)
          WHEN 0 THEN 'view' WHEN 1 THEN 'click' WHEN 2 THEN 'purchase'
          WHEN 3 THEN 'signup' ELSE 'error' END AS event_type,
        CAST(('0x' || substr(md5('u' || CAST(i AS VARCHAR)), 1, 8))
             AS BIGINT) % 1000 AS user_id,
        CAST(('0x' || substr(md5('v' || CAST(i AS VARCHAR)), 1, 8))
             AS BIGINT) % 1000000 AS vmill
      FROM range(20000) t(i)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(vmill AS DECIMAL(18,0))) AS DOUBLE) / 1000.0
             AS value_sum
    FROM g GROUP BY event_type
    """,
)
def q_custom_pysource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom SOURCE end-to-end (sources/pysource.py): a Spark 4 Python
    DataSource generates 20k deterministic events (md5-derived fields,
    the repo's cross-engine randomness primitive) across 8 independent
    slices, then a normal aggregation runs over it. The oracle REPLAYS
    THE GENERATOR in DuckDB (range + md5 string arithmetic) — the
    source itself is under the correctness gate, not just the query.
    Maps the reference's addSource(SourceFunction) run-loop contract
    (SourceFunction.java:31-47) onto partition-parallel generation."""
    from min_flink_spark.sources.pysource import register_synthetic_source

    register_synthetic_source(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("rows", "20000")
        .option("partitions", "8")
        .load()
    )
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("user_id").alias("n_users"),
        (
            F.sum(F.round(F.col("value") * 1000).cast("bigint").cast("decimal(18,0)"))
            .cast("double")
            / 1000.0
        ).alias("value_sum"),
    )


@query(
    "multi_format_roundtrip",
    oracle="""
    WITH agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(event_id) AS BIGINT) AS sum_ids,
             CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
               AS value_micro,
             CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events
    )
    SELECT fmt, n, sum_ids, value_micro, n_users
    FROM agg, (VALUES ('csv'), ('json'), ('orc')) AS f(fmt)
    """,
)
def q_multi_format_roundtrip(spark, sf_dir: str):
    """Source/sink format fidelity under the driver gate (§2.1/§2.7):
    events round-trip through CSV, JSON and ORC sinks and their
    readers; each format's re-read aggregates must equal the parquet
    truth bit-for-bit — doubles survive because Spark's text writers
    emit shortest-roundtrip representations and the micro-unit
    aggregation happens AFTER the re-read. One scratch write per
    format per run; the scratch dir is content-addressed per sf_dir so
    concurrent gates don't collide."""
    import hashlib as _h
    import os as _os

    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    scratch = _os.path.join(
        "/tmp/mfs_roundtrip", _h.sha1(sf_dir.encode()).hexdigest()[:12]
    )
    schema = "event_id bigint, user_id bigint, ts timestamp_ntz, value double"
    parts = []
    for fmt in ("csv", "json", "orc"):
        path = _os.path.join(scratch, fmt)
        w = ev.write.mode("overwrite")
        if fmt == "csv":
            w = w.option("header", "true").option("timestampNTZFormat",
                                                  "yyyy-MM-dd HH:mm:ss.SSSSSS")
        w.format(fmt).save(path)
        r = spark.read
        if fmt == "csv":
            r = r.option("header", "true").option("timestampNTZFormat",
                                                  "yyyy-MM-dd HH:mm:ss.SSSSSS")
        back = r.schema(schema).format(fmt).load(path)
        parts.append(
            back.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("event_id").alias("sum_ids"),
                F.sum(F.round(F.col("value") * 1000000).cast("bigint")).alias(
                    "value_micro"
                ),
                F.count_distinct("user_id").alias("n_users"),
            ).select(F.lit(fmt).alias("fmt"), "n", "sum_ids", "value_micro", "n_users")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@query(
    "streaming_pysource_counts",
    oracle="""
    WITH g AS (
      SELECT i,
        CASE (CAST(('0x' || substr(md5('t' || CAST(i AS VARCHAR)), 1, 8))
                   AS BIGINT) % 5)
          WHEN 0 THEN 'view' WHEN 1 THEN 'click' WHEN 2 THEN 'purchase'
          WHEN 3 THEN 'signup' ELSE 'error' END AS event_type,
        CAST(('0x' || substr(md5('v' || CAST(i AS VARCHAR)), 1, 8))
             AS BIGINT) % 1000000 AS vmill
      FROM range(20000) t(i)
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(vmill AS DECIMAL(18,0))) AS DOUBLE) / 1000.0
             AS value_sum
    FROM g GROUP BY event_type
    """,
)
def q_streaming_pysource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom source on the STREAMING path: the same Python DataSource,
    this time through its DataSourceStreamReader (offset/partitions/
    commit lifecycle) into an update-mode aggregation — readStream on
    user code, the reference's run-loop contract on real
    micro-batches. Identical generator, so the batch oracle replays
    it; a stream reader that dropped/duplicated a slice between
    offsets flips the hash."""
    from min_flink_spark.sources.pysource import register_synthetic_source
    from min_flink_spark.streaming.runner import run_to_completion

    register_synthetic_source(spark)
    s = (
        spark.readStream.format("synthetic_events")
        .option("rows", "20000")
        .option("partitions", "8")
        .load()
    )
    vmill = F.round(F.col("value") * 1000).cast("bigint")
    agg = s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(vmill.cast("decimal(18,0)")).cast("double") / 1000.0
        ).alias("value_sum"),
    )
    return run_to_completion(agg, output_mode="update")


@query(
    "schema_evolution_union",
    oracle="""
    SELECT CASE WHEN event_id % 2 = 0 THEN 'v2' ELSE 'v1' END AS schema_ver,
           CAST(count(*) AS BIGINT) AS n,
           coalesce(CAST(sum(CASE WHEN event_id % 2 = 0
                                  THEN length('tag-' || CAST(user_id AS VARCHAR))
                                  ELSE NULL END) AS BIGINT), 0) AS extra_chars
    FROM events GROUP BY 1
    """,
)
def q_schema_evolution(spark, sf_dir: str):
    """Ingestion-robustness under the gate (§2.1): two parquet
    snapshots with DIFFERENT schemas (v2 adds an `extra` column) land
    in one directory; a mergeSchema read unifies them, v1 rows carry
    NULL for the added column — the additive-evolution contract every
    long-lived corpus needs. The oracle rebuilds both generations from
    the events truth, so a reader that dropped v1 rows or defaulted
    the missing column to non-NULL flips the hash."""
    import hashlib as _h
    import os as _os

    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    scratch = _os.path.join(
        "/tmp/mfs_evolution", _h.sha1(sf_dir.encode()).hexdigest()[:12]
    )
    v1 = ev.filter(F.col("event_id") % 2 != 0)
    v2 = ev.filter(F.col("event_id") % 2 == 0).withColumn(
        "extra", F.concat(F.lit("tag-"), F.col("user_id").cast("string"))
    )
    v1.write.mode("overwrite").parquet(_os.path.join(scratch, "gen=1"))
    v2.write.mode("overwrite").parquet(_os.path.join(scratch, "gen=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(
        _os.path.join(scratch, "gen=1"), _os.path.join(scratch, "gen=2")
    )
    return merged.groupBy(
        F.when(F.col("extra").isNotNull(), F.lit("v2"))
        .otherwise(F.lit("v1"))
        .alias("schema_ver")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        # coalesce: a NULL sum would ride as NaN-in-float64 through the
        # gate's pandas materialization and flip the column's dtype
        F.coalesce(F.sum(F.length("extra")), F.lit(0)).alias("extra_chars"),
    )


@query(
    "partitioned_pruned_read",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
             AS value_micro
    FROM events WHERE event_type IN ('click', 'purchase')
    """,
)
def q_partitioned_pruned_read(spark, sf_dir: str):
    """Partition-pruned layout round trip under the gate (§2.1 +
    scale-layout doctrine): events land partitioned by event_type
    (Hive-style directories), and the read filters TWO partition
    values — pruning must deliver exactly those directories' rows with
    the partition column reconstructed from the path. The oracle
    aggregates the truth directly, so a pruner that dropped a
    partition, double-read one, or mistyped the reconstructed column
    flips the hash. (The PLAN side — static + dynamic pruning — is
    locked in tests/test_partitioned.py; this adds the value-level
    driver row.)"""
    import hashlib as _h
    import os as _os

    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    scratch = _os.path.join(
        "/tmp/mfs_partitioned", _h.sha1(sf_dir.encode()).hexdigest()[:12]
    )
    ev.write.mode("overwrite").partitionBy("event_type").parquet(scratch)
    back = spark.read.parquet(scratch).filter(
        F.col("event_type").isin("click", "purchase")
    )
    return back.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("user_id").alias("n_users"),
        F.sum(F.round(F.col("value") * 1000000).cast("bigint")).alias("value_micro"),
    )


@query(
    "bucketed_cobucket_join_stats",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_bucketed_cobucket_join(spark, sf_dir: str):
    """Bucketed-layout fact⋈fact join under the gate: both tables are
    written bucketed on the order key with identical specs, and the
    join+aggregation read them back through the catalog — the
    pay-the-shuffle-once-at-write path for recurring fact joins (the
    zero-Exchange PLAN property is locked in tests/test_bucketed.py;
    this driver row pins the VALUES through the bucketed writer,
    catalog round trip, and bucket-pruned scan)."""
    import hashlib as _h
    import os as _os

    from pyspark.sql import functions as F

    from min_flink_spark.sources.bucketed import cobucket_join, write_bucketed

    tag = _h.sha1(sf_dir.encode()).hexdigest()[:10]
    lt, rt = f"mfs_ord_{tag}", f"mfs_li_{tag}"
    # saveAsTable(overwrite) refuses a managed LOCATION left on disk by
    # a PRIOR session (the table isn't in this session's catalog, so
    # overwrite can't claim it) — drop both the entry and the directory
    import shutil as _sh

    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in (lt, rt):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        _sh.rmtree(_os.path.join(wh, t), ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), "o_orderpriority"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), "l_quantity"
    )
    write_bucketed(orders, lt, ["k"], 8)
    write_bucketed(lineitem, rt, ["k"], 8)
    joined = cobucket_join(spark, lt, rt, on=["k"])
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.round(F.col("l_quantity")).cast("bigint")).alias("total_qty"),
    )


@query(
    "csv_corrupt_record_quarantine",
    oracle="""
    SELECT event_id % 10 = 0 AS quarantined,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(event_id) AS BIGINT) AS sum_ids
    FROM events GROUP BY 1
    """,
)
def q_csv_corrupt_quarantine(spark, sf_dir: str):
    """Dead-letter ingestion under the gate: a CSV scratch where every
    10th row carries an unparseable numeric field reads back in
    PERMISSIVE mode with a corrupt-record column — malformed rows
    quarantine (raw line captured, parsed field NULL) instead of
    failing the job or silently vanishing. The oracle replays the
    deterministic corruption rule, so the quarantine boundary itself
    is value-checked: a reader that dropped bad rows or mis-parsed
    good ones flips a count. (The raw scan is cached before filtering
    on the corrupt column — filtering ONLY that column on an uncached
    scan is unsupported.)"""
    import hashlib as _h
    import os as _os

    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    lines = ev.select(
        F.concat_ws(
            ",",
            F.col("event_id").cast("string"),
            F.when(F.col("event_id") % 10 == 0, F.lit("not-a-number")).otherwise(
                F.col("value").cast("string")
            ),
        ).alias("value")
    )
    scratch = _os.path.join(
        "/tmp/mfs_corrupt_csv", _h.sha1(sf_dir.encode()).hexdigest()[:12]
    )
    lines.write.mode("overwrite").text(scratch)
    back = (
        spark.read.schema("event_id bigint, value double, _bad string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(scratch)
        .cache()
    )
    return back.groupBy(F.col("_bad").isNotNull().alias("quarantined")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("event_id").alias("sum_ids"),
    )
