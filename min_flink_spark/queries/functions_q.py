"""Scalar-function surface (SURVEY §2.6).

The reference has NO scalar function library — all record-level compute
is user Java lambdas. In the Spark engine the entire
``pyspark.sql.functions`` namespace is the replacement; these queries
pin a representative sampler (string / date / math / conditional /
JSON) against DuckDB so the cross-engine semantics are oracle-checked,
not assumed. Functions with engine-divergent semantics (round modes,
day-of-week numbering) are deliberately excluded — the engine exposes
them, but parity claims stop at ANSI-consistent behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from min_flink_spark.registry import query
from min_flink_spark.sources import load_table


@query(
    "scalar_function_sampler",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           upper(l_returnflag) || '/' || lower(l_linestatus) AS flag_status,
           substr(l_returnflag || l_linestatus, 1, 2) AS code2,
           length(concat_ws('-', l_returnflag, l_linestatus)) AS code_len,
           lpad(CAST(l_linenumber AS VARCHAR), 3, '0') AS line_padded,
           reverse(l_returnflag || l_linestatus) AS rev_code,
           CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           CAST(month(l_shipdate) AS BIGINT) AS ship_month,
           CAST(day(l_shipdate) AS BIGINT) AS ship_day,
           abs(l_discount - 0.05) AS disc_dev,
           CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
           CAST(ceil(l_quantity / 10) AS BIGINT) AS qty_bucket,
           sqrt(l_extendedprice) AS price_sqrt,
           round(ln(1 + l_extendedprice), 6) AS price_ln,
           CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 30 THEN 'mid'
                ELSE 'large' END AS qty_class
    FROM lineitem
    WHERE l_orderkey < 1000
    """,
)
def q_scalar_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.concat(F.upper("l_returnflag"), F.lit("/"), F.lower("l_linestatus")).alias(
            "flag_status"
        ),
        F.substring(F.concat("l_returnflag", "l_linestatus"), 1, 2).alias("code2"),
        F.length(F.concat_ws("-", "l_returnflag", "l_linestatus")).alias("code_len"),
        F.lpad(F.col("l_linenumber").cast("string"), 3, "0").alias("line_padded"),
        F.reverse(F.concat("l_returnflag", "l_linestatus")).alias("rev_code"),
        F.year("l_shipdate").cast("bigint").alias("ship_year"),
        F.month("l_shipdate").cast("bigint").alias("ship_month"),
        F.dayofmonth("l_shipdate").cast("bigint").alias("ship_day"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k"),
        F.ceil(F.col("l_quantity") / 10).alias("qty_bucket"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        # ln is NOT correctly-rounded (JVM StrictMath vs C libm differ by
        # ulps) — round to 6dp both sides; sqrt IS IEEE-exact, left raw
        F.round(F.log(F.lit(1) + F.col("l_extendedprice")), 6).alias("price_ln"),
        F.when(F.col("l_quantity") < 10, "small")
        .when(F.col("l_quantity") < 30, "mid")
        .otherwise("large")
        .alias("qty_class"),
    )


@query(
    "json_props_stats",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS k_sum,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
             / count(*) AS k_avg,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column access (get_json_object ≈ DuckDB json_extract) +
    aggregation — the semi-structured column path.

    ``k_avg`` is deliberately exact-integer-sum ÷ count (NOT engine
    ``avg``): DuckDB's avg(BIGINT) accumulates incrementally in double
    while Spark divides an exact bigint sum, so native avg drifts in the
    low-order bits and fails the driver's value hash. One division over
    identical integers is bit-identical across engines.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("k_sum"),
        (F.sum(k).cast("double") / F.count(F.lit(1))).alias("k_avg"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "regexp_extract_props",
    oracle="""
    SELECT event_id,
           CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS k_via_regex,
           regexp_matches(props, '"k": \\d\\d') AS has_2digit_k
    FROM events WHERE event_id < 2000
    """,
)
def q_regexp_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction/matching — identical RE2-style semantics pinned
    across engines."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    return ev.select(
        "event_id",
        F.regexp_extract("props", r'"k": (\d+)', 1).cast("bigint").alias("k_via_regex"),
        F.col("props").rlike(r'"k": \d\d').alias("has_2digit_k"),
    )


@query(
    "pandas_udaf_geomean",
    oracle="""
    SELECT event_type,
           round(exp(avg(ln(value))), 6) AS geo_mean,
           CAST(count(*) AS BIGINT) AS n
    FROM events WHERE value > 0 GROUP BY event_type
    """,
)
def q_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined aggregate via Arrow grouped-agg pandas UDF — the
    reference's vestigial AggregateFunction contract (SURVEY §2.4/§2.10)
    on the vectorized path. Oracle: the closed-form exp(avg(ln)) —
    the UDAF must agree with the algebraic identity.

    Scale caveat: grouped-agg pandas UDFs have NO partial aggregation —
    each group funnels through one task and must fit one Arrow buffer.
    Fine for bounded-cardinality groups; for hot keys express the
    aggregate decomposably instead (exp(sum(ln)/count) via built-ins,
    or salted_agg for the shuffle)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _geo(v):
        return float(np.exp(np.log(v.to_numpy()).mean()))

    def _n(v):
        return len(v)

    # real annotation objects: this module's postponed annotations
    # (string form) would break pandas_udf's signature inference; and a
    # grouped-agg pandas UDF cannot mix with built-in aggregates in one
    # agg, so the count is a pandas UDAF too
    _geo.__annotations__ = {"v": pd.Series, "return": float}
    _n.__annotations__ = {"v": pd.Series, "return": int}
    geo_mean = pandas_udf(_geo, "double")
    n_rows = pandas_udf(_n, "bigint")

    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    # numpy's log/mean and the oracle's ln/avg accumulate differently —
    # 6dp rounding on both sides absorbs the ulp drift
    return ev.groupBy("event_type").agg(
        F.round(geo_mean("value"), 6).alias("geo_mean"),
        n_rows("value").alias("n"),
    )


@query(
    "unpivot_lineitem_metrics",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS val
    FROM lineitem WHERE l_orderkey < 500
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice', l_extendedprice
    FROM lineitem WHERE l_orderkey < 500
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount', l_discount
    FROM lineitem WHERE l_orderkey < 500
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping (unpivot/melt): narrow transform, no shuffle;
    oracle spelled as the equivalent UNION ALL."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="metric",
        valueColumnName="val",
    ).withColumn("metric", F.expr("substring(metric, 3)"))  # l_quantity → quantity


@query(
    "array_function_sampler",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           array_to_string(
             list_transform(
               list_sort(list_transform(embedding[1:3], x -> CAST(x AS DOUBLE))),
               x -> CAST(CAST(round(x * 1000000) AS BIGINT) AS VARCHAR)),
             ',') AS head3_sorted,
           list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                       (a, x) -> a + x) AS vec_sum,
           CAST(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS DOUBLE) AS vec_max,
           len(list_filter(embedding, x -> x > 0)) AS n_positive
    FROM embeddings WHERE vec_id < 200
    """,
)
def q_array_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order function surface (size/slice/sort/aggregate/
    filter) — all whole-stage-codegen'd, the reference's ListTypeInfo
    analog (SURVEY §1.2).

    ``head3_sorted`` is serialized to a ','-joined string of µ-scaled
    ints: the driver's canonicalizer pandas-sorts every output column
    and a raw array column is unhashable there (round-1 red row).
    ``vec_sum`` is a sequential left fold on BOTH sides (Spark
    ``F.aggregate`` / DuckDB ``list_reduce``) so the double sum is
    bit-identical — engine-native list_sum may reorder accumulation.
    """
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.slice(as_double, 1, 3)),
                lambda x: F.round(x * 1000000).cast("bigint").cast("string"),
            ),
        ).alias("head3_sorted"),
        F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x).alias("vec_sum"),
        F.array_max(as_double).alias("vec_max"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@query(
    "map_function_sampler",
    oracle="""
    WITH m AS (
      SELECT event_id,
             MAP {'type': event_type,
                  'uid': CAST(user_id AS VARCHAR),
                  'val': CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR)} AS mp
      FROM events WHERE event_id < 2000
    )
    SELECT event_id,
           map_extract(mp, 'type')[1] AS type_val,
           CAST(cardinality(mp) AS BIGINT) AS n_entries,
           array_to_string(list_sort(map_keys(mp)), ',') AS keys_sorted,
           array_to_string(list_sort(map_values(mp)), ',') AS values_sorted,
           CAST(len(list_filter(map_keys(mp), k -> length(k) = 3)) AS BIGINT)
             AS n_short_keys,
           upper(map_extract(mp, 'type')[1]) AS type_upper,
           coalesce(map_extract(mp, 'missing')[1], 'absent') AS missing_default
    FROM m
    """,
)
def q_map_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-column function surface (§2.6 — the MapTypeInfo analog of
    SURVEY §1.2): construction, element_at with a present and an absent
    key, size, map_keys/map_values (emitted as sorted joined strings —
    the gate canonicalizer cannot hash raw map cells), map_filter, and
    transform via element access. All codegen; the DuckDB twin drives
    its native MAP functions on the same construction."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    mp = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
        F.lit("val"), F.round(F.col("value") * 100).cast("bigint").cast("string"),
    )
    m = ev.select("event_id", mp.alias("mp"))
    return m.select(
        "event_id",
        F.element_at("mp", "type").alias("type_val"),
        F.size("mp").cast("bigint").alias("n_entries"),
        F.concat_ws(",", F.sort_array(F.map_keys("mp"))).alias("keys_sorted"),
        F.concat_ws(",", F.sort_array(F.map_values("mp"))).alias("values_sorted"),
        F.size(F.map_filter("mp", lambda k, v: F.length(k) == 3))
        .cast("bigint")
        .alias("n_short_keys"),
        F.upper(F.element_at("mp", "type")).alias("type_upper"),
        F.coalesce(F.element_at("mp", "missing"), F.lit("absent")).alias(
            "missing_default"
        ),
    )


@query(
    "positional_tokens",
    oracle="""
    WITH tk AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> length(x) > 0) AS toks
      FROM documents WHERE doc_id < 50
    ),
    tpos AS (
      SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS pos FROM tk
    )
    SELECT doc_id, CAST(pos - 1 AS BIGINT) AS pos, toks[pos] AS term
    FROM tpos
    """,
)
def q_positional_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional table function (posexplode — the UDTF-with-ordinality
    surface): token stream with 0-based position, the input shape for
    span-level ops (substring dedup, sequence labeling). DuckDB twin
    rides the unnest(range(len)) idiom."""
    from min_flink_spark.functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "term")
    ).select("doc_id", F.col("pos").cast("bigint").alias("pos"), "term")


@query(
    "null_semantics_sampler",
    oracle="""
    WITH n AS (
      SELECT event_id,
             nullif(event_type, 'error') AS maybe_type,
             CASE WHEN value > 150 THEN NULL ELSE value END AS maybe_value
      FROM events WHERE event_id < 2000
    )
    SELECT event_id,
           coalesce(maybe_type, 'fallback') AS type_or_fallback,
           CAST(maybe_type IS NULL AS BOOLEAN) AS type_nulled,
           CAST(maybe_type IS NOT DISTINCT FROM 'click' AS BOOLEAN) AS nullsafe_eq_click,
           CAST(maybe_value IS NOT DISTINCT FROM maybe_value AS BOOLEAN) AS self_nullsafe,
           CASE WHEN maybe_type IS NOT NULL THEN 'kept' ELSE 'dropped' END AS nvl2_like,
           coalesce(maybe_value, -1.0) AS value_or_sentinel
    FROM n
    """,
)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic surface: nullif/coalesce, IS NULL, null-safe
    equality (Spark ``<=>`` ≡ SQL IS NOT DISTINCT FROM — true on
    NULL=NULL where ``=`` yields NULL), nvl2-style branching. The
    reference has no NULL story at all (Java objects, NPE on null
    keys); an engine needs one."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    n = ev.select(
        "event_id",
        F.nullif(F.col("event_type"), F.lit("error")).alias("maybe_type"),
        F.when(F.col("value") > 150, F.lit(None)).otherwise(F.col("value")).alias(
            "maybe_value"
        ),
    )
    return n.select(
        "event_id",
        F.coalesce("maybe_type", F.lit("fallback")).alias("type_or_fallback"),
        F.col("maybe_type").isNull().alias("type_nulled"),
        F.col("maybe_type").eqNullSafe(F.lit("click")).alias("nullsafe_eq_click"),
        F.col("maybe_value").eqNullSafe(F.col("maybe_value")).alias("self_nullsafe"),
        F.when(F.col("maybe_type").isNotNull(), "kept")
        .otherwise("dropped")
        .alias("nvl2_like"),
        F.coalesce("maybe_value", F.lit(-1.0)).alias("value_or_sentinel"),
    )


def _sql_spread16(v: str) -> str:
    """DuckDB twin of hashing._spread_bits16 — same shift/mask chain."""
    e = f"(({v} | ({v} << 8)) & 16711935)"
    e = f"(({e} | ({e} << 4)) & 252645135)"
    e = f"(({e} | ({e} << 2)) & 858993459)"
    e = f"(({e} | ({e} << 1)) & 1431655765)"
    return e


@query(
    "zorder_key_events",
    oracle=f"""
    WITH b AS (
      SELECT event_id,
             user_id & 65535 AS x,
             CAST(floor(value) AS BIGINT) & 65535 AS y
      FROM events
    )
    SELECT event_id,
           CAST({_sql_spread16('x')} | ({_sql_spread16('y')} << 1) AS BIGINT) AS zkey
    FROM b
    """,
)
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton (Z-order) locality key over (user_id, floor(value)) —
    the multi-dimensional data-skipping layout: range-partition +
    sort by zkey before writing and parquet min/max stats prune scans
    for range predicates on EITHER column. Pure shift/mask codegen
    (functions/hashing.py:zorder_key), bit-identical in DuckDB."""
    from min_flink_spark.functions.hashing import zorder_key

    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        zorder_key(
            F.col("user_id"), F.floor("value").cast("bigint")
        ).cast("bigint").alias("zkey"),
    )


@query(
    "datetime_function_sampler",
    oracle="""
    SELECT o_orderkey,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS quarter_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow_sunday1,
           CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
           CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP) AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
                AS BIGINT) AS days_since_epoch_start,
           strftime(o_orderdate, '%Y-%m') AS ym,
           CAST(epoch(o_orderdate) AS BIGINT) AS unix_sec
    FROM orders
    WHERE o_orderkey < 2000
    """,
)
def q_datetime_sampler(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime function surface (§2.6): truncation, calendar fields,
    interval arithmetic, day difference, formatting, epoch conversion —
    each pinned against the DuckDB twin (dialect notes inline: Spark
    dayofweek is Sunday=1 = DuckDB dayofweek+1; Spark date_format vs
    strftime; Spark unix_timestamp vs epoch)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.dayofweek("o_orderdate").cast("bigint").alias("dow_sunday1"),
        F.dayofyear("o_orderdate").cast("bigint").alias("doy"),
        F.weekofyear("o_orderdate").cast("bigint").alias("iso_week"),
        F.quarter("o_orderdate").cast("bigint").alias("qtr"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("bigint")
        .alias("days_since_epoch_start"),
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.unix_timestamp("o_orderdate").cast("bigint").alias("unix_sec"),
    )


@query(
    "variant_json_stats",
    oracle="""
    WITH x AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    SELECT event_type,
           CAST(k // 10 AS BIGINT) AS k_decade,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(k AS DECIMAL(18,0))) AS BIGINT) AS k_sum,
           CAST(min(k) AS BIGINT) AS k_min,
           CAST(max(k) AS BIGINT) AS k_max
    FROM x GROUP BY event_type, k // 10
    """,
)
def q_variant_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's native VARIANT type:
    ``parse_json`` once per row (binary-encoded variant, no re-parse
    per field), then typed-path ``variant_get`` extraction — the
    modern replacement for per-field ``get_json_object`` string
    parsing (each call re-parses the JSON). Same aggregation contract
    as json_props_stats but through the VARIANT decode path; the
    oracle replays with DuckDB's JSON extraction."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    )
    k = F.expr("variant_get(v, '$.k', 'bigint')")
    return ev.select("event_type", k.alias("k")).groupBy(
        "event_type",
        F.floor(F.col("k") / 10).cast("bigint").alias("k_decade"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("k").cast("decimal(18,0)")).cast("bigint").alias("k_sum"),
        F.min("k").alias("k_min"),
        F.max("k").alias("k_max"),
    )


@query(
    "nested_rollup_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty,
           CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                         AS DECIMAL(18,0))) AS DOUBLE) / 100.0 AS total_price
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_nested_rollup_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deep nested-type round trip under the gate (§1.2 type system):
    line items are packed into one array<struct<qty,price_cents>> PER
    ORDER (sorted by line number for determinism), carried through a
    join against orders as a nested column, then exploded back and
    re-aggregated — the totals must equal the flat join the oracle
    computes, proving nothing is lost or reordered through
    ObjectHashAggregate's collect path, the nested carry, and the
    explode. The nested column never reaches the output (scalar-only
    contract); integer units keep the money exact."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_quantity")).cast("bigint").alias("qty"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("price_cents"),
    )
    nested = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.struct("l_linenumber", "qty", "price_cents"))
        ).alias("items")
    )
    carried = orders.join(nested, F.col("o_orderkey") == F.col("l_orderkey"))
    exploded = carried.select(
        "o_orderkey", "o_orderpriority", F.explode("items").alias("it")
    )
    return exploded.groupBy("o_orderpriority").agg(
        F.count_distinct("o_orderkey").alias("n_orders"),
        F.sum("it.qty").alias("total_qty"),
        (
            F.sum(F.col("it.price_cents").cast("decimal(18,0)")).cast("double")
            / 100.0
        ).alias("total_price"),
    )
