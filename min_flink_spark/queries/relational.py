"""Relational surface: joins, set ops, sort/limit/top-k, analytic
windows, rollup, as-of join (SURVEY §2.5 — absent in the reference, so
DuckDB-oracle SQL semantics is the spec).

Scale notes: dimension joins broadcast (region/nation/customer-sized
dims must never shuffle the fact side); top-k uses per-group row_number
(no global sort); the as-of join is a single-shuffle union+carry-forward
plan, not a range cross-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from min_flink_spark.operators.relational import asof_join, broadcast_join, top_k
from min_flink_spark.registry import query
from min_flink_spark.sources import load_table


def _dec(col: str, scale: str = "decimal(18,2)"):
    """Exact-decimal view of a 2-dp money column: decimal accumulation +
    one final double cast is bit-identical across engines at any scale,
    where double sums drift with accumulation order (round-2 float
    doctrine; see FIXTURES §3)."""
    return F.col(col).cast(scale)


# Integer-unit money plan for PRODUCT aggregations. Money columns are
# exact 2-dp values (verified: max |v*100 - round(v*100)| < 1e-9 in the
# testdata; TPC-H money is 2-dp by spec), so per-row arithmetic runs on
# BIGINT cents — plain long multiply inside whole-stage codegen, no
# decimal object per row (2× faster than even Decimal64 operands at
# sf0.1). Only the SUM runs in decimal: each per-row product is cast to
# decimal(18,0) (still long-backed) so the accumulator widens to
# decimal(28,0) — capacity 1e28 ≫ the ~1e23 worst case of 10^12 rows ×
# 10^11 micro-units/row at the 100 TB design point, where a raw bigint
# accumulator would silently wrap. Unit descaling (/100, /10^4, /10^6)
# happens once per GROUP on the final double.
def _cents(col: str):
    return F.round(F.col(col) * 100).cast("bigint")


def _acc(col):
    """Per-row exact integer → decimal(18,0) so Spark's sum allocates a
    decimal(28,0) accumulator (overflow-safe), while the row value
    itself stays a long-backed decimal."""
    return col.cast("decimal(18,0)")


@query(
    "pricing_summary",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_linestatus,
             CAST(round(l_quantity) AS BIGINT) AS qty,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS ep,
             CAST(round(l_discount * 100) AS BIGINT) AS disc,
             CAST(round(l_tax * 100) AS BIGINT) AS tax
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(qty AS DECIMAL(18,0))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(ep AS DECIMAL(18,0))) AS DOUBLE) / 100.0 AS sum_base_price,
           CAST(sum(CAST(ep * (100 - disc) AS DECIMAL(18,0))) AS DOUBLE) / 10000.0
             AS sum_disc_price,
           CAST(sum(CAST(ep * (100 - disc) * (100 + tax) AS DECIMAL(18,0))) AS DOUBLE)
             / 1000000.0 AS sum_charge,
           CAST(sum(CAST(qty AS DECIMAL(18,0))) AS DOUBLE) / count(*) AS avg_qty,
           CAST(sum(CAST(ep AS DECIMAL(18,0))) AS DOUBLE) / 100.0 / count(*) AS avg_price,
           CAST(sum(CAST(disc AS DECIMAL(18,0))) AS DOUBLE) / 100.0 / count(*) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM c
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped flagship aggregation; filter reaches the scan.
    Money math per the integer-unit plan (see ``_cents``/``_acc``):
    long arithmetic per row, decimal(28,0) accumulator per group."""
    qty = F.round(F.col("l_quantity")).cast("bigint")
    ep, disc, tax = _cents("l_extendedprice"), _cents("l_discount"), _cents("l_tax")
    n = F.count(F.lit(1))
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_acc(qty)).cast("double").alias("sum_qty"),
            (F.sum(_acc(ep)).cast("double") / 100.0).alias("sum_base_price"),
            (F.sum(_acc(ep * (100 - disc))).cast("double") / 10000.0).alias(
                "sum_disc_price"
            ),
            (F.sum(_acc(ep * (100 - disc) * (100 + tax))).cast("double") / 1000000.0)
            .alias("sum_charge"),
            (F.sum(_acc(qty)).cast("double") / n).alias("avg_qty"),
            (F.sum(_acc(ep)).cast("double") / 100.0 / n).alias("avg_price"),
            (F.sum(_acc(disc)).cast("double") / 100.0 / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@query(
    "revenue_by_nation",
    oracle="""
    SELECT r_name, n_name,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact stays put, every dim broadcast — zero fact
    shuffles before the final aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = broadcast_join(
        broadcast_join(
            broadcast_join(
                orders, customer.select("c_custkey", "c_nationkey"),
                on=F.col("o_custkey") == F.col("c_custkey"),
            ),
            nation.select("n_nationkey", "n_name", "n_regionkey"),
            on=F.col("c_nationkey") == F.col("n_nationkey"),
        ),
        region,
        on=F.col("n_regionkey") == F.col("r_regionkey"),
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "semi_join_urgent_customers",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        urgent, on=F.col("c_custkey") == F.col("o_custkey"), how="left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


@query(
    "anti_join_no_urgent_customers",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return customer.join(
        urgent, on=F.col("c_custkey") == F.col("o_custkey"), how="left_anti"
    ).select("c_custkey", "c_name")


@query(
    "left_join_order_item_stats",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(count(l_orderkey) AS BIGINT) AS n_items,
           coalesce(CAST(sum(CAST(CAST(round(l_quantity) AS BIGINT) AS DECIMAL(18,0)))
                         AS DOUBLE), 0.0) AS total_qty
    FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_totalprice
    """,
)
def q_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation pushed BELOW the join — the 100 TB plan. The naive
    shape (join both full tables, then group by orderkey) shuffles
    |lineitem| rows into the join and again into the aggregate; since
    the group key IS the join key, aggregating lineitem first shrinks
    the join input by the fan-in factor (~4× in TPC-H) and makes the
    join 1:1-narrow. Catalyst does not perform this rewrite itself —
    it's a semantic choice the query author owns. Quantity sums ride
    the integer-unit money plan (``_acc``: bigint per-row value,
    decimal(28,0) accumulator — 2× faster than decimal operands, still
    bit-exact; quantities are integral in TPC-H and the testdata)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity")).cast("bigint")
    items = lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(_acc(qty)).alias("_q"),
    )
    return (
        orders.join(items, on=F.col("o_orderkey") == F.col("l_orderkey"), how="left")
        .select(
            "o_orderkey",
            "o_totalprice",
            F.coalesce(F.col("_n"), F.lit(0)).alias("n_items"),
            F.coalesce(F.col("_q").cast("double"), F.lit(0.0)).alias("total_qty"),
        )
    )


@query(
    "top100_orders_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
    """,
)
def q_top100_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → TakeOrderedAndProject (per-partition limit + merge,
    no full sort)."""
    return top_k(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        k=100,
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
    )


@query(
    "top3_orders_per_priority",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) t WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return top_k(
        load_table(spark, sf_dir, "orders").select(
            "o_orderpriority", "o_orderkey", "o_totalprice"
        ),
        k=3,
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        partition_by=["o_orderpriority"],
    )


@query(
    "distinct_user_event_types",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct()


@query(
    "set_ops_users",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click' AND value > 120
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'signup' AND value > 120
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase' AND value > 180
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter((F.col("event_type") == "click") & (F.col("value") > 120)).select("user_id")
    signups = ev.filter((F.col("event_type") == "signup") & (F.col("value") > 120)).select("user_id")
    purchases = ev.filter((F.col("event_type") == "purchase") & (F.col("value") > 180)).select("user_id")
    return clicks.intersect(signups).subtract(purchases)


@query(
    "set_ops_all_multiset",
    oracle="""
    SELECT event_type FROM (
      SELECT event_type FROM events WHERE value > 100
      INTERSECT ALL
      SELECT event_type FROM events WHERE user_id % 2 = 0
    ) t
    EXCEPT ALL
    SELECT event_type FROM events WHERE value > 150
    """,
)
def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set ops (INTERSECT ALL / EXCEPT ALL): duplicates carry
    multiplicity — intersect keeps min(count_a, count_b) copies per
    row, except keeps count_a − count_b. Spark plans both as a single
    hash aggregation per op (count per side, generate), never a
    row-pairing join."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("value") > 100).select("event_type")
    b = ev.filter(F.col("user_id") % 2 == 0).select("event_type")
    c = ev.filter(F.col("value") > 150).select("event_type")
    return a.intersectAll(b).exceptAll(c)


@query(
    "window_rank_lag",
    oracle="""
    SELECT user_id, event_id, value,
           CAST(rank() OVER w AS BIGINT) AS value_rank,
           lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_value,
           avg(value) OVER (PARTITION BY user_id ORDER BY event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS moving_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY value DESC, event_id ASC)
    """,
)
def q_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions: one hash shuffle on the key, sorts
    stay partition-local."""
    ev = load_table(spark, sf_dir, "events")
    by_value = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    by_seq = Window.partitionBy("user_id").orderBy("event_id")
    moving = by_seq.rowsBetween(-2, Window.currentRow)
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.rank().over(by_value).cast("bigint").alias("value_rank"),
        F.lag("value").over(by_seq).alias("prev_value"),
        F.avg("value").over(moving).alias("moving_avg"),
    )


@query(
    "rollup_acctbal",
    oracle="""
    SELECT r_name, n_name, CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = broadcast_join(
        broadcast_join(customer, nation, on=F.col("c_nationkey") == F.col("n_nationkey")),
        region,
        on=F.col("n_regionkey") == F.col("r_regionkey"),
    )
    return joined.rollup("r_name", "n_name").agg(
        F.sum(_dec("c_acctbal")).cast("double").alias("total_bal"),
        F.count(F.lit(1)).alias("n_customers"),
    )


@query(
    "asof_join_click_to_signup",
    oracle="""
    SELECT a.event_id, a.user_id, a.ts, a.value,
           b.ts AS r_ts, b.value AS r_value
    FROM (SELECT * FROM events WHERE event_type = 'click') a
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') b
      ON a.user_id = b.user_id AND a.ts >= b.ts
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (clicks → latest signup ≤ ts per user): single-shuffle
    union + carry-forward plan (operators/relational.py:asof_join) vs
    DuckDB's native ASOF JOIN as oracle."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts", "value")
    return asof_join(
        clicks, signups, on=["user_id"], left_ts="ts", right_ts="ts",
        right_values=["ts", "value"],
    )


@query(
    "shipping_priority",
    oracle="""
    SELECT l_orderkey,
           CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))
                         AS DECIMAL(18,0))) AS DOUBLE) / 10000.0 AS revenue,
           o_orderdate, o_orderpriority
    FROM customer JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-shaped: selective dim filter broadcast into the fact
    join, then top-k on the aggregate.

    Revenue accumulates exactly (integer-unit plan, see ``_cents``) so
    the sum — and therefore the top-10 ORDERING — is bit-identical
    across engines; a double sum drifts by ulps and can both fail the
    value hash and swap near-tied ranks.
    """
    customer = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15")
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15")
    )
    joined = broadcast_join(
        orders, customer.select("c_custkey"), on=F.col("o_custkey") == F.col("c_custkey")
    ).join(lineitem, on=F.col("l_orderkey") == F.col("o_orderkey"))
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        (
            F.sum(_acc(_cents("l_extendedprice") * (100 - _cents("l_discount"))))
            .cast("double")
            / 10000.0
        ).alias("revenue")
    )
    return top_k(
        agg.select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority"),
        k=10,
        order_by=[F.col("revenue").desc(), F.col("l_orderkey").asc()],
    )


@query(
    "cube_order_status_priority",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets — all absent in the reference (SURVEY §2.4
    'grouping sets / cube / rollup: absent'); one shuffle, the grouping
    expansion happens map-side."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "full_outer_join_balances",
    oracle="""
    SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
           c.c_acctbal, o.total_spent
    FROM (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000) c
    FULL OUTER JOIN (
      SELECT o_custkey, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent
      FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    rich = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey", "c_acctbal")
    )
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.sum(_dec("o_totalprice")).cast("double").alias("total_spent"))
    )
    return rich.join(
        urgent, on=F.col("c_custkey") == F.col("o_custkey"), how="full_outer"
    ).select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        "c_acctbal",
        "total_spent",
    )


@query(
    "cross_join_status_grid",
    oracle="""
    SELECT r_name, s.o_orderstatus
    FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus FROM orders) s
    """,
)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").select("r_name")
    statuses = load_table(spark, sf_dir, "orders").select("o_orderstatus").distinct()
    return region.crossJoin(statuses)


@query(
    "range_join_price_bands",
    oracle="""
    SELECT b.band_id, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS band_revenue
    FROM orders o
    JOIN (SELECT i AS band_id, i * 50000.0 AS lo, (i + 1) * 50000.0 AS hi
          FROM (SELECT unnest(generate_series(0, 9)) AS i)) b
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band_id
    """,
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range) join: fact rows land in value bands via a
    non-equi condition. The band table is tiny → broadcast nested-loop,
    the only sane physical plan; the fact side never shuffles."""
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.range(0, 10).select(
        F.col("id").alias("band_id"),
        (F.col("id") * 50000.0).alias("lo"),
        ((F.col("id") + 1) * 50000.0).alias("hi"),
    )
    return (
        orders.join(
            F.broadcast(bands),
            on=(F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice")).cast("double").alias("band_revenue"),
        )
    )


@query(
    "window_distribution_funcs",
    oracle="""
    SELECT user_id, event_id,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           first_value(value) OVER w AS first_v,
           last_value(value) OVER (PARTITION BY user_id ORDER BY event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND UNBOUNDED FOLLOWING) AS last_v
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
    """,
)
def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (ntile/percent_rank/cume_dist/
    first_value/last_value) — same single-exchange shape as ranking."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "user_id",
        "event_id",
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first("value").over(w).alias("first_v"),
        F.last("value").over(w_full).alias("last_v"),
    )


@query(
    "salted_skew_aggregation",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS total_value,
           CAST(count(*) AS BIGINT) AS n,
           min(value) AS vmin,
           max(value) AS vmax
    FROM events GROUP BY event_type
    """,
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewed-key aggregation through the salted two-phase plan
    (operators/skew.py): 5 hot keys fan out over 16 salts for the
    partial agg, then combine. The oracle is the PLAIN aggregate —
    salting must be invisible in the result.

    ``total_value`` sums in DECIMAL(28,10): the two-phase salted sum
    re-orders double accumulation, so only an exact decimal partial is
    guaranteed to match the oracle bit-for-bit after the final double
    cast. min/max select existing values — no arithmetic — and stay raw.
    """
    from min_flink_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_dec", F.col("value").cast("decimal(28,10)")
    )
    out = salted_agg(
        ev,
        keys=["event_type"],
        aggs={
            "total_value": ("sum", "value_dec"),
            "n": ("count", "value"),
            "vmin": ("min", "value"),
            "vmax": ("max", "value"),
        },
        salt_col=F.col("event_id"),
        salts=16,
    )
    return out.withColumn("total_value", F.col("total_value").cast("double"))


@query(
    "global_sort_expensive_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    WHERE o_totalprice > 400000
    ORDER BY o_totalprice DESC, o_orderkey ASC
    """,
)
def q_global_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total ordering without a limit: Spark samples range boundaries
    and range-partitions, so the sort runs in parallel with merely
    concatenated partitions — no single-reducer funnel (the driver's
    comparator is order-insensitive; the operator under test is the
    range-partitioned sort itself)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    )


@query(
    "window_range_frame_1h",
    oracle="""
    WITH q AS (
      SELECT user_id, event_id, ts,
             CAST(round(value * 1000000) AS BIGINT) AS vu
      FROM events
    )
    SELECT user_id, event_id,
           sum(vu) OVER (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
             / 1000000.0 AS rolling_1h_value,
           CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
                               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                AS BIGINT) AS rolling_1h_events
    FROM q
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame (vs the ROWS frames elsewhere): per user,
    the rolling 1-hour event-time sum/count — frame membership is
    decided by TIMESTAMP DISTANCE, not row offsets, so ties and gaps
    behave per ANSI RANGE semantics. Values ride fixed-point micro-units
    for the engine-exact sum. Spark needs the SQL window-spec path for
    interval range frames; still one partition-local sort, no extra
    shuffle."""
    ev = load_table(spark, sf_dir, "events")
    ev.select(
        "user_id",
        "event_id",
        "ts",
        F.round(F.col("value") * 1000000).cast("bigint").alias("vu"),
    ).createOrReplaceTempView("_range_frame_events")
    return spark.sql(
        """
        SELECT user_id, event_id,
               sum(vu) OVER (PARTITION BY user_id ORDER BY ts
                             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                 / CAST(1000000 AS DOUBLE) AS rolling_1h_value,
               CAST(count(*) OVER (PARTITION BY user_id ORDER BY ts
                                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS rolling_1h_events
        FROM _range_frame_events
        """
    )


@query(
    "volume_shipping",
    oracle="""
    SELECT n_supp.n_name AS supp_nation,
           n_cust.n_name AS cust_nation,
           CAST(extract(year FROM l_shipdate) AS BIGINT) AS ship_year,
           CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))
                         AS DECIMAL(18,0))) AS DOUBLE) / 10000.0 AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n_cust ON c_nationkey = n_cust.n_nationkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n_supp ON s_nationkey = n_supp.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND n_supp.n_name <> n_cust.n_name
    GROUP BY 1, 2, 3
    """,
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-shaped: cross-border revenue flow per (supplier nation,
    customer nation, year). Six-way join where the same dimension
    (nation) joins twice under different roles — a join-planning
    stress: the only shuffle is lineitem⋈orders on the shared key;
    supplier/customer/nation all broadcast, and the date filter reaches
    the lineitem scan."""
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        # customer/supplier scale with SF (150k/10k rows per unit) — a
        # forced broadcast is a 100 TB executor OOM. No hint: AQE
        # broadcasts them while small and shuffles them at scale. Only
        # the fixed-cardinality nation projections keep the hint.
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return joined.groupBy(
        "supp_nation",
        "cust_nation",
        F.year("l_shipdate").cast("bigint").alias("ship_year"),
    ).agg(
        (
            F.sum(_acc(_cents("l_extendedprice") * (100 - _cents("l_discount"))))
            .cast("double")
            / 10000.0
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "market_share",
    oracle="""
    WITH flows AS (
      SELECT extract(year FROM o_orderdate) AS order_year,
             n_supp.n_name AS supp_nation,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_u
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n_cust ON c_nationkey = n_cust.n_nationkey
      JOIN region   ON n_cust.n_regionkey = r_regionkey
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n_supp ON s_nationkey = n_supp.n_nationkey
      WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
    )
    SELECT CAST(order_year AS BIGINT) AS order_year,
           CAST(sum(CAST(CASE WHEN supp_nation = 'NATION_7' THEN rev_u ELSE 0 END
                         AS DECIMAL(18,0))) AS DOUBLE)
             / CAST(sum(CAST(rev_u AS DECIMAL(18,0))) AS DOUBLE) AS mkt_share,
           CAST(count(*) AS BIGINT) AS n_items
    FROM flows GROUP BY order_year
    """,
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-shaped: one nation's share of PROMO-part revenue inside
    one region, per order year. Eight-way star: the part filter prunes
    the fact early (broadcast semi-ish), conditional aggregation
    computes share in a single pass — no self-join of yearly totals.
    Exact integer revenue units make the ratio bit-stable."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n_cust = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    europe = region.filter(F.col("r_name") == "EUROPE").select("r_regionkey")
    rev_u = _cents("l_extendedprice") * (100 - _cents("l_discount"))
    flows = (
        # part/customer/supplier scale with SF — no forced broadcast
        # (AQE picks it while small); hints stay only on the
        # fixed-cardinality nation/region projections.
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(europe), F.col("cn_region") == F.col("r_regionkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            "supp_nation",
            rev_u.alias("rev_u"),
        )
    )
    target = F.when(F.col("supp_nation") == "NATION_7", F.col("rev_u")).otherwise(F.lit(0))
    return flows.groupBy("order_year").agg(
        (
            F.sum(_acc(target)).cast("double")
            / F.sum(_acc(F.col("rev_u"))).cast("double")
        ).alias("mkt_share"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "salted_skew_join",
    oracle="""
    SELECT event_id, e.event_type, w.weight
    FROM events e
    JOIN (VALUES ('click', 1), ('view', 2), ('purchase', 3),
                 ('signup', 4), ('error', 5)) w(event_type, weight)
      ON e.event_type = w.event_type
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximally-skewed join (5 distinct keys across the whole fact)
    routed through the salted plan (operators/skew.py:salted_join):
    each hot key fans out over 16 salt sub-keys, the 5-row dim is
    replicated 16×. The oracle is the PLAIN join — salting must be
    invisible in the result."""
    from min_flink_spark.operators.skew import salted_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    dim = spark.createDataFrame(
        [("click", 1), ("view", 2), ("purchase", 3), ("signup", 4), ("error", 5)],
        "event_type string, weight long",
    )
    return salted_join(
        ev, dim, on=["event_type"], salt_col=F.col("event_id"), salts=16
    ).select("event_id", "event_type", "weight")


@query(
    "top_supplier_revenue",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                           * (100 - CAST(round(l_discount * 100) AS BIGINT))
                           AS DECIMAL(18,0))) AS DOUBLE) / 10000.0 AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-shaped: revenue per supplier over one quarter, keep
    the supplier(s) hitting the maximum. The max is a scalar from the
    SAME aggregate (broadcast back — no second scan of lineitem, no
    global sort); revenue uses the integer-unit exact plan so the
    equality predicate can't be broken by float drift."""
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    rev = lineitem.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        (
            F.sum(_acc(_cents("l_extendedprice") * (100 - _cents("l_discount"))))
            .cast("double")
            / 10000.0
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        # mx is a 1-row scalar → broadcast by construction. supplier
        # scales with SF, and after the max-filter the LEFT side is the
        # ~1-row sliver — forcing the unbounded dim broadcast was
        # backwards; AQE broadcasts the sliver on its own.
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(supplier, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "skew_report",
    oracle="""
    WITH per_key AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(cnt) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_keys,
             max(cnt) AS max_cnt
      FROM per_key
    ),
    top AS (
      SELECT user_id, cnt FROM per_key ORDER BY cnt DESC, user_id ASC LIMIT 10
    )
    SELECT t.user_id, t.cnt,
           round(CAST(t.cnt AS DOUBLE) / total, 6) AS share,
           round(CAST(max_cnt * n_keys AS DOUBLE) / total, 6) AS skew_ratio
    FROM top t CROSS JOIN tot
    """,
)
def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostics: the pre-flight check you run BEFORE picking
    a join/agg strategy at scale — top-10 heaviest keys with their share
    of all rows, plus the global skew ratio (max key count over the mean;
    1.0 = uniform, >>1 = salt or AQE-skew-join territory).

    Scale: one hash-agg on the key, a scalar second agg, and a
    TakeOrderedAndProject for the top-10 — never a global sort, and the
    per-key table itself never leaves the executors.  skew_ratio
    multiplies exact bigints (max*n_keys) before its single double
    division, so the oracle matches bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    tot = per_key.agg(
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_cnt"),
    )
    top = per_key.orderBy(F.col("cnt").desc(), F.col("user_id").asc()).limit(10)
    return top.crossJoin(F.broadcast(tot)).select(
        "user_id",
        "cnt",
        F.round(F.col("cnt").cast("double") / F.col("total"), 6).alias("share"),
        F.round(
            (F.col("max_cnt") * F.col("n_keys")).cast("double") / F.col("total"), 6
        ).alias("skew_ratio"),
    )


@query(
    "promo_revenue_share",
    oracle="""
    WITH c AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_u,
             p_type LIKE 'PROMO%' AS is_promo
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
    )
    SELECT 100.0 * CAST(sum(CASE WHEN is_promo THEN CAST(rev_u AS DECIMAL(18,0))
                                 ELSE CAST(0 AS DECIMAL(18,0)) END) AS DOUBLE)
             / CAST(sum(CAST(rev_u AS DECIMAL(18,0))) AS DOUBLE) AS promo_share_pct,
           CAST(sum(CAST(rev_u AS DECIMAL(18,0))) AS DOUBLE) / 10000.0
             AS total_revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM c
    """,
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14 shape: promo-type revenue share for one ship month.
    The month filter reaches the lineitem scan (partition-prunable on a
    date-partitioned layout); the part join carries NO broadcast hint —
    part grows with SF in TPC-H, so the choice belongs to AQE (broadcast
    at bench scale, shuffle on p_partkey at 100 TB).  Revenue
    accumulates in exact integer cents² units (decimal(28,0)
    accumulator), so the single double division — the only inexact op —
    runs over bit-identical operands on both engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-09-01"))
        & (F.col("l_shipdate") < F.lit("1995-10-01"))
    )
    part = load_table(spark, sf_dir, "part")
    rev_u = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    joined = li.join(part, F.col("l_partkey") == F.col("p_partkey")).select(
        rev_u.alias("rev_u"), F.col("p_type").startswith("PROMO").alias("is_promo")
    )
    promo = F.sum(
        F.when(F.col("is_promo"), _acc(F.col("rev_u"))).otherwise(
            _acc(F.lit(0))
        )
    ).cast("double")
    total = F.sum(_acc(F.col("rev_u"))).cast("double")
    return joined.agg(
        (F.lit(100.0) * promo / total).alias("promo_share_pct"),
        (total / 10000.0).alias("total_revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "returned_item_customers",
    oracle="""
    WITH c AS (
      SELECT o_custkey,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev_u
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    )
    SELECT c.o_custkey AS c_custkey, n_name,
           CAST(sum(CAST(rev_u AS DECIMAL(18,0))) AS DOUBLE) / 10000.0 AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM c
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2
    ORDER BY revenue DESC, c_custkey ASC LIMIT 20
    """,
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10 shape: top-20 customers by revenue lost to returns in a
    quarter.  Returnflag filter pushes to the lineitem scan; orders
    (date-filtered) joins on the shared orderkey; customer/nation dims
    broadcast; the cut is TakeOrderedAndProject with a custkey tiebreak
    so row membership at the boundary is deterministic.  Revenue is
    exact integer cents² with a decimal(28,0) accumulator."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev_u = _cents("l_extendedprice") * (F.lit(100) - _cents("l_discount"))
    fact = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "o_custkey", rev_u.alias("rev_u")
    )
    return (
        # NO hint on customer: it scales with SF (15 B rows at the 100 TB
        # point) — AQE broadcasts at bench scale, shuffles on custkey at
        # scale. nation is 25 rows, bounded by construction.
        fact.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("o_custkey").alias("c_custkey"), F.col("n_name"))
        .agg(
            (F.sum(_acc(F.col("rev_u"))).cast("double") / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "temporal_table_join",
    oracle="""
    WITH changes AS (
      SELECT user_id, ts AS valid_from, event_type AS status FROM (
        SELECT user_id, ts, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM events WHERE event_type IN ('signup', 'error', 'view')
      ) WHERE prev IS DISTINCT FROM event_type
    ),
    facts AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT f.user_id, f.event_id, f.ts, c.status AS status_at_purchase
    FROM facts f
    ASOF LEFT JOIN changes c
      ON f.user_id = c.user_id AND f.ts >= c.valid_from
    """,
)
def q_temporal_table_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flink-style TEMPORAL TABLE JOIN (versioned-table enrichment):
    each purchase joins the version of its user's status dimension in
    effect AT the purchase's event time. The versioned table is built
    by SCD2 changelog compaction (operators/pipeline.scd2_from_changelog
    over the status events) and the event-time lookup is the
    single-shuffle as-of carry-forward (operators/relational.asof_join)
    — never a per-fact range scan of version history. Purchases before
    any status row keep a NULL version (left semantics), matching
    DuckDB's native ASOF LEFT JOIN as the oracle."""
    from min_flink_spark.operators.pipeline import scd2_from_changelog
    from min_flink_spark.operators.relational import asof_join

    ev = load_table(spark, sf_dir, "events")
    status_log = ev.filter(F.col("event_type").isin("signup", "error", "view"))
    versions = scd2_from_changelog(
        status_log.select("user_id", "event_type", "ts", "event_id"),
        key_cols=["user_id"],
        attr_cols=["event_type"],
        ts_col="ts",
        seq_col="event_id",
    ).select("user_id", F.col("event_type").alias("status"), "valid_from")
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    return asof_join(
        facts, versions, on=["user_id"], left_ts="ts", right_ts="valid_from",
        right_values=["status"],
    ).select(
        "user_id", "event_id", "ts", F.col("r_status").alias("status_at_purchase")
    )


@query(
    "local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))
                         AS DECIMAL(18,0))) AS DOUBLE) / 10000.0 AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
                 AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped: revenue where the customer and the supplier sit
    in the SAME nation inside one region — the co-nationality join
    predicate that makes Q5 more than a star join (supplier joins on
    BOTH the line's supp key and the customer's nation). Date filter
    reaches the orders scan; nation/region keep broadcast hints
    (fixed cardinality); customer/supplier shuffle — AQE owns any
    broadcast while small. Integer-unit revenue, bit-exact."""
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    ).select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    ).select("r_regionkey")
    joined = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.groupBy("n_name").agg(
        (
            F.sum(_acc(_cents("l_extendedprice") * (100 - _cents("l_discount"))))
            .cast("double")
            / 10000.0
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "forecast_revenue_change",
    oracle="""
    SELECT CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * CAST(round(l_discount * 100) AS BIGINT)
                         AS DECIMAL(18,0))) AS DOUBLE) / 10000.0 AS revenue_delta,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND round(l_discount * 100) BETWEEN 5 AND 7
      AND l_quantity < 24
    """,
)
def q_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-shaped: the pure-pushdown scan-aggregate — every
    predicate (date range, discount band, quantity cap) must reach the
    parquet scan, no join, no shuffle beyond the final 1-row partial
    merge. The discount band compares in exact integer cents so the
    selected row set is bit-stable (a raw double BETWEEN 0.05 AND 0.07
    straddles representation error)."""
    li = load_table(spark, sf_dir, "lineitem")
    picked = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
        & _cents("l_discount").between(5, 7)
        & (F.col("l_quantity") < 24)
    )
    return picked.agg(
        (
            F.sum(_acc(_cents("l_extendedprice") * _cents("l_discount")))
            .cast("double")
            / 10000.0
        ).alias("revenue_delta"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ONE ground truth for the Bloom runtime-filter family: the batch
# build and the streaming-state build (queries/streaming_q.py) produce
# the same certificate row — both decorators reference THIS constant
# (parametric in m so the plan-literal and large-m join-probe builds
# replay against the identical relational spec).
def bloom_prefilter_oracle(m_bits: int) -> str:
    return f"""
    WITH urgent AS (
      SELECT o_orderkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
    ),
    ii AS (SELECT unnest([0, 1, 2]) AS i),
    bits AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5(CAST(k AS VARCHAR) || ':'
                                      || CAST(i AS VARCHAR)), 1, 8))
                  AS BIGINT) % {m_bits} AS pos
      FROM urgent, ii
    ),
    keys AS (SELECT DISTINCT l_orderkey FROM lineitem),
    keypass AS (
      SELECT l_orderkey,
             (count(*) FILTER (WHERE pos IN (SELECT pos FROM bits)) = 3)
               AS bloom_pass
      FROM (
        SELECT l_orderkey, i,
               CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || ':'
                                        || CAST(i AS VARCHAR)), 1, 8))
                    AS BIGINT) % {m_bits} AS pos
        FROM keys, ii
      ) GROUP BY 1
    ),
    flags AS (
      SELECT kp.bloom_pass, (u.k IS NOT NULL) AS is_match
      FROM lineitem l
      JOIN keypass kp USING (l_orderkey)
      LEFT JOIN urgent u ON l.l_orderkey = u.k
    )
    SELECT CAST(count(*) AS BIGINT) AS n_fact,
           CAST(count(*) FILTER (WHERE bloom_pass) AS BIGINT) AS n_passed,
           CAST(count(*) FILTER (WHERE is_match) AS BIGINT) AS n_matched,
           CAST(count(*) FILTER (WHERE is_match AND NOT bloom_pass) AS BIGINT)
             AS n_false_neg,
           CAST(count(*) FILTER (WHERE bloom_pass AND NOT is_match) AS BIGINT)
             AS n_fp_rows
    FROM flags
    """


BLOOM_PREFILTER_ORACLE = bloom_prefilter_oracle(8192)


@query("bloom_prefilter_join", oracle=BLOOM_PREFILTER_ORACLE)
def q_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter runtime pre-filtering (operators/relational.
    bloom_bitmask / bloom_might_contain) — THE big-join optimization at
    100 TB: the dim side's join keys (urgent orders) compress into an
    8192-bit mask built by one posexplode + bit_or hash-agg (only
    m/64 = 128 longs cross to the driver), and the fact scan drops
    non-joining rows with O(1) codegen bit-tests BEFORE the join's
    shuffle. The gate row is the filter-effectiveness certificate:
    n_false_neg MUST be 0 (a joining row always passes — the Bloom
    guarantee), n_fp_rows is the bounded leak the join itself later
    drops, and the oracle replays bit-building and all 3 probes
    relationally, so a hashing/packing/probe defect on either side
    flips the row. The same mask arithmetic is engine-portable (md5
    bucket idiom), which is what lets heterogeneous pipeline stages
    share one runtime filter."""
    from min_flink_spark.operators.relational import bloom_bitmask

    urgent = urgent_order_keys(spark, sf_dir)
    mask = bloom_bitmask(urgent, "k", m_bits=8192, k_hashes=3)
    return bloom_effectiveness_certificate(spark, sf_dir, mask)


@query("bloom_bigm_prefilter_join", oracle=bloom_prefilter_oracle(1 << 20))
def q_bloom_bigm_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LARGE-m Bloom probe (VERDICT r8 item 3; operators/relational.
    bloom_word_frame / bloom_probe_tag): same runtime-filter semantics
    as bloom_prefilter_join but at m = 2^20 bits, past where the
    plan-literal mask belongs — the filter stays as the (word, mask)
    DATA frame (16K rows here; never expression tree), and each of the
    3 probes is a broadcast equi-join on ``pos div 64`` + the identical
    shift/AND bit test, pipelined in the fact scan stage with AQE
    reusing the ONE build exchange across all three joins (plan-locked:
    tests/test_plan_assertions.py). The fact side never shuffles at any
    m, which is what makes this the 100 TB shape: a hundreds-of-megabit
    filter is a few-MB build side, not a task-binary blowup. Same
    certificate as the literal path — n_false_neg MUST be 0; at this m
    the false-positive leak is ~0 too (analytic fp ≈ (k·n/m)^k), so
    n_passed ≈ n_matched, which the oracle replays exactly."""
    urgent = urgent_order_keys(spark, sf_dir)
    from min_flink_spark.operators.relational import bloom_word_frame

    words = bloom_word_frame(urgent, "k", m_bits=1 << 20, k_hashes=3)
    return bloom_effectiveness_certificate(
        spark, sf_dir, m_bits=1 << 20, words=words
    )


def urgent_order_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Bloom family's dim side (shared by the batch and streaming
    builds so both certify against the same key set)."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("k"))
    )


def bloom_effectiveness_certificate(
    spark: SparkSession,
    sf_dir: str,
    mask: list | None = None,
    m_bits: int = 8192,
    k_hashes: int = 3,
    words: DataFrame | None = None,
) -> DataFrame:
    """The ONE copy of the filter-effectiveness certificate every Bloom
    gate query emits against ``bloom_prefilter_oracle(m)``: probe
    lineitem with the finalized filter, left-join the true key set, and
    aggregate (n_fact, n_passed, n_matched, n_false_neg, n_fp_rows). A
    fork of this block on any build path could silently drift from the
    shared oracle (ADVICE-style duplication trap, factored in r8).
    Pass ``mask`` (collected longs) for the plan-literal probe or
    ``words`` (the (word, mask) frame) for the large-m join probe —
    both replay against the same relational spec."""
    from min_flink_spark.operators.relational import (
        bloom_might_contain,
        bloom_probe_tag,
    )

    if mask is None and words is None:
        raise ValueError(
            "bloom_effectiveness_certificate: pass mask= (plan-literal "
            "probe) or words= (large-m join probe)"
        )
    urgent = urgent_order_keys(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    if words is not None:
        tagged = bloom_probe_tag(li, "l_orderkey", words, m_bits, k_hashes)
    else:
        tagged = li.withColumn(
            "bloom_pass",
            bloom_might_contain(F.col("l_orderkey"), mask, m_bits, k_hashes),
        )
    # no broadcast hint: urgent scales with SF; Catalyst picks the
    # strategy (auto-broadcast at gate SFs, shuffle join at 100 TB)
    flagged = tagged.join(
        urgent, tagged["l_orderkey"] == urgent["k"], "left"
    ).select("bloom_pass", F.col("k").isNotNull().alias("is_match"))
    b = lambda c: c.cast("int").cast("bigint")  # noqa: E731
    return flagged.agg(
        F.count(F.lit(1)).alias("n_fact"),
        F.sum(b(F.col("bloom_pass"))).alias("n_passed"),
        F.sum(b(F.col("is_match"))).alias("n_matched"),
        F.sum(b(F.col("is_match") & ~F.col("bloom_pass"))).alias("n_false_neg"),
        F.sum(b(F.col("bloom_pass") & ~F.col("is_match"))).alias("n_fp_rows"),
    )


@query(
    "product_profit_by_nation_year",
    oracle="""
    WITH amounts AS (
      SELECT n.n_name AS nation,
             CAST(extract(year FROM o.o_orderdate) AS BIGINT) AS order_year,
             CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
               - CAST(round(p.p_retailprice * 100) AS BIGINT)
               * CAST(round(l.l_quantity) AS BIGINT) * 100 AS amount_u
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN part p     ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%widget%'
    )
    SELECT nation, order_year,
           CAST(sum(CAST(amount_u AS DECIMAL(18,0))) AS BIGINT) AS profit_u,
           CAST(count(*) AS BIGINT) AS n_items
    FROM amounts GROUP BY 1, 2
    """,
)
def q_product_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 SHAPE (product-line profit by supplier nation and
    order year; no partsupp in this schema, so the cost leg is
    p_retailprice · quantity instead of ps_supplycost · quantity):
    a five-table join filtered by part-name LIKE, with SIGNED profit
    amounts — the shape that stresses join ordering (the selective
    part scan must drive) and signed-sum exactness. Money discipline:
    revenue and cost both in integer 10^-4 currency units
    (cents × cents-scale), summed through a decimal(18,0) cast so
    Spark allocates the overflow-safe decimal(28,0) accumulator; the
    LIKE pushes down to the part scan and Catalyst broadcasts the
    pruned dims. Signed integer sums are order-independent, so the
    hash is parallelism-stable."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    amount = (
        _cents("l_extendedprice") * (100 - _cents("l_discount"))
        - _cents("p_retailprice") * F.round("l_quantity").cast("bigint") * 100
    )
    rows = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(part, li["l_partkey"] == part["p_partkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(nat, supp["s_nationkey"] == nat["n_nationkey"])
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            amount.alias("amount_u"),
        )
    )
    return rows.groupBy("nation", "order_year").agg(
        F.sum(_acc(F.col("amount_u"))).cast("bigint").alias("profit_u"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS INT) AS p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size IN (1, 9, 19, 29)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY 1, 2, 3
    """,
)
def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 SHAPE (how many qualified suppliers can deliver each
    part segment; the NOT IN exclusion list in the original is the
    complaint suppliers — here, suppliers in deficit): per
    (brand, type, size ∈ {1,9,19,29}) the DISTINCT supplier count
    from the lineitem relationship table, excluding the deficit list.
    Plan shape: the NOT IN over a non-nullable key column plans as a
    left-anti join against the tiny exclusion frame (no null-aware
    nested loop needed — s_suppkey is a key), the size IN-list pushes
    to the part scan, and count(DISTINCT) hash-aggregates in two
    stages (partial distinct before the shuffle). Counts are exact
    integers; the oracle replays the same exclusion semantics."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").isin(1, 9, 19, 29)
    )
    deficit = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("l_suppkey"))
    kept = li.join(deficit, "l_suppkey", "left_anti")
    return (
        kept.join(part, kept["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", F.col("p_size").cast("int").alias("p_size"))
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )
