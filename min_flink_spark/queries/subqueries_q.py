"""Correlated-subquery query shapes, decorrelated the way a 100 TB
planner must (SURVEY §2.5 — the reference has no join/subquery surface
at all, so DuckDB-oracle SQL semantics is the spec; these cover the
remaining classic TPC-H subquery patterns: Q13/Q17/Q18/Q22/Q11 shapes
plus a funnel conversion analytic).

Scale doctrine shared by all of these: a correlated subquery is never
executed per-row — it is rewritten as (a) a pre-aggregation joined back
on the correlation key, or (b) a scalar aggregate broadcast back with
``crossJoin(F.broadcast(...))``. Both rewrites keep every comparison in
exact integer units (cents / integer quantities) so the filtered row
set — and therefore the oracle hash — is bit-stable at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from min_flink_spark.registry import query
from min_flink_spark.sources import load_table


def _cents(col: str):
    return F.round(F.col(col) * 100).cast("bigint")


def _acc(col):
    """Per-row exact integer → decimal(18,0): Spark widens the SUM
    accumulator to decimal(28,0) (overflow-safe at the 100 TB design
    point), while each row value stays long-backed."""
    return col.cast("decimal(18,0)")


@query(
    "customer_order_distribution",
    oracle="""
    WITH oc AS (
      SELECT o_custkey, count(*) AS c
      FROM orders WHERE o_orderpriority <> '5-LOW'
      GROUP BY o_custkey
    )
    SELECT CAST(coalesce(c, 0) AS BIGINT) AS n_orders,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer LEFT JOIN oc ON c_custkey = o_custkey
    GROUP BY 1
    """,
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-shaped: distribution of per-customer order counts,
    customers with zero qualifying orders included.

    Scale shape: the naive plan outer-joins the full orders table to
    customer and aggregates twice. Here orders is aggregated FIRST
    (count per custkey — map-side partials make this cheap), so the
    outer join moves one narrow row per customer instead of every
    order row; the second aggregation is over one row per customer.
    At 10^9 customers both sides shuffle on the key — no broadcast
    hint, AQE owns the choice."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        orders.filter(F.col("o_orderpriority") != "5-LOW")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    counted = customer.join(
        per_cust, customer.c_custkey == per_cust.o_custkey, "left"
    ).select(F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("n_orders"))
    return counted.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@query(
    "small_quantity_revenue",
    oracle="""
    WITH pq AS (
      SELECT l_partkey,
             sum(CAST(round(l_quantity) AS BIGINT)) AS sq,
             count(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                         AS DECIMAL(18,0))) AS DOUBLE) / 100.0 / 7.0
             AS avg_yearly,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN pq   ON pq.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#1'
      AND 2 * CAST(round(l_quantity) AS BIGINT) * cnt < sq
    """,
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-shaped: revenue from small-quantity orders of one
    brand's parts, "small" = below half the part's average quantity.

    The correlated scalar subquery (avg quantity for THIS part) is
    decorrelated into one per-part pre-aggregation joined back on
    l_partkey — both lineitem scans shuffle on the same key, so the
    exchange is reused. The avg comparison runs as exact integers
    (2·qty·cnt < Σqty ⟺ qty < avg/2, no float division), so the
    qualifying row set is bit-stable. The brand filter reaches the
    part scan and part broadcasts."""
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#1"
    ).select("p_partkey")
    qty = F.round(F.col("l_quantity")).cast("bigint")
    per_part = lineitem.groupBy(F.col("l_partkey").alias("pq_key")).agg(
        F.sum(qty).alias("sq"), F.count(F.lit(1)).alias("cnt")
    )
    small = (
        # part scales with SF even after the brand filter — no forced
        # broadcast; AQE picks it while small.
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("pq_key"))
        .filter(2 * qty * F.col("cnt") < F.col("sq"))
    )
    return small.agg(
        (
            F.sum(_acc(_cents("l_extendedprice"))).cast("double") / 100.0 / 7.0
        ).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, sum(CAST(round(l_quantity) AS BIGINT)) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 300
    )
    SELECT c_name, CAST(c_custkey AS BIGINT) AS c_custkey,
           CAST(o_orderkey AS BIGINT) AS o_orderkey,
           o_orderdate,
           CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS DOUBLE) / 100.0
             AS o_totalprice,
           CAST(total_qty AS BIGINT) AS total_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    """,
)
def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-shaped: customers whose single order moved more than
    300 units. The IN-subquery-with-HAVING is planned as aggregate →
    filter → join: the per-order quantity rollup (map-side partials)
    shrinks lineitem to one row per order, the HAVING cuts that to a
    sliver, and only the sliver joins orders and customer. No
    broadcast hints: at runtime AQE sees the post-HAVING side is tiny
    and broadcasts it — exactly the adaptive behavior a fixed hint on
    customer (10^9 rows at scale) would destroy."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.round(F.col("l_quantity")).cast("bigint")).alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            (_cents("o_totalprice").cast("double") / 100.0).alias("o_totalprice"),
            "total_qty",
        )
    )


@query(
    "idle_rich_customers",
    oracle="""
    WITH t AS (
      SELECT sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS s,
             count(*) AS n
      FROM customer WHERE c_acctbal > 0
    ),
    u AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE o_orderpriority = '1-URGENT'
    )
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(sum(CAST(CAST(round(c_acctbal * 100) AS BIGINT)
                         AS DECIMAL(18,0))) AS DOUBLE) / 100.0 AS total_bal
    FROM customer, t
    WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n > s
      AND NOT EXISTS (SELECT 1 FROM u WHERE u.o_custkey = c_custkey)
    GROUP BY c_nationkey
    """,
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-shaped: above-average-balance customers who never
    placed an urgent order, grouped by nation.

    Two decorrelations in one query: the scalar subquery (global
    average positive balance) becomes a 1-row aggregate broadcast back
    with crossJoin, and the NOT EXISTS becomes a left-anti join on the
    distinct urgent-customer keys. The average comparison is exact
    integer cents (bal·n > Σbal ⟺ bal > avg). At scale both anti-join
    sides shuffle on c_custkey — no hint; the 1-row threshold is the
    only forced broadcast."""
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    orders = load_table(spark, sf_dir, "orders")
    thr = (
        customer.filter(F.col("c_acctbal") > 0)
        .agg(
            F.sum(_cents("c_acctbal")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    urgent = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    rich = (
        customer.crossJoin(F.broadcast(thr))
        .filter(_cents("c_acctbal") * F.col("n") > F.col("s"))
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return rich.groupBy(
        F.col("c_nationkey").cast("bigint").alias("nationkey")
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        (F.sum(_acc(_cents("c_acctbal"))).cast("double") / 100.0).alias("total_bal"),
    )


@query(
    "part_value_concentration",
    oracle="""
    WITH pv AS (
      SELECT l_partkey,
             sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS v
      FROM lineitem GROUP BY l_partkey
    ),
    t AS (SELECT sum(v) AS s, count(*) AS n FROM pv)
    SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
           CAST(CAST(v AS DECIMAL(18,0)) AS DOUBLE) / 100.0 AS part_value
    FROM pv, t
    WHERE 10 * CAST(v AS BIGINT) * n > 11 * CAST(s AS BIGINT)
    """,
)
def q_part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-shaped: parts whose revenue exceeds 1.1× the average
    per-part revenue — a HAVING against a global scalar computed from
    the same aggregation.

    One pass builds the per-part rollup; its own re-aggregation (2
    longs) broadcasts back, so the "subquery over the subquery" costs
    one extra 1-row exchange, never a rescan. Threshold arithmetic is
    integer (10·v·n > 11·s ⟺ v > 1.1·avg) — bigint headroom holds to
    ~10^17 total cents; beyond that, swap the comparison operands to
    the decimal accumulators (same plan shape)."""
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice"
    )
    pv = lineitem.groupBy("l_partkey").agg(
        F.sum(_cents("l_extendedprice")).alias("v")
    )
    tot = pv.agg(F.sum(F.col("v")).alias("s"), F.count(F.lit(1)).alias("n"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(
            10 * F.col("v").cast("bigint") * F.col("n")
            > 11 * F.col("s").cast("bigint")
        )
        .select(
            "l_partkey",
            (F.col("v").cast("decimal(18,0)").cast("double") / 100.0).alias(
                "part_value"
            ),
        )
    )


@query(
    "event_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, min(ts) AS tv FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS tc
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click'
        AND e.ts > v.tv AND e.ts <= v.tv + INTERVAL 24 HOUR
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS tp
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts > c.tc AND e.ts <= c.tc + INTERVAL 24 HOUR
      GROUP BY e.user_id
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view_users,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_click_users,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchase_users,
           CAST((SELECT count(*) FROM c) AS DOUBLE)
             / CAST((SELECT count(*) FROM v) AS DOUBLE) AS view_to_click,
           CAST((SELECT count(*) FROM p) AS DOUBLE)
             / CAST((SELECT count(*) FROM c) AS DOUBLE) AS click_to_purchase
    """,
)
def q_event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion: first view → first click within 24 h
    of that view → first purchase within 24 h of that click; emits
    stage populations and conversion rates.

    Each stage is one aggregation keyed by user_id, joined to the
    previous stage on the same key — the whole funnel rides a single
    shuffle partitioning end-to-end (every exchange is on user_id;
    stage outputs shrink monotonically). The alternative single-pass
    sort-per-user window needs a full per-user ordering; this shape
    needs only min() partials, so it map-side-combines at 100 TB."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    day = F.expr("INTERVAL 24 HOURS")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy(F.col("user_id").alias("v_user"))
        .agg(F.min("ts").alias("tv"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, F.col("user_id") == F.col("v_user"))
        .filter((F.col("ts") > F.col("tv")) & (F.col("ts") <= F.col("tv") + day))
        .groupBy(F.col("user_id").alias("c_user"))
        .agg(F.min("ts").alias("tc"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, F.col("user_id") == F.col("c_user"))
        .filter((F.col("ts") > F.col("tc")) & (F.col("ts") <= F.col("tc") + day))
        .groupBy(F.col("user_id").alias("p_user"))
        .agg(F.min("ts").alias("tp"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_view_users"))
    nc = c.agg(F.count(F.lit(1)).alias("n_click_users"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchase_users"))
    return (
        nv.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .select(
            "n_view_users",
            "n_click_users",
            "n_purchase_users",
            (
                F.col("n_click_users").cast("double")
                / F.col("n_view_users").cast("double")
            ).alias("view_to_click"),
            (
                F.col("n_purchase_users").cast("double")
                / F.col("n_click_users").cast("double")
            ).alias("click_to_purchase"),
        )
    )


_CHAIN_SQL = """
WITH RECURSIVE chain (user_id, start_id, cur_ts, cur_id, depth) AS (
  SELECT user_id, event_id, ts, event_id, 1
  FROM events WHERE event_type = 'signup'
  UNION ALL
  SELECT c.user_id, c.start_id, e.ts, e.event_id, c.depth + 1
  FROM chain c JOIN events e
    ON e.user_id = c.user_id
   AND (e.ts > c.cur_ts OR (e.ts = c.cur_ts AND e.event_id > c.cur_id))
   AND e.ts <= c.cur_ts + INTERVAL 2 HOUR
   AND c.depth < 20
)
SELECT CAST(start_id AS BIGINT) AS start_id,
       CAST(max(depth) AS BIGINT) AS max_depth,
       CAST(count(*) AS BIGINT) AS n_paths
FROM chain GROUP BY start_id
"""


@query("recursive_event_chains", oracle=_CHAIN_SQL)
def q_recursive_event_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive dataflow on Spark 4's WITH RECURSIVE: from every
    signup, follow all event chains whose inter-event gap is ≤ 2 h
    (strictly forward in (ts, event_id), so the recursion is acyclic
    by construction; depth-capped at 20 as a runaway guard). Emits per
    signup the deepest chain and the path count — the IterativeStream
    capability expressed declaratively. The IDENTICAL SQL runs on both
    engines. Scale note: each recursion level is one equi-join on
    user_id over the shrinking frontier; the per-level working set is
    bounded by chain branching, which the gap window keeps sparse —
    for dense windows, the iterative pointer-jumping operator
    (operators/graph.py) is the right tool instead."""
    from min_flink_spark.sources import register_views

    register_views(spark, sf_dir, ["events"])
    return spark.sql(_CHAIN_SQL)


_LATERAL_SQL = """
SELECT c.c_custkey, o.o_orderkey,
       CAST(CAST(round(o.o_totalprice * 100) AS BIGINT) AS DOUBLE) / 100.0
         AS o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
WHERE c.c_mktsegment = 'BUILDING'
"""


@query("lateral_top2_orders", oracle=_LATERAL_SQL)
def q_lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT: each
    BUILDING customer's two most expensive orders. Spark DECORRELATES
    this into a hash join + per-key limit (verified: the executed plan
    is a BroadcastHashJoin at test SF, shuffle join at scale — never a
    per-customer rescan), which is exactly why exposing the lateral
    surface is safe at 100 TB. Identical SQL on both engines."""
    from min_flink_spark.sources import register_views

    register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(_LATERAL_SQL)


@query(
    "disjunctive_predicate_revenue",
    oracle="""
    SELECT CAST(sum(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(round(l_discount * 100) AS BIGINT))
                         AS DECIMAL(18,0))) AS DOUBLE) / 10000.0 AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND CAST(round(l_quantity) AS BIGINT) BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
           AND CAST(round(l_quantity) AS BIGINT) BETWEEN 5 AND 25)
    """,
)
def q_disjunctive_predicate_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-shaped: revenue under an OR-of-ANDs predicate spanning
    both join sides. The planner exercise is DISJUNCTIVE pushdown:
    Catalyst distributes the OR into per-side residuals (part rows
    outside both brand/size envelopes and lineitems outside the union
    of quantity ranges never reach the join) while the cross-side
    conjunctions evaluate post-join. Exact integer quantity bounds keep
    the row set hash-stable."""
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.round(F.col("l_quantity")).cast("bigint")
    cond1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 10)
        & qty.between(10, 30)
    )
    cond2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(5, 20)
        & qty.between(5, 25)
    )
    # part scales with SF — no forced broadcast (AQE decides).
    joined = lineitem.join(
        part, F.col("p_partkey") == F.col("l_partkey")
    ).filter(cond1 | cond2)
    return joined.agg(
        (
            F.sum(_acc(_cents("l_extendedprice") * (100 - _cents("l_discount"))))
            .cast("double")
            / 10000.0
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "waiting_supplier_counts",
    oracle="""
    WITH sup_per_order AS (
      SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_s
      FROM lineitem GROUP BY l_orderkey
    ),
    late AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
    ),
    late_per_order AS (
      SELECT l_orderkey, count(*) AS n_ls, min(l_suppkey) AS the_supp
      FROM late GROUP BY l_orderkey
    )
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM sup_per_order o
    JOIN late_per_order l USING (l_orderkey)
    JOIN supplier ON s_suppkey = the_supp
    WHERE o.n_s > 1 AND l.n_ls = 1
    GROUP BY s_name
    """,
)
def q_waiting_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-shaped: suppliers who were the SOLE late shipper in
    multi-supplier orders ("late" = shipped >60 days after the order
    date; the trim's schema has no commit/receipt dates, so ship-lag
    plays that role). The classic EXISTS + NOT-EXISTS double
    correlation decorrelates into two per-order aggregates — distinct
    suppliers, distinct LATE suppliers — joined once on the order key:
    qualifying orders have n_suppliers > 1 and exactly one late
    supplier, and min(late supplier) IS that supplier when n_late = 1.
    Every exchange rides l_orderkey until the final small rollup."""
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    sup_per_order = lineitem.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_s")
    )
    late = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    late_per_order = late.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_ls"), F.min("l_suppkey").alias("the_supp")
    )
    qualifying = (
        sup_per_order.join(late_per_order, "l_orderkey")
        .filter((F.col("n_s") > 1) & (F.col("n_ls") == 1))
    )
    return (
        # supplier scales with SF — no forced broadcast (AQE decides).
        qualifying.join(supplier, F.col("s_suppkey") == F.col("the_supp"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "late_shipment_priority_counts",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
)
def q_late_shipment_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-shaped EXISTS with a CROSS-TABLE inequality: orders
    having at least one line shipped >60 days after the order date,
    counted by priority. Decorrelates to a LEFT SEMI join on the order
    key with the inequality as a residual join predicate — one pass,
    no aggregation-then-join of the full lineitem, no per-row rescan
    (the correlated formulation's 100 TB killer). Counts are integer
    → bit-exact."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > F.date_add(orders["o_orderdate"], 60)),
        "leftsemi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@query(
    "cheapest_supplier_per_type",
    oracle="""
    WITH priced AS (
      SELECT p.p_type, l.l_suppkey,
             CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS price_u
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    )
    SELECT pr.p_type, s.s_name, n.n_name AS nation, pr.price_u AS best_price_u
    FROM priced pr
    JOIN supplier s ON pr.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE pr.price_u = (SELECT min(p2.price_u) FROM priced p2
                        WHERE p2.p_type = pr.p_type)
    QUALIFY row_number() OVER (PARTITION BY pr.p_type
                               ORDER BY s.s_name ASC, pr.l_suppkey ASC) = 1
    """,
)
def q_cheapest_supplier_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 SHAPE (minimum-cost supplier via correlated scalar-min
    subquery; this schema has no partsupp, so the offer table is the
    lineitem price book): for each part type, the supplier behind the
    MINIMUM discounted price, ties broken deterministically
    (s_name, suppkey). Decorrelation doctrine (module docstring): the
    per-type min is computed ONCE as a pre-aggregation and joined back
    on the correlation key — Catalyst sees a plain agg + equi-join
    where a naive planner would re-run the subquery per row; the
    winner-row cut is one per-type row_number over the tied minima
    (WindowGroupLimit — partial top-1 before the shuffle). Price
    arithmetic stays in exact integer micro-units end-to-end, so the
    tie SET (and hence the winner) is bit-stable at any parallelism."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    priced = li.join(part, li["l_partkey"] == part["p_partkey"]).select(
        "p_type",
        "l_suppkey",
        (_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias(
            "price_u"
        ),
    )
    # rename the agg's key: the min frame shares `priced`'s lineage and
    # Spark refuses the ambiguous attribute on a shared-name self-join
    best = (
        priced.groupBy("p_type")
        .agg(F.min("price_u").alias("best_u"))
        .withColumnRenamed("p_type", "_bt")
    )
    # no broadcast hint on `best`: #types-sized here, but derived from
    # an SF-scaling scan — let AQE decide from the measured size
    winners = priced.join(
        best,
        (priced["p_type"] == F.col("_bt"))
        & (priced["price_u"] == F.col("best_u")),
    ).select("p_type", "l_suppkey", "price_u")
    named = (
        winners.join(supp, winners["l_suppkey"] == supp["s_suppkey"])
        .join(nat, supp["s_nationkey"] == nat["n_nationkey"])
        .select("p_type", "s_name", F.col("n_name").alias("nation"),
                "l_suppkey", "price_u")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("p_type").orderBy(
        F.col("s_name").asc(), F.col("l_suppkey").asc()
    )
    return (
        named.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("p_type", "s_name", "nation",
                F.col("price_u").alias("best_price_u"))
    )


@query(
    "concentrated_suppliers",
    oracle="""
    WITH per AS (
      SELECT l_partkey, l_suppkey,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    tot AS (
      SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS total_qty,
             CAST(count(*) AS BIGINT) AS n_supp
      FROM per GROUP BY 1
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS n_dominated_parts
    FROM per JOIN tot USING (l_partkey)
    JOIN supplier s ON per.l_suppkey = s.s_suppkey
    WHERE tot.n_supp > 1 AND per.qty * n_supp > 2 * tot.total_qty
    GROUP BY 1
    """,
)
def q_concentrated_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 SHAPE (supplier qualification against a correlated
    quantity-sum threshold; availqty > ½·sum(l_quantity) in the
    original — here, with no partsupp, the threshold compares a
    supplier's shipped quantity of a part against TWICE the part's
    mean per-supplier quantity): suppliers counted by how many
    multi-supplier parts they dominate. Decorrelation doctrine: BOTH
    sides of the correlated comparison are pre-aggregations of the
    same per-(part, supplier) frame — one hash-agg feeding a per-part
    rollup, joined back on the correlation key; the comparison
    qty · n_supp > 2 · total stays in integer cross-multiplied form
    (no division), so the qualifying set is exact and the oracle
    replays it bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    per = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.round("l_quantity").cast("bigint")).alias("qty")
    )
    tot = per.groupBy("l_partkey").agg(
        F.sum("qty").alias("total_qty"), F.count(F.lit(1)).alias("n_supp")
    )
    dom = per.join(tot, "l_partkey").filter(
        (F.col("n_supp") > 1)
        & (F.col("qty") * F.col("n_supp") > 2 * F.col("total_qty"))
    )
    return (
        dom.join(supp, dom["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
    )
