"""Analytic operator suite over the TPC-H-ish star schema.

The reference implements NO relational operators (SURVEY.md §2.7) — joins,
sorts, top-k, grouping sets, distinct aggregates are exactly what the Spark
engine adds "for free" and must exercise at scale.  Each query here is an
operator-coverage probe with a DuckDB oracle twin:

- scan + filter + aggregate (pricing summary — pushdown/pruning showcase)
- 3-way and 6-way shuffle joins with selective filters (Catalyst join order)
- broadcast hash join on small dims (explicit broadcast hint)
- left-semi / left-anti joins (EXISTS / NOT EXISTS)
- window top-k per group (rank inside partition)
- ROLLUP grouping sets
- distinct aggregates
- outer-join + re-aggregation distribution

Scale posture: filters are written against raw columns (pushed to parquet),
dimension sides of joins stay broadcast-able, and no query collects more than
an aggregated result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_pekko_streams_example_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from pulsar_pekko_streams_example_spark.plans.registry import register
from pulsar_pekko_streams_example_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Q1-style pricing summary — scan + filter + wide aggregate
# ---------------------------------------------------------------------------
@register(
    "q1_pricing_summary",
    oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum('l_quantity')} AS sum_qty,
               {sql_dsum('l_extendedprice')} AS sum_base_price,
               {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
               {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
               {sql_davg('l_quantity')} AS avg_qty,
               {sql_davg('l_extendedprice')} AS avg_price,
               {sql_davg('l_discount')} AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """,
    doc="Pricing summary report: predicate pushdown to parquet + 8-aggregate "
    "hash agg; the flagship analytic scan shape.",
    tags=("tpch", "agg"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Q3-style shipping priority — 3-way join + top-k sort
# ---------------------------------------------------------------------------
@register(
    "q3_shipping_priority",
    oracle=f"""
        SELECT l.l_orderkey AS orderkey,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
               CAST(o.o_orderdate AS DATE) AS orderdate,
               o.o_orderpriority AS orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
        GROUP BY 1, 3, 4
        ORDER BY revenue DESC, orderkey
        LIMIT 10
        """,
    doc="Shipping priority: selective dim filter, two shuffle joins (customer "
    "side broadcast-able), aggregate, global top-10 sort with deterministic "
    "tiebreak.",
    tags=("tpch", "join", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o, l = (load_table(spark, sf_dir, t) for t in ("customer", "orders", "lineitem"))
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .filter(F.col("o_orderdate") < cutoff)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > cutoff)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("orderkey", "revenue", "orderdate", "orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5-style local supplier volume — 6-way join
# ---------------------------------------------------------------------------
@register(
    "q5_local_supplier_volume",
    oracle=f"""
        SELECT n.n_name AS nation,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY 1
        """,
    doc="Local supplier volume: 6-table join tree; region/nation/supplier are "
    "broadcast dims, the fact join shuffles once on orderkey.",
    tags=("tpch", "join"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o, l, s, n, r = (
        load_table(spark, sf_dir, t)
        for t in ("customer", "orders", "lineitem", "supplier", "nation", "region")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Window top-k per group
# ---------------------------------------------------------------------------
@register(
    "top3_parts_per_brand",
    oracle="""
        SELECT p_brand, p_partkey, p_retailprice, CAST(rnk AS BIGINT) AS rnk
        FROM (
          SELECT p_brand, p_partkey, p_retailprice,
                 ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rnk
          FROM part
        ) t WHERE rnk <= 3
        """,
    doc="Top-k per group: rank window inside partition — the §2.7 'sorts/limits/"
    "top-k' surface; scales as one shuffle on the partition key.",
    tags=("window", "topk"),
)
def top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        p.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "rnk")
    )


# ---------------------------------------------------------------------------
# ROLLUP grouping sets
# ---------------------------------------------------------------------------
@register(
    "rollup_order_priority",
    oracle=f"""
        SELECT COALESCE(o_orderstatus, 'ALL') AS orderstatus,
               COALESCE(o_orderpriority, 'ALL') AS orderpriority,
               COUNT(*) AS orders,
               {sql_dsum('o_totalprice')} AS total_price
        FROM orders
        GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        """,
    doc="ROLLUP grouping sets over orders (status → priority hierarchy) with "
    "labelled subtotal rows.",
    tags=("agg", "rollup"),
)
def rollup_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("orders"), dsum("o_totalprice").alias("total_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("orderstatus"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("orderpriority"),
            "orders",
            "total_price",
        )
    )


# ---------------------------------------------------------------------------
# Distinct aggregates
# ---------------------------------------------------------------------------
@register(
    "distinct_counts_per_flag",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_suppkey) AS suppliers,
               COUNT(DISTINCT l_partkey) AS parts,
               COUNT(DISTINCT l_orderkey) AS orders,
               COUNT(*) AS line_items
        FROM lineitem GROUP BY l_returnflag
        """,
    doc="Multi-column distinct aggregation (expand + two-phase agg in Spark).",
    tags=("agg",),
)
def distinct_counts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("suppliers"),
        F.countDistinct("l_partkey").alias("parts"),
        F.countDistinct("l_orderkey").alias("orders"),
        F.count(F.lit(1)).alias("line_items"),
    )


# ---------------------------------------------------------------------------
# Anti-join: customers with no orders
# ---------------------------------------------------------------------------
@register(
    "customers_without_orders",
    oracle="""
        SELECT c_mktsegment, COUNT(*) AS customers
        FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
        )
        GROUP BY c_mktsegment
        """,
    doc="Left-anti join (NOT EXISTS) — the L4 reconciliation shape on the star "
    "schema.  Restricted to urgent orders so the anti side is non-empty at "
    "every scale factor (every customer has some order in this data).",
    tags=("join", "anti"),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("customers"))
    )


# ---------------------------------------------------------------------------
# Semi-join with correlated inequality (Q4-style order priority check)
# ---------------------------------------------------------------------------
@register(
    "late_order_priority",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS orders
        FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
        )
        GROUP BY o_orderpriority
        """,
    doc="Left-semi join with correlated inequality predicate (EXISTS): orders "
    "having at least one line shipped after the order date.",
    tags=("join", "semi"),
)
def late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o, l = load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            l,
            (l.l_orderkey == o.o_orderkey) & (l.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("orders"))
    )


# ---------------------------------------------------------------------------
# Broadcast hash join on a small dimension
# ---------------------------------------------------------------------------
@register(
    "brand_revenue",
    oracle=f"""
        SELECT p.p_brand,
               {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
               COUNT(*) AS line_items
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
        """,
    doc="Fact⨝dim with explicit broadcast hint — at 100 TB `part` stays far "
    "below the broadcast threshold relative to lineitem; no fact shuffle "
    "for the join (only for the final small agg).",
    tags=("join", "broadcast"),
)
def brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    l, p = load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("line_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q13-style distribution: outer join + re-aggregation
# ---------------------------------------------------------------------------
@register(
    "customer_order_distribution",
    oracle="""
        SELECT order_count, COUNT(*) AS customers
        FROM (
          SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_count
          FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
          GROUP BY c.c_custkey
        ) t
        GROUP BY order_count
        """,
    doc="Left-outer join + double aggregation (orders-per-customer histogram).",
    tags=("join", "agg"),
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c, o = load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count(o.o_orderkey).alias("order_count"))
    )
    return per_cust.groupBy("order_count").agg(F.count(F.lit(1)).alias("customers"))


# ---------------------------------------------------------------------------
# Scalar global aggregate (min/max/count over dates)
# ---------------------------------------------------------------------------
@register(
    "order_date_bounds",
    oracle="""
        SELECT CAST(MIN(o_orderdate) AS DATE) AS first_order,
               CAST(MAX(o_orderdate) AS DATE) AS last_order,
               COUNT(*) AS orders,
               COUNT(DISTINCT o_custkey) AS customers
        FROM orders
        """,
    doc="Global scalar aggregate — partial-agg/combine shape, no group keys.",
    tags=("agg",),
)
def order_date_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.min("o_orderdate").cast("date").alias("first_order"),
        F.max("o_orderdate").cast("date").alias("last_order"),
        F.count(F.lit(1)).alias("orders"),
        F.countDistinct("o_custkey").alias("customers"),
    )


# ---------------------------------------------------------------------------
# Ranking windows: customer spend deciles (ntile + percent_rank)
# ---------------------------------------------------------------------------
@register(
    "customer_spend_deciles",
    oracle="""
        WITH spend AS (
          SELECT o_custkey, CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS spend
          FROM orders GROUP BY o_custkey
        ),
        ranked AS (
          SELECT o_custkey, spend,
                 ntile(10) OVER (ORDER BY spend, o_custkey) AS decile
          FROM spend
        )
        SELECT CAST(decile AS INT) AS decile,
               COUNT(*) AS customers,
               CAST(MIN(spend) AS DOUBLE) AS min_spend,
               CAST(MAX(spend) AS DOUBLE) AS max_spend
        FROM ranked GROUP BY decile
        """,
    doc="ntile decile ranking over per-customer spend (deterministic "
    "tie-break on custkey so both engines bucket identically); the "
    "global-sort window is the one shape that cannot shard — at 100 TB "
    "swap ntile for approx percentile boundaries + a broadcast bucket join.",
    tags=("window", "rank"),
)
def customer_spend_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from pulsar_pekko_streams_example_spark.functions.numeric import dsum

    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(dsum("o_totalprice").alias("spend"))
    w = Window.orderBy(F.col("spend").asc(), F.col("o_custkey").asc())
    ranked = spend.withColumn("decile", F.ntile(10).over(w).cast("int"))
    return ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("customers"),
        F.min("spend").alias("min_spend"),
        F.max("spend").alias("max_spend"),
    )


# ---------------------------------------------------------------------------
# Set operators: EXCEPT ALL / INTERSECT on key sets
# ---------------------------------------------------------------------------
@register(
    "custkey_set_ops",
    oracle="""
        WITH with_orders AS (SELECT DISTINCT o_custkey AS k FROM orders),
        building AS (SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
        only_ordered AS (SELECT k FROM with_orders EXCEPT SELECT k FROM building),
        both_sets AS (SELECT k FROM with_orders INTERSECT SELECT k FROM building)
        SELECT (SELECT COUNT(*) FROM only_ordered) AS ordered_not_building,
               (SELECT COUNT(*) FROM both_sets) AS ordered_and_building
        """,
    doc="EXCEPT / INTERSECT set semantics (the L4 reconciliation diff as a "
    "first-class operator, part4/WorkloadManagementService.scala:44-50): "
    "Spark plans both as hash joins (left-anti / left-semi) after distinct.",
    tags=("setop",),
)
def custkey_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    with_orders = o.select(F.col("o_custkey").alias("k")).distinct()
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("k")
    )
    only_ordered = with_orders.exceptAll(building).agg(
        F.count(F.lit(1)).alias("ordered_not_building")
    )
    both_sets = with_orders.intersect(building).agg(
        F.count(F.lit(1)).alias("ordered_and_building")
    )
    # one plan, no driver-side counts: two scalar aggregates cross-joined
    return only_ordered.crossJoin(both_sets)


# ---------------------------------------------------------------------------
# Correlated scalar aggregate: parts priced above their brand's average
# ---------------------------------------------------------------------------
@register(
    "parts_above_brand_avg",
    oracle=f"""
        WITH pa AS (
          SELECT p_brand, p_retailprice,
                 CAST(SUM(CAST(p_retailprice AS DECIMAL(38,6)))
                        OVER (PARTITION BY p_brand) AS DOUBLE)
                   / COUNT(p_retailprice) OVER (PARTITION BY p_brand) AS brand_avg
          FROM part
        )
        SELECT p_brand, COUNT(*) AS above_avg_parts
        FROM pa WHERE p_retailprice > brand_avg
        GROUP BY p_brand
        """,
    doc="Correlated scalar aggregate (price > per-brand average) decorrelated "
    "into a single window pass — one shuffle on brand instead of a "
    "re-aggregating self-join.",
    tags=("window", "subquery"),
)
def parts_above_brand_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand")
    pa = p.withColumn(
        "brand_avg",
        (F.sum(F.col("p_retailprice").cast("decimal(38,6)")).over(w).cast("double"))
        / F.count("p_retailprice").over(w),
    )
    return (
        pa.filter(F.col("p_retailprice") > F.col("brand_avg"))
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("above_avg_parts"))
    )
