"""Engine-diagnostic queries: the statistics an engine collects about the
DATA to plan well — join-key skew reports, ANALYZE-style column profiles,
space-filling-curve layout audits.

The reference has no planner (flow control only — SURVEY.md §4.1); these are
the introspection operators a Spark deployment runs before committing a
100 TB job: the skew report decides salting, the profile feeds CBO-style
sizing, the Z-order audit validates a multi-dimensional layout before an
expensive rewrite.  All arithmetic is integer-exact; the only doubles are
single final divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_pekko_streams_example_spark.plans.registry import register
from pulsar_pekko_streams_example_spark.sources.tables import load_table

SKEW_TOP_K = 10


# ---------------------------------------------------------------------------
# Join-key skew report — the pre-flight check that decides salting
# ---------------------------------------------------------------------------
@register(
    "join_key_skew_report",
    oracle=f"""
        WITH per_key AS (
          SELECT o_custkey AS join_key, COUNT(*) AS key_rows
          FROM orders GROUP BY o_custkey
        ),
        tot AS (SELECT SUM(key_rows) AS total_rows FROM per_key)
        SELECT p.join_key, p.key_rows,
               CAST((1000 * p.key_rows) // t.total_rows AS BIGINT) AS permille_of_total
        FROM per_key p CROSS JOIN tot t
        ORDER BY p.key_rows DESC, p.join_key
        LIMIT {SKEW_TOP_K}
        """,
    doc="Join-key skew report for orders.o_custkey: the top-{k} hottest keys "
    "with row counts and integer-permille share — the pre-flight diagnostic "
    "that decides whether a join needs salting (operators/partitioning."
    "salted_join) or can rely on AQE skew splitting.  Two map-side-"
    "combinable aggregations; the top-k is a TakeOrdered (per-partition "
    "heads merged on the driver), never a global single-partition sort; "
    "the total is a broadcast 1-row scalar.",
    tags=("statistics", "skew", "topk", "added-r3"),
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    per_key = o.groupBy(F.col("o_custkey").alias("join_key")).agg(
        F.count(F.lit(1)).alias("key_rows")
    )
    tot = per_key.agg(F.sum("key_rows").alias("total_rows"))
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "join_key",
            "key_rows",
            F.expr("CAST((1000 * key_rows) div total_rows AS LONG)").alias(
                "permille_of_total"
            ),
        )
        .orderBy(F.desc("key_rows"), F.asc("join_key"))
        .limit(SKEW_TOP_K)
    )


# ---------------------------------------------------------------------------
# ANALYZE-style column profile — CBO sizing inputs as a queryable table
# ---------------------------------------------------------------------------
# Total cents profile cell (cf. analytic_queries._YOY_CENTS): NULL/NaN prices
# profile as NULL, and |price| beyond 1e12 clamps to the ±1e14-cent envelope
# instead of aborting the int64 cast (DuckDB errors on 1e35·100 -> BIGINT;
# floor saturation differs per engine) — round-7 sweep finding.  A clamped
# min/max is the honest profile of a poisoned column: the real bound is
# "beyond the envelope", not a crash.  Identical CASE text in both dialects.
_PROFILE_CENTS = (
    "CASE WHEN o_totalprice IS NULL OR isnan(o_totalprice) "
    "THEN CAST(NULL AS BIGINT) "
    "WHEN o_totalprice > 1000000000000.0 THEN CAST(100000000000000 AS BIGINT) "
    "WHEN o_totalprice < -1000000000000.0 THEN CAST(-100000000000000 AS BIGINT) "
    "ELSE CAST(floor(o_totalprice * CAST(100 AS DOUBLE)) AS BIGINT) END"
)


@register(
    "orders_column_profile",
    oracle=f"""
        WITH base AS (
          SELECT o_orderkey, o_custkey, o_orderdate, o_orderpriority,
                 {_PROFILE_CENTS} AS price_cents
          FROM orders
        ),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS d_orderkey,
                 CAST(MIN(o_orderkey) AS VARCHAR) AS lo_orderkey,
                 CAST(MAX(o_orderkey) AS VARCHAR) AS hi_orderkey,
                 CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS d_custkey,
                 CAST(MIN(o_custkey) AS VARCHAR) AS lo_custkey,
                 CAST(MAX(o_custkey) AS VARCHAR) AS hi_custkey,
                 CAST(COUNT(DISTINCT o_orderdate) AS BIGINT) AS d_orderdate,
                 CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR) AS lo_orderdate,
                 CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR) AS hi_orderdate,
                 CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS d_priority,
                 CAST(MIN(o_orderpriority) AS VARCHAR) AS lo_priority,
                 CAST(MAX(o_orderpriority) AS VARCHAR) AS hi_priority,
                 CAST(COUNT(DISTINCT price_cents) AS BIGINT) AS d_price,
                 CAST(MIN(price_cents) AS VARCHAR) AS lo_price,
                 CAST(MAX(price_cents) AS VARCHAR) AS hi_price
          FROM base
        )
        SELECT 'o_orderkey' AS column_name, n_rows, d_orderkey AS n_distinct,
               lo_orderkey AS min_repr, hi_orderkey AS max_repr FROM agg
        UNION ALL SELECT 'o_custkey', n_rows, d_custkey, lo_custkey, hi_custkey FROM agg
        UNION ALL SELECT 'o_orderdate', n_rows, d_orderdate, lo_orderdate, hi_orderdate FROM agg
        UNION ALL SELECT 'o_orderpriority', n_rows, d_priority, lo_priority, hi_priority FROM agg
        UNION ALL SELECT 'o_totalprice_cents', n_rows, d_price, lo_price, hi_price FROM agg
        """,
    doc="ANALYZE-style column profile of the orders table — row count, "
    "distinct count, and min/max per column, published as one queryable "
    "row per column (the sizing inputs a cost-based optimizer feeds on).  "
    "All profiled columns aggregate in ONE pass over one scan; the five "
    "output rows unstack from a single scalar aggregate row.  Doubles "
    "profile as integer cents (double->string formatting is not portable "
    "across engines; integer and ISO-date casts are).  At 100 TB each "
    "COUNT(DISTINCT) expands to its own partial-aggregation tree — "
    "bounded state, no row ever leaves the scan unaggregated.",
    tags=("statistics", "profile", "added-r3"),
)
def orders_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        "o_orderpriority",
        F.expr(_PROFILE_CENTS).alias("price_cents"),
    )
    agg = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_orderkey").alias("d_orderkey"),
        F.min("o_orderkey").cast("string").alias("lo_orderkey"),
        F.max("o_orderkey").cast("string").alias("hi_orderkey"),
        F.countDistinct("o_custkey").alias("d_custkey"),
        F.min("o_custkey").cast("string").alias("lo_custkey"),
        F.max("o_custkey").cast("string").alias("hi_custkey"),
        F.countDistinct("o_orderdate").alias("d_orderdate"),
        F.min("o_orderdate").cast("date").cast("string").alias("lo_orderdate"),
        F.max("o_orderdate").cast("date").cast("string").alias("hi_orderdate"),
        F.countDistinct("o_orderpriority").alias("d_priority"),
        F.min("o_orderpriority").cast("string").alias("lo_priority"),
        F.max("o_orderpriority").cast("string").alias("hi_priority"),
        F.countDistinct("price_cents").alias("d_price"),
        F.min("price_cents").cast("string").alias("lo_price"),
        F.max("price_cents").cast("string").alias("hi_price"),
    )
    return agg.select(
        F.expr(
            "stack(5, "
            "'o_orderkey', n_rows, d_orderkey, lo_orderkey, hi_orderkey, "
            "'o_custkey', n_rows, d_custkey, lo_custkey, hi_custkey, "
            "'o_orderdate', n_rows, d_orderdate, lo_orderdate, hi_orderdate, "
            "'o_orderpriority', n_rows, d_priority, lo_priority, hi_priority, "
            "'o_totalprice_cents', n_rows, d_price, lo_price, hi_price) "
            "AS (column_name, n_rows, n_distinct, min_repr, max_repr)"
        )
    )


# ---------------------------------------------------------------------------
# Z-order layout audit — occupancy balance of an interleaved-bit bucketing
# ---------------------------------------------------------------------------
ZORDER_BITS = 8  # 8 bits per dimension -> 16-bit z-value -> 256 top buckets


def _zvalue_expr(x: str, y: str, dialect: str) -> str:
    """Interleave the low ZORDER_BITS bits of two non-negative ints: bit b of
    ``x`` lands at position 2b, bit b of ``y`` at 2b+1.  Pure integer
    shift/mask arithmetic, identical in both engines."""
    if dialect == "spark":
        terms = [
            f"shiftleft(shiftright({x}, {b}) & 1, {2 * b})" for b in range(ZORDER_BITS)
        ] + [
            f"shiftleft(shiftright({y}, {b}) & 1, {2 * b + 1})"
            for b in range(ZORDER_BITS)
        ]
    else:
        terms = [f"((({x} >> {b}) & 1) << {2 * b})" for b in range(ZORDER_BITS)] + [
            f"((({y} >> {b}) & 1) << {2 * b + 1})" for b in range(ZORDER_BITS)
        ]
    return " + ".join(terms)


def _occupancy_bucket_case(col: str) -> str:
    whens = " ".join(f"WHEN {col} <= {1 << k} THEN {k}" for k in range(13))
    return f"CASE {whens} ELSE 13 END"


@register(
    "zorder_layout_stats",
    oracle=f"""
        WITH dims AS (
          SELECT (o_custkey % {1 << ZORDER_BITS}) AS x,
                 ((epoch_us(o_orderdate) // 86400000000) % {1 << ZORDER_BITS}) AS y
          FROM orders
        ),
        z AS (SELECT {_zvalue_expr('x', 'y', 'duckdb')} AS zval FROM dims),
        occ AS (
          SELECT zval >> {ZORDER_BITS} AS zbucket, COUNT(*) AS bucket_rows
          FROM z GROUP BY 1
        )
        SELECT {_occupancy_bucket_case('bucket_rows')} AS occupancy_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(SUM(bucket_rows) AS BIGINT) AS n_rows
        FROM occ GROUP BY 1
        """,
    doc="Z-order (Morton-curve) layout audit: interleave the low 8 bits of "
    "(o_custkey, orderdate-day) into a 16-bit z-value, bucket by its high "
    "8 bits, and report bucket-occupancy counts in power-of-two bins — "
    "the balance check run BEFORE committing a multi-dimensional "
    "Z-order rewrite of a 100 TB table (balanced occupancy => both "
    "dimensions prune; one fat bucket => the interleave wastes a "
    "dimension).  Bit interleaving is pure shift/mask integer arithmetic "
    "(identical cross-engine); two hash aggregations; output <= 14 rows.",
    tags=("statistics", "layout", "added-r3"),
)
def zorder_layout_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    dims = o.select(
        F.expr(f"o_custkey % {1 << ZORDER_BITS}").alias("x"),
        F.expr(
            f"(unix_micros(cast(o_orderdate AS TIMESTAMP)) div 86400000000) % {1 << ZORDER_BITS}"
        ).alias("y"),
    )
    z = dims.select(F.expr(_zvalue_expr("x", "y", "spark")).alias("zval"))
    occ = z.select(F.expr(f"zval div {1 << ZORDER_BITS}").alias("zbucket")).groupBy(
        "zbucket"
    ).agg(F.count(F.lit(1)).alias("bucket_rows"))
    return occ.groupBy(
        F.expr(_occupancy_bucket_case("bucket_rows")).alias("occupancy_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("bucket_rows").alias("n_rows"),
    )
