"""Advanced analytic-window queries: RANGE frames, sliding event-time
windows, distribution-based anomaly flags, arbitrary GROUPING SETS.

The reference's only windows are wall-clock metric gauges sampled on fixed
schedules (part2/MessageProcessor.scala:35-40, part3/PermittedTaskExecutor
.scala:181-187); a declarative engine owes its users the full window-frame
surface.  Everything here is one partitioning + one pass — no self-joins for
rolling math, no per-row subqueries for z-scores.

Scale posture: RANGE frames and sliding windows shuffle once on their
partition keys; the anomaly query broadcasts a per-group scalar table (one
row per event_type) back onto the fact scan; grouping sets expand inside a
single shuffle (Expand operator), not one aggregation pass per set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_pekko_streams_example_spark.functions.numeric import (
    DEC,
    davg,
    dcast,
    dsum,
    sql_davg,
    sql_dcast,
    sql_dsum,
)
from pulsar_pekko_streams_example_spark.plans.registry import register
from pulsar_pekko_streams_example_spark.sources.tables import load_table

DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# RANGE-frame rolling aggregation: trailing-7-day revenue per customer
# ---------------------------------------------------------------------------
@register(
    "rolling_revenue_7d",
    oracle=f"""
        WITH o AS (
          SELECT o_orderkey, o_custkey,
                 epoch_us(o_orderdate) // {DAY_US} AS day,
                 o_totalprice
          FROM orders
        )
        SELECT o_orderkey, o_custkey, day,
               CAST(SUM({sql_dcast('o_totalprice')}) OVER w AS DOUBLE) AS rev_7d,
               COUNT(*) OVER w AS orders_7d
        FROM o
        WINDOW w AS (PARTITION BY o_custkey ORDER BY day
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        """,
    doc="RANGE-frame window (value-based, not row-count-based): for every "
    "order, the customer's trailing-7-day revenue and order count.  RANGE "
    "frames are tie-safe — same-day peer rows always aggregate together, so "
    "the result is deterministic under any execution order, unlike a ROWS "
    "frame over a non-unique sort key.  One shuffle on o_custkey; decimal "
    "window accumulation keeps the doubles engine-exact.",
    tags=("window", "range-frame"),
)
def rolling_revenue_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        # o_orderdate arrives as TIMESTAMP (LTZ) — prepare_session disables
        # inferTimestampNTZ and pins the session tz to UTC — so unix_micros
        # is exact epoch arithmetic directly on the column.
        F.expr(f"unix_micros(o_orderdate) div {DAY_US}").alias("day"),
        "o_totalprice",
    )
    w = Window.partitionBy("o_custkey").orderBy("day").rangeBetween(-6, 0)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "day",
        # dcast: one 1e35 garbage price must not abort the window job
        F.sum(dcast(F.col("o_totalprice"))).over(w).cast("double").alias("rev_7d"),
        F.count(F.lit(1)).over(w).alias("orders_7d"),
    )


# ---------------------------------------------------------------------------
# Sliding event-time windows: 1-hour windows every 15 minutes
# ---------------------------------------------------------------------------
@register(
    "sliding_window_activity",
    oracle=f"""
        SELECT (epoch_us(ts) // 900000000 - k) * 900000000 AS ws_us,
               event_type,
               COUNT(*) AS events,
               {sql_dsum('value')} AS volume
        FROM events, (SELECT unnest(range(4)) AS k) slots
        WHERE ts IS NOT NULL  -- F.window drops timeless rows; mirror it
        GROUP BY 1, 2
        """,
    doc="Sliding event-time windows — F.window(ts, '1 hour', '15 minutes'): "
    "each event lands in exactly 4 overlapping windows (the streaming twin is "
    "the same expression under readStream + watermark).  The oracle "
    "reconstructs Spark's epoch-aligned window-start arithmetic explicitly "
    "(slot k back-offsets of the 15-min grid).  Window starts are compared "
    "as integer epoch-micros, never engine-local timestamps.",
    tags=("window", "sliding", "event-time"),
)
def sliding_window_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("events"), dsum("value").alias("volume"))
        .select(
            F.unix_micros("w.start").alias("ws_us"),
            "event_type",
            "events",
            "volume",
        )
    )


# ---------------------------------------------------------------------------
# Distribution-based anomaly detection: 3-sigma outliers per event_type
# ---------------------------------------------------------------------------
@register(
    "zscore_anomalies",
    oracle=f"""
        WITH stats AS (
          SELECT event_type,
                 COUNT(value) AS n,
                 {sql_dsum('value')} AS s1,
                 {sql_dsum('value * value')} AS s2
          FROM events GROUP BY event_type
        ),
        scored AS (
          SELECT s.event_type, s.n,
                 s.s1 / CAST(s.n AS DOUBLE) AS mean,
                 (CAST(s.n AS DOUBLE) * s.s2 - s.s1 * s.s1)
                   / (CAST(s.n AS DOUBLE) * CAST(GREATEST(s.n - 1, 1) AS DOUBLE))
                   AS variance,
                 e.value
          FROM events e JOIN stats s ON e.event_type = s.event_type
        )
        SELECT event_type, n, mean, variance,
               CAST(SUM(CASE WHEN (value - mean) * (value - mean)
                                  > 9.0 * variance THEN 1 ELSE 0 END) AS BIGINT)
                 AS anomalies
        FROM scored GROUP BY event_type, n, mean, variance
        """,
    doc="Two-pass anomaly flagging: per-type mean/variance from decimal-exact "
    "moment sums (n, Σx, Σx²), broadcast back onto the fact scan, count rows "
    "beyond 3σ ((x-μ)² > 9σ² — no sqrt needed).  The moment sums make "
    "variance associative and engine-exact; every subsequent double op is "
    "written in the same order in both dialects, so even the derived mean/"
    "variance hash-match bit-for-bit.  At 100 TB the stats table is one row "
    "per group — always broadcast, never a shuffle of the facts.",
    tags=("window", "statistics", "anomaly"),
)
def zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.count("value").alias("n"),
        dsum("value").alias("s1"),
        dsum(F.col("value") * F.col("value")).alias("s2"),
    )
    nd = F.col("n").cast("double")
    stats = stats.select(
        "event_type",
        "n",
        (F.col("s1") / nd).alias("mean"),
        # GREATEST(n-1, 1): a single-row group has zero sample variance, not
        # a division error (ANSI doubles raise on /0; the n=1 numerator is 0)
        (
            (nd * F.col("s2") - F.col("s1") * F.col("s1"))
            / (nd * F.greatest(F.col("n") - 1, F.lit(1)).cast("double"))
        ).alias("variance"),
    )
    scored = ev.join(F.broadcast(stats), "event_type")
    dev = F.col("value") - F.col("mean")
    return scored.groupBy("event_type", "n", "mean", "variance").agg(
        F.sum(F.when(dev * dev > F.lit(9.0) * F.col("variance"), 1).otherwise(0))
        .cast("bigint")
        .alias("anomalies")
    )


# ---------------------------------------------------------------------------
# Arbitrary GROUPING SETS (beyond CUBE/ROLLUP): nation × order-priority
# ---------------------------------------------------------------------------
@register(
    "grouping_sets_revenue",
    oracle=f"""
        SELECT n_name, o_orderpriority,
               CAST(GROUPING(n_name) AS INT) AS g_nation,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
               COUNT(*) AS orders,
               {sql_dsum('o_totalprice')} AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name),
                                (o_orderpriority), ())
        """,
    doc="Arbitrary GROUPING SETS via DataFrame.groupingSets — all four "
    "aggregation granularities from ONE shuffle (Catalyst's Expand operator "
    "replicates rows per set; no union of four scans).  GROUPING() flags "
    "disambiguate 'NULL because rolled up' from a genuinely null key.  "
    "Completes the grouping-analytics family next to cube_event_stats and "
    "rollup_order_priority.",
    tags=("aggregation", "grouping-sets"),
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = orders.join(
        customer, F.col("o_custkey") == F.col("c_custkey")
    ).join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
    return joined.groupingSets(
        [["n_name", "o_orderpriority"], ["n_name"], ["o_orderpriority"], []],
        "n_name",
        "o_orderpriority",
    ).agg(
        F.grouping("n_name").cast("int").alias("g_nation"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count(F.lit(1)).alias("orders"),
        dsum("o_totalprice").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Relative-rank windows: percent_rank / cume_dist over the global price order
# ---------------------------------------------------------------------------
@register(
    "priority_price_rank_stats",
    oracle="""
        WITH ranked AS (
          SELECT o_orderpriority,
                 percent_rank() OVER w AS pr,
                 cume_dist() OVER w AS cd
          FROM orders
          WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
        )
        SELECT o_orderpriority,
               COUNT(*) AS orders,
               (CAST(SUM(TRY_CAST(CASE WHEN isfinite(CAST((pr) AS DOUBLE)) THEN (CASE WHEN abs(CAST((pr) AS DOUBLE)) < 9000000000.0 THEN floor(CAST((pr) AS DOUBLE) * 1e6 + 0.5) / 1e6 ELSE CAST((pr) AS DOUBLE) END) END AS DECIMAL(38,6))) AS DOUBLE) / COUNT(pr)) AS avg_percent_rank,
               (CAST(SUM(TRY_CAST(CASE WHEN isfinite(CAST((cd) AS DOUBLE)) THEN (CASE WHEN abs(CAST((cd) AS DOUBLE)) < 9000000000.0 THEN floor(CAST((cd) AS DOUBLE) * 1e6 + 0.5) / 1e6 ELSE CAST((cd) AS DOUBLE) END) END AS DECIMAL(38,6))) AS DOUBLE) / COUNT(cd)) AS avg_cume_dist
        FROM ranked GROUP BY o_orderpriority
        """,
    doc="Relative-rank window functions (percent_rank, cume_dist) over the "
    "global price order with a unique tie-break, rolled up per priority "
    "class — 'do urgent orders skew expensive?'.  Both functions derive from "
    "integer rank/count, so per-row doubles are engine-identical; the rollup "
    "uses decimal-exact averaging.  An unpartitioned window is a global sort "
    "— at 100 TB swap in approx-quantile bucketing (customer_spend_deciles "
    "documents the same trade-off for ntile).",
    tags=("window", "rank", "exact-audit"),
)
def priority_price_rank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    ranked = orders.select(
        "o_orderpriority",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    from pulsar_pekko_streams_example_spark.functions.numeric import davg

    return ranked.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("orders"),
        davg("pr").alias("avg_percent_rank"),
        davg("cd").alias("avg_cume_dist"),
    )


# Scale-safe variant of priority_price_rank_stats: histogram-bucketed
# relative ranks instead of a global-sort window.
_RANK_BINS = 256


@register(
    "priority_price_rank_approx",
    oracle=f"""
        WITH o AS (
          -- finite prices only: a NaN/Inf price carries no rank signal and
          -- poisons the min/max bin calibration (DuckDB's INT cast errors on
          -- NaN where Spark's floor saturates; MIN/MAX NaN ordering also
          -- diverges) — round-7 sweep finding.  NULL fails the guard too.
          SELECT o_orderpriority, CAST(o_totalprice AS DOUBLE) AS price
          FROM orders
          WHERE NOT isnan(CAST(o_totalprice AS DOUBLE))
            AND abs(CAST(o_totalprice AS DOUBLE)) < CAST('Infinity' AS DOUBLE)
        ),
        stats AS (SELECT MIN(price) AS mn, MAX(price) AS mx, COUNT(*) AS n FROM o),
        binned AS (
          SELECT o_orderpriority,
                 CASE WHEN mx = mn THEN 0
                      ELSE LEAST({_RANK_BINS - 1},
                                 CAST(FLOOR((price - mn) * {_RANK_BINS}.0 / (mx - mn)) AS INT))
                 END AS bin
          FROM o, stats
        ),
        hist AS (SELECT bin, COUNT(*) AS cnt FROM binned GROUP BY bin),
        cum AS (
          SELECT h.bin, h.cnt, COALESCE(SUM(h2.cnt), 0) AS cum_before
          FROM hist h LEFT JOIN hist h2 ON h2.bin < h.bin GROUP BY h.bin, h.cnt
        ),
        pb AS (
          SELECT o_orderpriority, bin, COUNT(*) AS cnt_pb
          FROM binned GROUP BY o_orderpriority, bin
        )
        SELECT pb.o_orderpriority,
               CAST(SUM(pb.cnt_pb) AS BIGINT) AS orders,
               CAST(SUM(pb.cnt_pb * c.cum_before) AS DOUBLE)
                 / (CAST(SUM(pb.cnt_pb) AS DOUBLE) * GREATEST(n - 1, 1)) AS avg_percent_rank,
               CAST(SUM(pb.cnt_pb * (c.cum_before + c.cnt)) AS DOUBLE)
                 / (CAST(SUM(pb.cnt_pb) AS DOUBLE) * n) AS avg_cume_dist
        FROM pb JOIN cum c ON pb.bin = c.bin, stats
        GROUP BY pb.o_orderpriority, n
        """,
    doc="Scale path for relative-rank rollups (the fix "
    "priority_price_rank_stats' doc names): prices bucket into a 256-bin "
    "fixed-width histogram; a row's percent_rank is approximated by its "
    "bin's cumulative-below count / (n-1) and cume_dist by cumulative-"
    "through / n, then rolled up per priority as exact integer sums with "
    "one final double division — NO single-partition window, every stage "
    "shards.  All arithmetic is engine-portable, so the oracle is exact.",
    tags=("window", "rank", "approx", "scale-variant", "scale-default"),
)
def priority_price_rank_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderpriority", F.col("o_totalprice").cast("double").alias("price")
    ).filter(
        # finite prices only — the oracle's guard twin (NULL fails it too)
        F.expr("NOT isnan(price) AND abs(price) < CAST('Infinity' AS DOUBLE)")
    )
    stats = o.agg(
        F.min("price").alias("mn"),
        F.max("price").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    binned = o.join(F.broadcast(stats)).select(
        "o_orderpriority",
        F.expr(
            f"CASE WHEN mx = mn THEN 0 ELSE LEAST({_RANK_BINS - 1}, "
            f"CAST(FLOOR((price - mn) * {_RANK_BINS}.0 / (mx - mn)) AS INT)) END"
        ).alias("bin"),
    )
    hist = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))
    h2 = hist.select(F.col("bin").alias("bin2"), F.col("cnt").alias("cnt2"))
    cum = (
        hist.join(F.broadcast(h2), F.col("bin2") < F.col("bin"), "left")
        .groupBy("bin", "cnt")
        .agg(F.coalesce(F.sum("cnt2"), F.lit(0)).alias("cum_before"))
    )
    pb = binned.groupBy("o_orderpriority", "bin").agg(
        F.count(F.lit(1)).alias("cnt_pb")
    )
    joined = pb.join(F.broadcast(cum), "bin").join(F.broadcast(stats.select("n")))
    return joined.groupBy("o_orderpriority", "n").agg(
        F.sum("cnt_pb").alias("orders"),
        (
            # GREATEST(n-1, 1): a 1-row table must yield percent_rank 0 (the
            # percent_rank() convention), not x/0 — engines disagree on 0/0.
            F.sum(F.col("cnt_pb") * F.col("cum_before")).cast("double")
            / (F.sum("cnt_pb").cast("double") * F.greatest(F.col("n") - F.lit(1), F.lit(1)))
        ).alias("avg_percent_rank"),
        (
            F.sum(F.col("cnt_pb") * (F.col("cum_before") + F.col("cnt"))).cast("double")
            / (F.sum("cnt_pb").cast("double") * F.col("n"))
        ).alias("avg_cume_dist"),
    ).drop("n")


# ---------------------------------------------------------------------------
# Watermark late-data accounting: which events would a 10-min watermark drop?
# ---------------------------------------------------------------------------
WATERMARK_US = 600_000_000  # 10 minutes


@register(
    "late_data_accounting",
    oracle=f"""
        WITH arr AS (
          SELECT event_type, epoch_us(ts) AS ts_us,
                 MAX(epoch_us(ts)) OVER (ORDER BY epoch_us(ts)
                                   + ((event_id * 2654435761) % 1000003 % 1800) * 1000000,
                                 event_id
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS max_seen_us
          FROM events
        )
        SELECT event_type,
               COUNT(*) AS events,
               CAST(SUM(CASE WHEN ts_us < max_seen_us - {WATERMARK_US}
                             THEN 1 ELSE 0 END) AS BIGINT) AS late_events,
               CAST((SUM(CASE WHEN ts_us < max_seen_us - {WATERMARK_US}
                              THEN 1 ELSE 0 END) * 1000) // COUNT(*) AS BIGINT)
                 AS late_permille
        FROM arr GROUP BY event_type
        """,
    doc="The engine's late-data policy, made queryable: replay the stream in "
    "arrival order (the driver's synthetic stream arrives time-sorted, so "
    "delivery is simulated with a deterministic 0-30min per-event delay — "
    "density-independent, so the late fraction stays non-degenerate at "
    "every scale factor) and flag every event whose event time trails "
    "the running max-seen event time by more than the 10-minute watermark — "
    "exactly the rows withWatermark('ts','10 minutes') would drop "
    "(test_watermark_windowed_aggregation drives the live behavior; this is "
    "its corpus-wide accounting twin for choosing a watermark).  The global "
    "running max is a single-partition window here; at scale compute "
    "per-partition maxima and take the MIN across partitions — precisely "
    "Spark's own global-watermark mechanism — before the flag pass.",
    tags=("event-time", "watermark", "window"),
)
def late_data_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.orderBy(
        F.expr("unix_micros(ts) + ((event_id * 2654435761) % 1000003 % 1800) * 1000000"),
        "event_id",
    ).rowsBetween(Window.unboundedPreceding, -1)
    arr = ev.select(
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.max(F.unix_micros("ts")).over(w).alias("max_seen_us"),
    )
    late = F.when(F.col("ts_us") < F.col("max_seen_us") - WATERMARK_US, 1).otherwise(0)
    return arr.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("events"),
        F.sum(late).cast("bigint").alias("late_events"),
        F.expr(
            f"CAST((SUM(CASE WHEN ts_us < max_seen_us - {WATERMARK_US} "
            "THEN 1 ELSE 0 END) * 1000) div COUNT(*) AS BIGINT)"
        ).alias("late_permille"),
    )


# ---------------------------------------------------------------------------
# Incremental aggregation: frozen history + fresh tail, result-neutral
# ---------------------------------------------------------------------------
INCR_CUTOFF = "1999-01-01"


@register(
    "incremental_daily_revenue",
    oracle=f"""
        SELECT epoch_us(o_orderdate) // {DAY_US} AS day,
               COUNT(*) AS n_orders,
               {sql_dsum('o_totalprice')} AS revenue
        FROM orders GROUP BY 1
        """,
    doc="Incremental-recompute shape: history before the cutoff aggregates "
    "separately from the fresh tail and the per-day partials union — "
    "identical to the full recompute (the oracle IS the plain full "
    "aggregation; day buckets never straddle the cutoff).  At 100 TB the "
    "frozen branch is a materialized snapshot read, the fresh branch scans "
    "only the tail partition — the daily run reprocesses days, not years; "
    "decimal-exact partials make frozen+fresh bit-equal to the full run.",
    tags=("incremental", "aggregation"),
)
def incremental_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    day = F.expr(f"unix_micros(cast(o_orderdate as timestamp)) div {DAY_US}").alias("day")

    def daily(part: DataFrame) -> DataFrame:
        return part.select(day, "o_totalprice").groupBy("day").agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )

    # p and NOT p do NOT partition the table under three-valued logic: a
    # NULL o_orderdate makes both filters NULL and the row would vanish
    # from BOTH branches while the full recompute keeps it (day NULL) —
    # the classic silent-row-loss bug of incremental pipelines.  Undatable
    # rows belong to the fresh branch (they cannot be in a frozen snapshot
    # keyed by date), so frozen + fresh = full, always.
    cutoff = F.col("o_orderdate") < INCR_CUTOFF
    frozen = daily(orders.filter(cutoff))       # the materialized snapshot
    fresh = daily(orders.filter(~F.coalesce(cutoff, F.lit(False))))
    return frozen.unionByName(fresh)


# ---------------------------------------------------------------------------
# Calendar densification: gap-filled daily revenue
# ---------------------------------------------------------------------------
@register(
    "daily_revenue_gapfilled",
    oracle=f"""
        WITH daily AS (
          SELECT epoch_us(o_orderdate) // {DAY_US} AS day,
                 COUNT(*) AS n_orders,
                 {sql_dsum('o_totalprice')} AS revenue
          FROM orders GROUP BY 1
        ),
        bounds AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM daily),
        spine AS (
          SELECT CAST(unnest(generate_series(b.mn, b.mx)) AS BIGINT) AS day
          FROM bounds b
        )
        SELECT s.day,
               COALESCE(d.n_orders, CAST(0 AS BIGINT)) AS n_orders,
               COALESCE(d.revenue, CAST(0.0 AS DOUBLE)) AS revenue,
               (d.day IS NULL) AS is_gap
        FROM spine s LEFT JOIN daily d ON s.day = d.day
        """,
    doc="Calendar densification (gap filling): the day spine generates from "
    "the aggregated bounds — sequence+explode over ONE broadcast row — and "
    "left-joins the per-day partials, so missing days surface as explicit "
    "zero rows (time-series models need the gaps).  Spine size is bounded "
    "by the date span, never the fact cardinality; the only corpus-sized "
    "work is the one daily aggregation.",
    tags=("temporal", "densification"),
)
def daily_revenue_gapfilled(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.expr(f"unix_micros(cast(o_orderdate as timestamp)) div {DAY_US}").alias("day"),
            "o_totalprice",
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )
    bounds = daily.groupBy().agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    spine = bounds.select(F.explode(F.sequence("mn", "mx")).alias("day"))
    d = daily.withColumnRenamed("day", "dday")
    return (
        spine.join(d, spine.day == d.dday, "left")
        .select(
            "day",
            F.coalesce("n_orders", F.lit(0).cast("long")).alias("n_orders"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            F.col("dday").isNull().alias("is_gap"),
        )
    )


# ---------------------------------------------------------------------------
# Purchase-interval distribution + market-basket pair mining
# ---------------------------------------------------------------------------
@register(
    "order_interarrival_histogram",
    oracle=f"""
        WITH seq AS (
          SELECT o_custkey,
                 epoch_us(o_orderdate) // {DAY_US} AS day,
                 LAG(epoch_us(o_orderdate) // {DAY_US})
                   OVER (PARTITION BY o_custkey
                         ORDER BY epoch_us(o_orderdate) // {DAY_US}, o_orderkey)
                   AS prev_day
          -- dateless orders have no position in a cadence timeline, and a
          -- NULL day would order NULLS FIRST in Spark's lag window but
          -- NULLS LAST in DuckDB's, shifting every gap in the partition
          FROM orders WHERE o_orderdate IS NOT NULL
        )
        SELECT CAST((day - prev_day) // 7 AS BIGINT) AS gap_weeks,
               COUNT(*) AS n_gaps
        FROM seq WHERE prev_day IS NOT NULL
        GROUP BY 1
        """,
    doc="Customer purchase-interval distribution: lag window in (day, "
    "orderkey) total order per customer, gaps bucketed to weeks — the "
    "repurchase-cadence input to churn/LTV models.  One shuffle on "
    "o_custkey; the histogram aggregate shrinks to the bucket count.",
    tags=("temporal", "window"),
)
def order_interarrival_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    day = F.expr(f"unix_micros(cast(o_orderdate as timestamp)) div {DAY_US}")
    w = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    seq = (
        orders.filter(F.col("o_orderdate").isNotNull())
        .select("o_custkey", "o_orderkey", day.alias("day"))
        .withColumn("prev_day", F.lag("day").over(w))
    )
    return (
        seq.filter(F.col("prev_day").isNotNull())
        .select(
            F.expr("CAST((day - prev_day) div 7 AS BIGINT)").alias("gap_weeks")
        )
        .groupBy("gap_weeks")
        .agg(F.count(F.lit(1)).alias("n_gaps"))
    )


COPURCHASE_MIN_ORDERS = 3


@register(
    "copurchase_part_pairs",
    oracle=f"""
        WITH items AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        )
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS n_orders
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= {COPURCHASE_MIN_ORDERS}
        """,
    doc="Market-basket pair mining: parts co-purchased in the same order, "
    "kept at support >= 3 orders.  The self-join key is the ORDER — baskets "
    "are small by construction, so the fan-out is sum(basket^2) with "
    "basket ~ a few items, never parts^2; the classic co-occurrence shape "
    "recommendation candidates start from.",
    tags=("join", "basket"),
)
def copurchase_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    items = l.select("l_orderkey", "l_partkey").distinct()
    a = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = items.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, ["ok"])
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= COPURCHASE_MIN_ORDERS)
    )


# ---------------------------------------------------------------------------
# Running-minimum frontier: days setting a new all-time-low price, per priority
# ---------------------------------------------------------------------------
@register(
    "price_frontier_by_priority",
    oracle=f"""
        WITH daily AS (
          -- dateless orders have no day, so they cannot sit on a daily
          -- frontier — and their NULL day would order NULLS FIRST in
          -- Spark's running-min window but NULLS LAST in DuckDB's,
          -- suppressing different frontier rows per engine
          SELECT o_orderpriority,
                 epoch_us(o_orderdate) // {DAY_US} AS day,
                 MIN(o_totalprice) AS day_min
          FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2
        ),
        runmin AS (
          SELECT o_orderpriority, day, day_min,
                 MIN(day_min) OVER (PARTITION BY o_orderpriority ORDER BY day
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS prev_min
          FROM daily
        )
        SELECT o_orderpriority, day, day_min AS frontier_price
        FROM runmin
        WHERE prev_min IS NULL OR day_min < prev_min
        """,
    doc="Pareto-style running-minimum frontier: the days on which an order "
    "priority class saw a new all-time-low order price.  The scale pattern "
    "is PRE-AGGREGATE THEN WINDOW: the per-(priority, day) MIN collapses "
    "the fact table to at most |priorities| x |days| rows in one map-side-"
    "combinable aggregate, and only that bounded table flows through the "
    "cumulative-min window — the window partition is days-per-priority "
    "(thousands of rows), never the order rows themselves.  Exact decimal "
    "min needs no accumulation tricks (MIN is order-insensitive).",
    tags=("window", "frontier", "agg", "added-r3"),
)
def price_frontier_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.filter(F.col("o_orderdate").isNotNull())
        .groupBy(
            "o_orderpriority",
            F.expr(f"unix_micros(o_orderdate) div {DAY_US}").alias("day"),
        )
        .agg(F.min("o_totalprice").alias("day_min"))
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    runmin = daily.withColumn("prev_min", F.min("day_min").over(w))
    return runmin.filter(
        F.col("prev_min").isNull() | (F.col("day_min") < F.col("prev_min"))
    ).select("o_orderpriority", "day", F.col("day_min").alias("frontier_price"))


# ---------------------------------------------------------------------------
# Year-over-year growth: lag window over a pre-aggregated year table
# ---------------------------------------------------------------------------
# Exact-integer cents for the YoY ledger (cf. MAD_CLAMP): revenue is a
# magnitude, so NaN/NULL prices contribute NULL (excluded), negatives floor
# to 0, and one price above 1e12 clamps to 1e14 cents instead of letting
# Spark's floor() silently saturate at int64 max and the yearly SUM
# ANSI-overflow.  Identical CASE text in both dialects.
_YOY_CENTS = (
    "CASE WHEN o_totalprice IS NULL OR isnan(o_totalprice) "
    "THEN CAST(NULL AS BIGINT) "
    "WHEN o_totalprice > 1000000000000.0 THEN CAST(100000000000000 AS BIGINT) "
    "WHEN o_totalprice < 0 THEN CAST(0 AS BIGINT) "
    "ELSE CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)) AS BIGINT) END"
)
# The permille numerator 1000*(rev - prev) must fit int64: the year-over-year
# cent diff saturates at ±9e15 (a ±$90T swing) before the multiply.
_YOY_DIFF = "LEAST(GREATEST(rev_cents - prev_cents, -9000000000000000), 9000000000000000)"


@register(
    "orders_yoy_growth",
    oracle=f"""
        WITH yearly AS (
          -- no date, no year (NULL-yr groups order differently per engine);
          -- an all-garbage year coalesces to 0 revenue so the diff/LEAST/
          -- GREATEST chain never sees NULL (engines disagree on NULL-skip)
          SELECT o_orderpriority,
                 CAST(year(o_orderdate) AS BIGINT) AS yr,
                 CAST(COALESCE(SUM({_YOY_CENTS}), 0) AS BIGINT) AS rev_cents
          FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2
        ),
        lagged AS (
          SELECT o_orderpriority, yr, rev_cents,
                 LAG(rev_cents) OVER (PARTITION BY o_orderpriority ORDER BY yr)
                   AS prev_cents
          FROM yearly
        )
        SELECT o_orderpriority, yr, rev_cents,
               CAST((({_YOY_DIFF}) * 1000) // prev_cents AS BIGINT)
                 AS growth_permille
        FROM lagged WHERE prev_cents IS NOT NULL AND prev_cents > 0
        """,
    doc="Year-over-year revenue growth per priority class — the reporting "
    "lag-window shape.  PRE-AGGREGATE THEN WINDOW again: the fact table "
    "collapses to |priorities| x |years| rows of exact integer cents "
    "before any window, so LAG runs over a table that fits one executor "
    "page at any corpus size.  Growth is integer permille — Spark's `div` "
    "and DuckDB's integer `//` both truncate toward zero (verified on the "
    "18 shrinking-year rows of the sane corpus), so no correction term — "
    "over a positive base only (growth vs a zero-revenue year is "
    "undefined).",
    tags=("window", "lag", "agg", "added-r3"),
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    yearly = (
        orders.filter(F.col("o_orderdate").isNotNull())
        .groupBy(
            "o_orderpriority",
            F.expr("CAST(year(o_orderdate) AS BIGINT)").alias("yr"),
        )
        .agg(
            F.expr(f"CAST(COALESCE(SUM({_YOY_CENTS}), 0) AS BIGINT)").alias(
                "rev_cents"
            )
        )
    )
    w = Window.partitionBy("o_orderpriority").orderBy("yr")
    lagged = yearly.withColumn("prev_cents", F.lag("rev_cents").over(w))
    return (
        lagged.filter(F.col("prev_cents").isNotNull() & (F.col("prev_cents") > 0))
        .withColumn("numer", F.expr(f"({_YOY_DIFF}) * 1000"))
        .select(
            "o_orderpriority",
            "yr",
            "rev_cents",
            F.expr("CAST(numer div prev_cents AS BIGINT)").alias("growth_permille"),
        )
    )


# ---------------------------------------------------------------------------
# Robust anomaly detection — median / MAD instead of mean / stddev
# ---------------------------------------------------------------------------
# Exact-integer envelope for the MAD machinery: values quantize to int64
# micro-units and flow through 2*vi, |2*vi - median2|, 3*mad4 — clamping
# |value| at 1e11 (vi at 1e17) keeps every intermediate below 2^63 for any
# input double.  An out-of-envelope outlier still COUNTS as an anomaly (it
# clamps to the envelope edge, which any sane band flags); NaN and NULL
# values carry no magnitude and are excluded.  Identical CASE in both
# engines; without it one 1e35 garbage value ANSI-aborts the whole job.
MAD_CLAMP = "100000000000.0"  # 1e11, as a double literal
MAD_CLAMP_VI = 100_000_000_000_000_000  # 1e17 = clamp * 1e6, exact int64


@register(
    "mad_robust_anomalies",
    oracle=f"""
        WITH v AS (
          SELECT event_type, event_id,
                 CASE WHEN value > {MAD_CLAMP} THEN CAST({MAD_CLAMP_VI} AS BIGINT)
                      WHEN value < -{MAD_CLAMP} THEN CAST(-{MAD_CLAMP_VI} AS BIGINT)
                      ELSE CAST(floor(value * 1000000.0) AS BIGINT) END AS vi
          FROM events
          WHERE value IS NOT NULL AND NOT isnan(value)
        ),
        s1 AS (
          SELECT event_type, event_id, vi,
                 COUNT(*) OVER wp AS n,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY vi, event_id) AS rn
          FROM v
          WINDOW wp AS (PARTITION BY event_type)
        ),
        s2 AS (
          SELECT *,
                 SUM(CASE WHEN rn = (n + 1) // 2 THEN vi ELSE 0 END
                     + CASE WHEN rn = (n + 2) // 2 THEN vi ELSE 0 END)
                   OVER (PARTITION BY event_type) AS median2
          FROM s1
        ),
        s3 AS (
          SELECT event_type, event_id, vi, n, median2,
                 abs(2 * vi - median2) AS d
          FROM s2
        ),
        s4 AS (
          SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY d, event_id) AS rd
          FROM s3
        ),
        s5 AS (
          SELECT *,
                 SUM(CASE WHEN rd = (n + 1) // 2 THEN d ELSE 0 END
                     + CASE WHEN rd = (n + 2) // 2 THEN d ELSE 0 END)
                   OVER (PARTITION BY event_type) AS mad4
          FROM s4
        )
        SELECT event_type,
               MAX(n) AS n_events,
               CAST(MAX(median2) AS DOUBLE) / 2000000.0 AS median_value,
               CAST(MAX(mad4) AS DOUBLE) / 4000000.0 AS mad_value,
               CAST(SUM(CASE WHEN 2 * d > 3 * mad4 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_anomalies
        FROM s5 GROUP BY event_type
        """,
    doc="Robust anomaly counts per event_type: median and median-absolute-"
    "deviation instead of the mean/stddev of zscore_anomalies, so a few "
    "extreme outliers cannot inflate the band that is supposed to catch "
    "them (outliers beyond the 1e11 exact-integer envelope clamp to its "
    "edge and still count; NaN/NULL values are excluded — see MAD_CLAMP). "
    "Exact cross-engine medians with NO floating interpolation: "
    "values quantize to int64 micro-units, the median is carried as the "
    "SUM OF THE TWO MIDDLE ORDER STATISTICS (median2 = 2*median, mad4 = "
    "4*MAD), and the |v - med| > 3*MAD flag is the pure-integer test "
    "2*|2v - median2| * ... > 3*mad4 — only the two reported medians "
    "divide back to DOUBLE.  Exact-audit posture: the per-group "
    "row_number sort funnels each event_type through one partition "
    "(groups are few and bounded); the scale twin is zscore_anomalies / "
    "quantile_sketch_value (map-combinable moments / sketches).",
    tags=("window", "statistics", "anomaly", "exact-audit", "added-r3"),
)
def mad_robust_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.expr("value IS NOT NULL AND NOT isnan(value)"))
        .select(
            "event_type",
            "event_id",
            F.expr(
                f"CASE WHEN value > {MAD_CLAMP} THEN CAST({MAD_CLAMP_VI} AS BIGINT) "
                f"WHEN value < -{MAD_CLAMP} THEN CAST(-{MAD_CLAMP_VI} AS BIGINT) "
                "ELSE CAST(floor(value * 1000000.0) AS BIGINT) END"
            ).alias("vi"),
        )
    )
    wp = Window.partitionBy("event_type")
    r1 = F.expr("(n + 1) div 2")
    r2 = F.expr("(n + 2) div 2")
    s1 = ev.withColumn("n", F.count(F.lit(1)).over(wp)).withColumn(
        "rn", F.row_number().over(wp.orderBy("vi", "event_id"))
    )
    pick_v = F.when(F.col("rn") == r1, F.col("vi")).otherwise(F.lit(0)) + F.when(
        F.col("rn") == r2, F.col("vi")
    ).otherwise(F.lit(0))
    s2 = s1.withColumn("median2", F.sum(pick_v).over(wp))
    s3 = s2.withColumn("d", F.abs(F.lit(2) * F.col("vi") - F.col("median2")))
    s4 = s3.withColumn("rd", F.row_number().over(wp.orderBy("d", "event_id")))
    pick_d = F.when(F.col("rd") == r1, F.col("d")).otherwise(F.lit(0)) + F.when(
        F.col("rd") == r2, F.col("d")
    ).otherwise(F.lit(0))
    s5 = s4.withColumn("mad4", F.sum(pick_d).over(wp))
    return s5.groupBy("event_type").agg(
        F.max("n").alias("n_events"),
        (F.max("median2").cast("double") / F.lit(2_000_000.0)).alias("median_value"),
        (F.max("mad4").cast("double") / F.lit(4_000_000.0)).alias("mad_value"),
        F.sum(
            F.when(F.lit(2) * F.col("d") > F.lit(3) * F.col("mad4"), F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("n_anomalies"),
    )


# ---------------------------------------------------------------------------
# Winsorized robust mean: exact order statistics, no float interpolation
# ---------------------------------------------------------------------------
WINSOR_LO_PCT = 5
WINSOR_HI_PCT = 95


@register(
    "winsorized_price_stats",
    oracle=f"""
        WITH o AS (
          SELECT o_orderpriority AS priority, o_totalprice AS price,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice, o_orderkey) AS rn,
                 COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
          FROM orders
        ),
        cuts AS (
          SELECT priority,
                 MAX(CASE WHEN rn = GREATEST(1, ({WINSOR_LO_PCT} * n) // 100)
                          THEN price END) AS lo_cut,
                 MAX(CASE WHEN rn = LEAST(n, ({WINSOR_HI_PCT} * n + 99) // 100)
                          THEN price END) AS hi_cut,
                 MAX(n) AS n
          FROM o GROUP BY priority
        )
        SELECT o.priority, CAST(c.n AS BIGINT) AS n_orders,
               c.lo_cut, c.hi_cut,
               {sql_davg('LEAST(GREATEST(o.price, c.lo_cut), c.hi_cut)')}
                 AS winsorized_avg,
               {sql_davg('o.price')} AS raw_avg
        FROM o JOIN cuts c ON o.priority = c.priority
        GROUP BY o.priority, c.n, c.lo_cut, c.hi_cut
        """,
    doc="Robust mean via winsorization at exact P5/P95 ORDER STATISTICS: "
    "rank formulas are integer arithmetic (GREATEST(1, 5n div 100) / "
    "LEAST(n, ceil(95n/100))) over a deterministic (price, orderkey) sort, "
    "so the cut values are actual data values — no float interpolation, "
    "bit-identical across engines.  The clamp-and-average pass reuses the "
    "same shuffle via a broadcast of the tiny per-group cut table.  "
    "Exact-audit path: the per-group window sorts each priority's orders "
    "on one partition; the scale default for quantiles at 100 TB is the "
    "mergeable quantile sketch (quantile_sketch_value).",
    tags=("window", "statistics", "robust", "exact-audit", "added-r3"),
)
def winsorized_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("price"),
        "o_orderkey",
    )
    w = Window.partitionBy("priority").orderBy("price", "o_orderkey")
    ranked = o.select(
        "priority",
        "price",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("priority")).alias("n"),
    )
    cuts = ranked.groupBy("priority").agg(
        F.max(
            F.when(
                F.expr(f"rn = greatest(1L, ({WINSOR_LO_PCT} * n) div 100)"),
                F.col("price"),
            )
        ).alias("lo_cut"),
        F.max(
            F.when(
                F.expr(f"rn = least(n, ({WINSOR_HI_PCT} * n + 99) div 100)"),
                F.col("price"),
            )
        ).alias("hi_cut"),
        F.max("n").alias("n"),
    )
    joined = o.join(F.broadcast(cuts), "priority")
    return joined.groupBy("priority", "n", "lo_cut", "hi_cut").agg(
        davg(F.expr("least(greatest(price, lo_cut), hi_cut)")).alias("winsorized_avg"),
        davg("price").alias("raw_avg"),
    ).select(
        "priority",
        F.col("n").cast("long").alias("n_orders"),
        "lo_cut",
        "hi_cut",
        "winsorized_avg",
        "raw_avg",
    )


# ---------------------------------------------------------------------------
# RFM segmentation: recency / frequency / monetary customer scoring
# ---------------------------------------------------------------------------
# Fixed integer thresholds (no quantiles, no global sort): recency in days
# against the corpus max-date anchor, order counts, lifetime cents.
RFM_R_DAYS = (365, 1095)  # <=365d -> 2, <=1095d -> 1, else 0
RFM_F_ORDERS = (12, 8)  # >=12 -> 2, >=8 -> 1, else 0
RFM_M_CENTS = (300_000_000, 150_000_000)  # >=3.0M$ -> 2, >=1.5M$ -> 1, else 0


@register(
    "rfm_customer_segments",
    oracle=f"""
        WITH per_cust AS (
          SELECT o_custkey,
                 MAX(epoch_us(o_orderdate)) AS last_us,
                 COUNT(*) AS freq,
                 CAST(SUM({_YOY_CENTS}) AS BIGINT) AS cents
          FROM orders GROUP BY o_custkey
        ),
        anchor AS (SELECT MAX(last_us) AS anchor_us FROM per_cust),
        scored AS (
          SELECT CASE WHEN (anchor_us - last_us) // {DAY_US} <= {RFM_R_DAYS[0]} THEN 2
                      WHEN (anchor_us - last_us) // {DAY_US} <= {RFM_R_DAYS[1]} THEN 1
                      ELSE 0 END AS r_score,
                 CASE WHEN freq >= {RFM_F_ORDERS[0]} THEN 2
                      WHEN freq >= {RFM_F_ORDERS[1]} THEN 1 ELSE 0 END AS f_score,
                 CASE WHEN cents >= {RFM_M_CENTS[0]} THEN 2
                      WHEN cents >= {RFM_M_CENTS[1]} THEN 1 ELSE 0 END AS m_score,
                 freq, cents
          FROM per_cust CROSS JOIN anchor
        )
        SELECT CAST(r_score AS BIGINT) AS r_score,
               CAST(f_score AS BIGINT) AS f_score,
               CAST(m_score AS BIGINT) AS m_score,
               COUNT(*) AS customers,
               CAST(SUM(freq) AS BIGINT) AS orders,
               CAST(SUM(cents) // COUNT(*) AS BIGINT) AS avg_cents_per_customer
        FROM scored GROUP BY 1, 2, 3
        """,
    doc="RFM (recency/frequency/monetary) customer segmentation — the "
    "classic marketing-analytics scoring the reference's event pipeline "
    "feeds downstream.  ONE fact scan: per-customer last-order epoch, "
    "order count, and exact lifetime integer cents in a single hash "
    "aggregate; the recency anchor is the MAX over that per-customer "
    "table (never a second fact scan) broadcast back as a 1-row scalar.  "
    "Scores use fixed integer thresholds, not quantiles, so no global "
    "sort appears anywhere and the segment roll-up output is bounded by "
    "27 (r,f,m) cells at any corpus size.",
    tags=("agg", "segmentation", "scalar-broadcast", "added-r3b"),
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.expr("MAX(unix_micros(o_orderdate))").alias("last_us"),
        F.count(F.lit(1)).alias("freq"),
        # _YOY_CENTS: the shared exact-cents envelope (NaN->NULL, clamp, no
        # silent floor() saturation) — a poisoned price must not skew or
        # crash the whole segmentation
        F.expr(f"CAST(SUM({_YOY_CENTS}) AS BIGINT)").alias("cents"),
    )
    anchor = per_cust.agg(F.max("last_us").alias("anchor_us"))
    scored = per_cust.crossJoin(F.broadcast(anchor)).select(
        F.expr(
            f"CAST(CASE WHEN (anchor_us - last_us) div {DAY_US} <= {RFM_R_DAYS[0]} THEN 2 "
            f"WHEN (anchor_us - last_us) div {DAY_US} <= {RFM_R_DAYS[1]} THEN 1 "
            "ELSE 0 END AS BIGINT)"
        ).alias("r_score"),
        F.expr(
            f"CAST(CASE WHEN freq >= {RFM_F_ORDERS[0]} THEN 2 "
            f"WHEN freq >= {RFM_F_ORDERS[1]} THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("f_score"),
        F.expr(
            f"CAST(CASE WHEN cents >= {RFM_M_CENTS[0]} THEN 2 "
            f"WHEN cents >= {RFM_M_CENTS[1]} THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("m_score"),
        "freq",
        "cents",
    )
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).alias("customers"),
        F.sum("freq").cast("long").alias("orders"),
        F.expr("CAST(SUM(cents) div COUNT(*) AS BIGINT)").alias(
            "avg_cents_per_customer"
        ),
    )


# ---------------------------------------------------------------------------
# Daily OHLC bars: open/high/low/close via keyed argmin/argmax, zero windows
# ---------------------------------------------------------------------------
@register(
    "daily_value_ohlc",
    oracle=f"""
        SELECT CAST(epoch_us(ts) // {DAY_US} AS BIGINT) AS day,
               arg_min(value, epoch_us(ts)::HUGEINT * 10000000000 + event_id)
                 AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               arg_max(value, epoch_us(ts)::HUGEINT * 10000000000 + event_id)
                 AS close,
               COUNT(*) AS n_events,
               {sql_dsum('value')} AS sum_value
        FROM events GROUP BY 1
        """,
    doc="Daily OHLC (open/high/low/close) bars over the event stream — the "
    "time-series downsampling shape behind dashboards and candlestick "
    "rollups.  First/last values come from min_by/max_by keyed on a "
    "PACKED (epoch_micros, event_id) decimal — a deterministic total "
    "order — so the whole bar is ONE hash aggregate with map-side "
    "combine: no window, no self-join, no per-day sort.  Sum goes "
    "through DECIMAL(38,6) so partial-aggregation order cannot move the "
    "result.  Output is bounded by distinct days at any corpus size.",
    tags=("agg", "timeseries", "argminmax", "scale-default", "added-r3b"),
)
def daily_value_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    pk = "CAST(unix_micros(ts) AS DECIMAL(38,0)) * 10000000000 + event_id"
    return (
        events.groupBy(
            F.expr(f"CAST(unix_micros(ts) div {DAY_US} AS BIGINT)").alias("day")
        )
        .agg(
            F.expr(f"min_by(value, {pk})").alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.expr(f"max_by(value, {pk})").alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# A/B experiment report: deterministic hash assignment + conversion lift
# ---------------------------------------------------------------------------
# Knuth multiplicative hash mod a prime: stable, engine-portable, and
# independent of user_id's own parity structure.  user_id is reduced mod a
# million-scale prime first so the multiply stays < 2^63 for ANY id width
# (Spark's non-ANSI multiply would wrap silently, DuckDB's would widen to
# HUGEINT — the assignment would diverge exactly at scale).
AB_HASH_PREMOD = 1000003  # reduce user_id BEFORE the multiply: product < 2^63
AB_HASH_MULT = 2654435761
AB_HASH_MOD = 97
AB_SPLIT_LT = 48  # < 48 -> variant A (~49.5%), else B


@register(
    "ab_test_report",
    oracle=f"""
        WITH per_user AS (
          SELECT user_id,
                 CASE WHEN (((user_id % {AB_HASH_PREMOD}) * {AB_HASH_MULT}) % {AB_HASH_MOD}) < {AB_SPLIT_LT}
                      THEN 'A' ELSE 'B' END AS variant,
                 SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchases,
                 SUM(CASE WHEN event_type = 'purchase'
                          THEN {sql_dcast('value')} ELSE CAST(0 AS DECIMAL(38,6)) END)
                   AS revenue
          FROM events GROUP BY 1, 2
        )
        SELECT variant,
               COUNT(*) AS users,
               CAST(SUM(CASE WHEN purchases > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS converters,
               CAST((1000 * SUM(CASE WHEN purchases > 0 THEN 1 ELSE 0 END))
                    // COUNT(*) AS BIGINT) AS conv_permille,
               CAST(SUM(purchases) AS BIGINT) AS purchases,
               CAST(SUM(revenue) AS DOUBLE) AS revenue
        FROM per_user GROUP BY variant
        """,
    doc="A/B experiment scorecard: users assigned to variants by a "
    "deterministic multiplicative hash of user_id (stable across reruns, "
    "batches, and engines — no assignment table, no coordination, the "
    "same contract as the train/val/test split), then per-variant "
    "conversion rate and exact-decimal purchase revenue.  ONE event scan "
    "into a per-user aggregate (the variant is a pure projection, so "
    "assignment costs nothing), then a 2-row variant roll-up.  At 100 TB "
    "the experiment readout is the same two hash aggregates; integer "
    "permille conversion keeps the comparison float-free.",
    tags=("agg", "experimentation", "scale-default", "added-r3b"),
)
def ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy(
        "user_id",
        F.expr(
            f"CASE WHEN (((user_id % {AB_HASH_PREMOD}) * {AB_HASH_MULT}) % {AB_HASH_MOD}) < {AB_SPLIT_LT} "
            "THEN 'A' ELSE 'B' END"
        ).alias("variant"),
    ).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "purchases"
        ),
        # dcast (try_cast): one NaN/Inf/1e35 garbage purchase value must not
        # abort the experiment readout — it contributes NULL, oracle-identical
        F.sum(
            F.when(F.col("event_type") == "purchase", dcast(F.col("value"))).otherwise(
                F.lit(0).cast(DEC)
            )
        ).alias("revenue"),
    )
    return per_user.groupBy("variant").agg(
        F.count(F.lit(1)).alias("users"),
        F.sum(F.when(F.col("purchases") > 0, 1).otherwise(0))
        .cast("long")
        .alias("converters"),
        F.expr(
            "CAST((1000 * SUM(CASE WHEN purchases > 0 THEN 1 ELSE 0 END)) div COUNT(*) AS BIGINT)"
        ).alias("conv_permille"),
        F.sum("purchases").cast("long").alias("purchases"),
        F.sum("revenue").cast("double").alias("revenue"),
    )


# ---------------------------------------------------------------------------
# Seasonality baseline + deviation flags: (dow, hour) profile vs actual cells
# ---------------------------------------------------------------------------
SEASONAL_TOPK = 20  # report the k most-overloaded cells (ratio-threshold
# flags go empty on uniform corpora as scale concentrates the ratios)


@register(
    "seasonality_deviation_flags",
    oracle=f"""
        WITH cells AS (
          SELECT CAST(epoch_us(ts) // {DAY_US} AS BIGINT) AS day,
                 CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hour,
                 CAST((epoch_us(ts) // {DAY_US}) % 7 AS BIGINT) AS dow,
                 COUNT(*) AS actual
          FROM events GROUP BY 1, 2, 3
        ),
        baseline AS (
          SELECT dow, hour,
                 CAST(SUM(actual) AS BIGINT) AS total,
                 COUNT(*) AS n_days
          FROM cells GROUP BY dow, hour
        )
        SELECT c.day, c.hour, c.actual,
               CAST((1000 * b.total) // b.n_days AS BIGINT) AS baseline_milli,
               CAST((1000 * c.actual * b.n_days) // b.total AS BIGINT)
                 AS load_permille
        FROM cells c JOIN baseline b ON c.dow = b.dow AND c.hour = b.hour
        ORDER BY load_permille DESC, c.day, c.hour LIMIT {SEASONAL_TOPK}
        """,
    doc="Seasonality-aware anomaly flags: each (day, hour) traffic cell is "
    "compared against the average for its (day-of-week, hour) slot — the "
    "diurnal/weekly profile baseline that plain z-scores miss (a quiet "
    "Sunday 3am cell can be anomalous at volumes a Monday noon cell calls "
    "normal).  Two hash aggregates off one scan: day-hour cells, then the "
    "168-slot baseline joined back (AQE broadcasts it); the load ratio is "
    "integer permille; the report is the deterministic top-20 most-loaded cells (TakeOrderedAndProject — a fixed ratio cutoff goes empty as scale concentrates uniform traffic toward 1000).  Epoch-day modulo gives "
    "a stable dow index with no locale/timezone surface.  Output is "
    "bounded by flagged cells <= days x 24.",
    tags=("agg", "timeseries", "anomaly", "scale-default", "added-r3b"),
)
def seasonality_deviation_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    cells = events.groupBy(
        F.expr(f"CAST(unix_micros(ts) div {DAY_US} AS BIGINT)").alias("day"),
        F.expr("CAST((unix_micros(ts) div 3600000000) % 24 AS BIGINT)").alias("hour"),
        F.expr(f"CAST((unix_micros(ts) div {DAY_US}) % 7 AS BIGINT)").alias("dow"),
    ).agg(F.count(F.lit(1)).alias("actual"))
    baseline = cells.groupBy("dow", "hour").agg(
        F.sum("actual").cast("long").alias("total"),
        F.count(F.lit(1)).alias("n_days"),
    )
    joined = cells.join(F.broadcast(baseline), ["dow", "hour"])
    return (
        joined.select(
            "day",
            "hour",
            "actual",
            F.expr("CAST((1000 * total) div n_days AS BIGINT)").alias(
                "baseline_milli"
            ),
            F.expr("CAST((1000 * actual * n_days) div total AS BIGINT)").alias(
                "load_permille"
            ),
        )
        .orderBy(F.col("load_permille").desc(), "day", "hour")
        .limit(SEASONAL_TOPK)
    )


# ---------------------------------------------------------------------------
# Trend slope per event type: closed-form OLS over daily counts, exact sums
# ---------------------------------------------------------------------------
@register(
    "trend_slope_by_type",
    oracle=f"""
        WITH daily AS (
          SELECT event_type,
                 CAST(epoch_us(ts) // {DAY_US} AS BIGINT) AS day,
                 COUNT(*) AS y
          FROM events GROUP BY 1, 2
        ),
        anchor AS (SELECT MIN(day) AS d0 FROM daily),
        xy AS (
          SELECT event_type, CAST(day - d0 AS HUGEINT) AS x, CAST(y AS HUGEINT) AS y
          FROM daily CROSS JOIN anchor
        ),
        s AS (
          SELECT event_type,
                 COUNT(*)::HUGEINT AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(x * y) AS sxy, SUM(x * x) AS sxx
          FROM xy GROUP BY event_type
        )
        SELECT event_type,
               CAST(n AS BIGINT) AS n_days,
               CAST(sy AS BIGINT) AS total_events,
               CAST((1000000 * (n * sxy - sx * sy))
                    // GREATEST(n * sxx - sx * sx, 1) AS BIGINT) AS slope_micro
        FROM s
        """,
    doc="Per-type traffic trend by closed-form least squares over the daily "
    "count series: slope = (nSxy - SxSy) / (nSxx - Sx^2) in events/day, "
    "reported in integer micro-units.  The fact table collapses to "
    "|types| x |days| rows FIRST (one hash aggregate), x is re-anchored "
    "to the corpus min day (1-row scalar broadcast) so the moment sums "
    "stay small, and the four moments accumulate in DECIMAL(38,0)/"
    "HUGEINT — exact at any corpus size, no per-row float ever exists.  "
    "GREATEST(den, 1) absorbs the single-day degenerate series.  This is "
    "the regression shape under every 'is traffic growing' dashboard "
    "without an ML library in sight.",
    tags=("agg", "timeseries", "regression", "scale-default", "added-r3b"),
)
def trend_slope_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type",
        F.expr(f"CAST(unix_micros(ts) div {DAY_US} AS BIGINT)").alias("day"),
    ).agg(F.count(F.lit(1)).alias("y"))
    anchor = daily.agg(F.min("day").alias("d0"))
    D38 = "decimal(38,0)"
    xy = daily.crossJoin(F.broadcast(anchor)).select(
        "event_type",
        (F.col("day") - F.col("d0")).cast(D38).alias("x"),
        F.col("y").cast(D38).alias("y"),
    )
    s = xy.groupBy("event_type").agg(
        F.count(F.lit(1)).cast(D38).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    return s.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("sy").cast("long").alias("total_events"),
        F.expr(
            "CAST((1000000 * (n * sxy - sx * sy)) div "
            "GREATEST(n * sxx - sx * sx, CAST(1 AS DECIMAL(38,0))) AS BIGINT)"
        ).alias("slope_micro"),
    )


# ---------------------------------------------------------------------------
# Behavioral diversity: Gini-Simpson index of each user's event-type mix
# ---------------------------------------------------------------------------
DIVERSITY_BUCKET = 100  # histogram bucket width in permille


@register(
    "user_diversity_histogram",
    oracle=f"""
        WITH per AS (
          SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
        ),
        u AS (
          SELECT user_id, SUM(c) AS n, SUM(c * c) AS ss FROM per GROUP BY user_id
        ),
        d AS (
          SELECT user_id,
                 (1000 * (n::HUGEINT * n - ss)) // (n::HUGEINT * n)
                   AS div_permille
          FROM u
        )
        SELECT CAST((div_permille // {DIVERSITY_BUCKET}) * {DIVERSITY_BUCKET}
                    AS BIGINT) AS bucket,
               COUNT(*) AS users
        FROM d GROUP BY 1
        """,
    doc="Behavioral-diversity profile: the Gini-Simpson index 1 - sum(p_i^2) "
    "of each user's event-type mix, in integer permille — the log-free "
    "diversity measure (entropy's rational cousin, exactly computable "
    "cross-engine: 1000 * (n^2 - sum(c^2)) div n^2).  A 0 bucket is a "
    "single-behavior account (bot smell), high buckets are engaged "
    "users.  Two hash aggregates sharing one user_id shuffle, then a "
    "bounded 11-bucket histogram; n <= events per user so n^2 is int64-"
    "safe to ~3e9 events per user.",
    tags=("agg", "statistics", "curation", "scale-default", "added-r3b"),
)
def user_diversity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    per = events.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    u = per.groupBy("user_id").agg(
        F.sum("c").alias("n"), F.sum(F.col("c") * F.col("c")).alias("ss")
    )
    # permille arithmetic in DECIMAL(38,0)/HUGEINT: 1000 * n^2 overflows
    # int64 at ~9.6e7 events per user (ANSI raise vs DuckDB HUGEINT widen)
    d = u.select(
        F.expr(
            "(1000 * (CAST(n AS DECIMAL(38,0)) * n - ss)) div "
            "(CAST(n AS DECIMAL(38,0)) * n)"
        ).alias("div_permille")
    )
    return d.groupBy(
        F.expr(
            f"CAST((div_permille div {DIVERSITY_BUCKET}) * {DIVERSITY_BUCKET} AS BIGINT)"
        ).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("users"))


# ---------------------------------------------------------------------------
# Data-quality expectation suite: one row per assertion, violation counts
# ---------------------------------------------------------------------------
@register(
    "dq_expectations_report",
    oracle="""
        WITH o AS (
          SELECT COUNT(*) AS total,
                 COUNT(*) - COUNT(DISTINCT o_orderkey) AS pk_dups,
                 SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS bad_price,
                 SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS null_date
          FROM orders
        ),
        l AS (
          SELECT COUNT(*) AS total,
                 SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END)
                   AS bad_disc
          FROM lineitem
        ),
        fk AS (
          SELECT COUNT(*) AS orphans FROM lineitem li
          WHERE NOT EXISTS (SELECT 1 FROM orders oo
                            WHERE oo.o_orderkey = li.l_orderkey)
        )
        SELECT 'orders_pk_unique' AS expectation,
               CAST(o.pk_dups AS BIGINT) AS violations,
               CAST(o.total AS BIGINT) AS total FROM o
        UNION ALL
        SELECT 'totalprice_positive', CAST(o.bad_price AS BIGINT),
               CAST(o.total AS BIGINT) FROM o
        UNION ALL
        SELECT 'orderdate_not_null', CAST(o.null_date AS BIGINT),
               CAST(o.total AS BIGINT) FROM o
        UNION ALL
        SELECT 'discount_in_unit_range', CAST(l.bad_disc AS BIGINT),
               CAST(l.total AS BIGINT) FROM l
        UNION ALL
        SELECT 'lineitem_fk_orders', CAST(fk.orphans AS BIGINT),
               CAST(l.total AS BIGINT) FROM fk CROSS JOIN l
        """,
    doc="Data-quality expectation suite (the dbt-test / Great-Expectations "
    "shape): primary-key uniqueness, referential integrity, range and "
    "not-null assertions evaluated as violation COUNTS with one output "
    "row per expectation — the contract gate a pipeline runs before "
    "publishing a table.  ONE aggregate per table carries every "
    "same-table expectation (uniqueness = COUNT - COUNT(DISTINCT), range "
    "and null checks as conditional sums) and unstacks to expectation "
    "rows; only referential integrity needs a join (a LEFT ANTI count, "
    "never a row-by-row EXISTS).  Violation counts rather than booleans, "
    "so the report localizes HOW broken a feed is, and zero rows of the "
    "fact tables ever reach the driver.",
    tags=("agg", "quality", "join", "scale-default", "added-r3b"),
)
def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    o = orders.agg(
        F.count(F.lit(1)).alias("total"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("pk_dups"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("bad_price"),
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)).alias(
            "null_date"
        ),
    )
    l = lineitem.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1).otherwise(
                0
            )
        ).alias("bad_disc"),
    )
    fk = lineitem.join(
        orders.select(F.col("o_orderkey").alias("l_orderkey")),
        "l_orderkey",
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("orphans"))
    o_rows = o.select(
        F.expr(
            "stack(3, 'orders_pk_unique', pk_dups, 'totalprice_positive', bad_price, "
            "'orderdate_not_null', null_date) AS (expectation, violations)"
        ),
        F.col("total"),
    )
    l_rows = l.select(
        F.lit("discount_in_unit_range").alias("expectation"),
        F.col("bad_disc").alias("violations"),
        "total",
    )
    fk_rows = fk.crossJoin(F.broadcast(l.select("total"))).select(
        F.lit("lineitem_fk_orders").alias("expectation"),
        F.col("orphans").alias("violations"),
        "total",
    )
    out = o_rows.unionByName(l_rows).unionByName(fk_rows)
    return out.select(
        "expectation",
        F.col("violations").cast("long").alias("violations"),
        F.col("total").cast("long").alias("total"),
    )


# ---------------------------------------------------------------------------
# Financial reconciliation: order header total vs recomputed line-item total
# ---------------------------------------------------------------------------
_RECON_BUCKET = """CASE
  WHEN dev_permille = 0 THEN 'exact'
  WHEN dev_permille <= 10 THEN 'within_1pct'
  WHEN dev_permille <= 100 THEN 'within_10pct'
  WHEN dev_permille <= 1000 THEN 'within_2x'
  ELSE 'over_2x' END"""


def _recon_micros(col: str) -> str:
    """Total micro-unit quantizer for the reconciliation feeds, identical
    text in both dialects (cf. MAD_CLAMP): symmetric clamp at 1e9 currency
    units (1e15 micros) keeps 1000*ABS(cm - tm) inside int64 for ANY input
    double — Spark's floor() would otherwise silently saturate at int64 max
    and the 1000x multiply ANSI-overflows; NaN quantizes to NULL (not
    comparable -> the orphan bucket, same as a missing detail feed)."""
    return (
        f"CASE WHEN {col} IS NULL OR isnan({col}) THEN CAST(NULL AS BIGINT) "
        f"WHEN {col} > 1000000000.0 THEN CAST(1000000000000000 AS BIGINT) "
        f"WHEN {col} < -1000000000.0 THEN CAST(-1000000000000000 AS BIGINT) "
        f"ELSE CAST(FLOOR({col} * 1000000.0) AS BIGINT) END"
    )


@register(
    "order_reconciliation_report",
    oracle=f"""
        WITH l AS (
          SELECT l_orderkey,
                 {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')}
                   AS calc
          FROM lineitem GROUP BY 1
        ),
        j AS (
          SELECT {_recon_micros('l.calc')} AS cm,
                 {_recon_micros('o.o_totalprice')} AS tm
          FROM orders o LEFT JOIN l ON o.o_orderkey = l.l_orderkey
        ),
        dev AS (
          SELECT CASE WHEN cm IS NULL OR tm IS NULL THEN NULL
                      ELSE (1000 * ABS(cm - tm)) // GREATEST(ABS(tm), 1)
                 END AS dev_permille
          FROM j
        )
        SELECT CASE WHEN dev_permille IS NULL THEN 'no_lineitems'
                    ELSE {_RECON_BUCKET} END AS bucket,
               COUNT(*) AS orders
        FROM dev GROUP BY 1
        """,
    doc="Financial reconciliation — header total vs the total RECOMPUTED "
    "from line items (sum of extendedprice x (1-discount) x (1+tax)): the "
    "close-the-books audit every revenue pipeline runs between a summary "
    "feed and its detail feed.  Per-row products convert to DECIMAL(38,6) "
    "before summing (exact, order-independent), deviation is integer "
    "permille of micro-units, and the report buckets deviation magnitude "
    "plus an explicit no-detail-rows orphan bucket (a LEFT join, so "
    "headers missing details are surfaced, not dropped).  One "
    "co-partitioned orderkey join, bounded bucket output.  On this "
    "synthetic corpus the feeds genuinely disagree — the report "
    "quantifies by how much, which is exactly its production job.",
    tags=("agg", "quality", "join", "scale-default", "added-r3b"),
)
def order_reconciliation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    l = lineitem.groupBy("l_orderkey").agg(
        dsum(F.expr("l_extendedprice * (1 - l_discount) * (1 + l_tax)")).alias("calc")
    )
    j = orders.join(l, orders.o_orderkey == l.l_orderkey, "left")
    # NULL (not a numeric sentinel) marks missing details OR a NaN feed — a
    # legitimate deviation can land on any integer; _recon_micros clamps
    # both feeds into the 1000x-multiply-safe envelope, and ABS +
    # GREATEST(.., 1) keep the division total on zero/negative header
    # totals (ANSI raises on /0 where the oracle's // returns NULL)
    dev = j.select(
        F.expr(_recon_micros("calc")).alias("cm"),
        F.expr(_recon_micros("o_totalprice")).alias("tm"),
    ).select(
        F.expr(
            "CASE WHEN cm IS NULL OR tm IS NULL THEN NULL "
            "ELSE (1000 * ABS(cm - tm)) div GREATEST(ABS(tm), 1) END"
        ).alias("dev_permille")
    )
    return dev.groupBy(
        F.expr(
            "CASE WHEN dev_permille IS NULL THEN 'no_lineitems' ELSE "
            + _RECON_BUCKET
            + " END"
        ).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("orders"))


# ---------------------------------------------------------------------------
# Wilson confidence bounds for the A/B conversion readout
# ---------------------------------------------------------------------------
# The statistically honest form of ab_test_report's permille comparison: the
# 95% Wilson score interval per variant.  Engine-portable WITHOUT rational
# tricks: n and k are exact int64 aggregates, z is an injected literal, the
# interval formula is one shared expression string evaluated in identical
# order, and IEEE sqrt is correctly rounded in both engines — so the bounds
# are bit-identical doubles.  (Normal-approximation "Wald" bounds misbehave
# at k≈0/k≈n; Wilson is the form A/B dashboards actually ship.)
AB_WILSON_Z = "1.959963984540054"  # Phi^-1(0.975), double literal
_ABW = {
    "p": "(CAST(k AS DOUBLE) / CAST(n AS DOUBLE))",
    "z": f"CAST('{AB_WILSON_Z}' AS DOUBLE)",
    "nd": "CAST(n AS DOUBLE)",
}
_ABW_DENOM = "(1.0 + ({z} * {z}) / {nd})".format(**_ABW)
_ABW_CENTER = "({p} + ({z} * {z}) / (2.0 * {nd}))".format(**_ABW)
_ABW_HALF = (
    "({z} * SQRT(({p} * (1.0 - {p})) / {nd} "
    "+ ({z} * {z}) / (4.0 * {nd} * {nd})))"
).format(**_ABW)
# clamped to [0, 1]: Wilson is analytically inside the unit interval, but
# the fixed-order double arithmetic can overshoot by 1 ulp (observed
# 1.0000000000000002 at k = n); LEAST/GREATEST are deterministic in both
# engines
_ABW_LO = f"GREATEST(({_ABW_CENTER} - {_ABW_HALF}) / {_ABW_DENOM}, 0.0)"
_ABW_HI = f"LEAST(({_ABW_CENTER} + {_ABW_HALF}) / {_ABW_DENOM}, 1.0)"


@register(
    "ab_wilson_bounds",
    oracle=f"""
        WITH per_user AS (
          SELECT user_id,
                 CASE WHEN (((user_id % {AB_HASH_PREMOD}) * {AB_HASH_MULT}) % {AB_HASH_MOD}) < {AB_SPLIT_LT}
                      THEN 'A' ELSE 'B' END AS variant,
                 SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchases
          FROM events GROUP BY 1, 2
        ),
        counts AS (
          SELECT variant,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN purchases > 0 THEN 1 ELSE 0 END) AS BIGINT) AS k
          FROM per_user GROUP BY variant
        )
        SELECT variant, n AS users, k AS converters,
               {_ABW_LO} AS wilson_lo,
               {_ABW_HI} AS wilson_hi
        FROM counts
        """,
    doc="95% Wilson score interval per A/B variant — the statistically "
    "honest companion to ab_test_report's point-estimate permille: "
    "non-overlapping intervals mean the variants actually differ; Wilson "
    "(unlike Wald) stays inside [0,1] and behaves at k≈0/k≈n.  Same "
    "deterministic multiplicative-hash assignment and the same two hash "
    "aggregates (per-user, then 2-row per-variant); the interval math is "
    "one shared expression over exact int64 (n, k) with an injected "
    "z-literal — fixed-order double arithmetic and correctly-rounded "
    "IEEE sqrt make both engines' bounds bit-identical.  At 100 TB the "
    "readout still shuffles only per-user rows.",
    tags=("agg", "experimentation", "statistics", "added-r13"),
)
def ab_wilson_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy(
        "user_id",
        F.expr(
            f"CASE WHEN (((user_id % {AB_HASH_PREMOD}) * {AB_HASH_MULT}) % {AB_HASH_MOD}) < {AB_SPLIT_LT} "
            "THEN 'A' ELSE 'B' END"
        ).alias("variant"),
    ).agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "purchases"
        )
    )
    counts = per_user.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("purchases") > 0, 1).otherwise(0))
        .cast("long")
        .alias("k"),
    )
    return counts.selectExpr(
        "variant",
        "n AS users",
        "k AS converters",
        f"{_ABW_LO} AS wilson_lo",
        f"{_ABW_HI} AS wilson_hi",
    )


# ---------------------------------------------------------------------------
# Benford first-digit audit: data-forensics profile of order totals
# ---------------------------------------------------------------------------
# Fabricated or unit-mangled monetary data drifts from Benford's law; the
# first-digit histogram plus each digit's chi-square contribution is the
# standard forensic screen.  The digit comes from the STRING form of the
# exact integer floor (no float log10 anywhere); expected proportions
# log10(1 + 1/d) are Python-precomputed double literals injected as
# strings, and the chi-square contribution runs in fixed-order double off
# exact integer counts — bit-identical in both engines.
_BENFORD_P = {d: repr(__import__("math").log10(1 + 1 / d)) for d in range(1, 10)}
_BENFORD_P_CASE = "CASE " + " ".join(
    f"WHEN digit = {d} THEN CAST('{p}' AS DOUBLE)" for d, p in _BENFORD_P.items()
) + " END"


@register(
    "benford_price_audit",
    oracle=f"""
        WITH digits AS (
          SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                      AS BIGINT) AS digit
          FROM orders
          WHERE o_totalprice >= 1 AND o_totalprice < CAST('1e15' AS DOUBLE)
        ),
        counts AS (
          SELECT digit, COUNT(*) AS observed FROM digits GROUP BY digit
        ),
        tot AS (SELECT SUM(observed) AS n FROM counts)
        SELECT digit, CAST(observed AS BIGINT) AS observed,
               CAST(FLOOR(({_BENFORD_P_CASE}) * 1000000.0) AS BIGINT) AS expected_ppm,
               ((CAST(observed AS DOUBLE) - CAST(n AS DOUBLE) * ({_BENFORD_P_CASE}))
                * (CAST(observed AS DOUBLE) - CAST(n AS DOUBLE) * ({_BENFORD_P_CASE})))
               / (CAST(n AS DOUBLE) * ({_BENFORD_P_CASE})) AS chi_contrib
        FROM counts CROSS JOIN tot
        """,
    doc="Benford first-digit forensic audit of order totals: the observed "
    "leading-digit histogram against log10(1+1/d) expectations, with each "
    "digit's chi-square contribution — the standard screen for fabricated "
    "or unit-mangled monetary columns before they poison downstream "
    "revenue aggregates.  The digit derives from the STRING form of the "
    "exact integer floor (no float log10 in the extraction), bounded to "
    "the documented measure envelope [1, 1e15) so the int64 floor is "
    "TOTAL — poisoned 1e35 / NaN / Inf prices (hostile-sweep finding, "
    "round 14) are excluded identically in both engines (NaN and +Inf "
    "fail the upper bound in both); expectations "
    "are Python-precomputed double literals, so the fixed-order "
    "chi-square arithmetic is bit-identical in both engines.  ONE scan, "
    "one 9-row aggregate, a 1-row total broadcast — the same shape at "
    "any corpus size.  (The synthetic uniform prices FAIL Benford "
    "loudly — large chi contributions are the expected, correct output "
    "here; the operator is the screen, not a pass asserter.)",
    tags=("agg", "statistics", "dq", "added-r13"),
)
def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    digits = orders.filter(
        "o_totalprice >= 1 AND o_totalprice < CAST('1e15' AS DOUBLE)"
    ).select(
        F.expr(
            "CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS STRING), 1, 1) AS BIGINT)"
        ).alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("observed"))
    tot = counts.agg(F.sum("observed").alias("n"))
    return counts.crossJoin(F.broadcast(tot)).selectExpr(
        "digit",
        "CAST(observed AS BIGINT) AS observed",
        f"CAST(FLOOR(({_BENFORD_P_CASE}) * 1000000.0) AS BIGINT) AS expected_ppm",
        f"((CAST(observed AS DOUBLE) - CAST(n AS DOUBLE) * ({_BENFORD_P_CASE}))"
        f" * (CAST(observed AS DOUBLE) - CAST(n AS DOUBLE) * ({_BENFORD_P_CASE})))"
        f" / (CAST(n AS DOUBLE) * ({_BENFORD_P_CASE})) AS chi_contrib",
    )
