"""Temporal / ordered-semantics queries: as-of join, range join,
sessionization, CUBE.

These extend the reference's per-key ordered-processing surface
(part5/OrderedStreamGenerator.scala:137-161: per-key arrival order is the
only temporal guarantee) into the declarative temporal operators a Spark
engine owes its users.  The as-of oracle uses DuckDB's native ASOF JOIN —
an implementation-independent check of our union+window construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_pekko_streams_example_spark.functions.numeric import dsum, sql_dsum
from pulsar_pekko_streams_example_spark.operators import temporal
from pulsar_pekko_streams_example_spark.plans.registry import register
from pulsar_pekko_streams_example_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# As-of join: each error event → most recent prior click of the same user
# ---------------------------------------------------------------------------
@register(
    "asof_last_click",
    oracle="""
        WITH err AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'),
             clk AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
        SELECT e.event_id, e.user_id,
               c.value AS last_click_value,
               CAST(epoch_us(e.ts) - epoch_us(c.ts) AS DOUBLE) / 1000000.0 AS gap_s
        FROM err e ASOF LEFT JOIN clk c ON e.user_id = c.user_id AND e.ts >= c.ts
        """,
    doc="As-of join (union + ordered window carry-forward, one shuffle — no "
    "inequality nested-loop join): for each error, the latest click of the "
    "same user at or before it.  Oracle is DuckDB's native ASOF JOIN.",
    tags=("temporal", "asof"),
)
def asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clk = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = temporal.asof_join_last(err, clk, "user_id", "ts", ["value"])
    gap = (
        (F.unix_micros("ts") - F.unix_micros("asof_ts")).cast("double")
        / F.lit(1_000_000.0)
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_value").alias("last_click_value"),
        gap.alias("gap_s"),
    )


# ---------------------------------------------------------------------------
# Range join: events within 10 minutes after each error, same user
# ---------------------------------------------------------------------------
@register(
    "range_following_counts",
    oracle=f"""
        WITH err AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error')
        SELECT e.event_id, e.user_id, COUNT(v.ts) AS following_events
        FROM err e LEFT JOIN events v
          ON v.user_id = e.user_id
         AND epoch_us(v.ts) > epoch_us(e.ts)
         AND epoch_us(v.ts) <= epoch_us(e.ts) + {temporal.RANGE_WINDOW_S * 1_000_000}
        GROUP BY e.event_id, e.user_id
        """,
    doc="Interval range join via time-bucketed equi-join (×2 bucket fan-out, "
    "no inequality nested loop): activity of the same user in the 10 minutes "
    "after each error.",
    tags=("temporal", "range-join"),
)
def range_following_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    return temporal.range_count_following(err, ev, "user_id", "ts")


# ---------------------------------------------------------------------------
# Sessionization: 30-minute-gap sessions per user
# ---------------------------------------------------------------------------
@register(
    "user_sessions",
    oracle=f"""
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {temporal.SESSION_GAP_S * 1_000_000}
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
          SELECT user_id,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
          FROM flagged
        ),
        per_sess AS (SELECT user_id, session_id, COUNT(*) AS n FROM sess GROUP BY 1, 2)
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS sessions,
               CAST(SUM(n) AS BIGINT) AS events,
               CAST(MAX(n) AS BIGINT) AS max_session_events
        FROM per_sess GROUP BY user_id
        """,
    doc="Gap-based sessionization (lag flag + running sum, one partitioning, "
    "zero joins); batch twin of Structured Streaming's session_window().",
    tags=("temporal", "session"),
)
def user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sess = temporal.sessionize(ev, "user_id", "ts")
    per_sess = sess.groupBy("user_id", "session_id").agg(F.count(F.lit(1)).alias("n"))
    return per_sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("sessions"),
        F.sum("n").alias("events"),
        F.max("n").alias("max_session_events"),
    )


# ---------------------------------------------------------------------------
# CUBE: all grouping-set rollups of (event_type, hour)
# ---------------------------------------------------------------------------
@register(
    "cube_event_stats",
    oracle=f"""
        SELECT COALESCE(event_type, 'ALL') AS event_type,
               COALESCE(event_hour, -1) AS event_hour,
               COUNT(*) AS events,
               {sql_dsum('value')} AS total_value
        FROM (SELECT event_type, CAST(hour(ts) AS INT) AS event_hour, value FROM events)
        GROUP BY CUBE(event_type, event_hour)
        """,
    doc="CUBE over (event_type, hour): all four grouping sets in one pass "
    "(Spark expands to a single shuffle with grouping-id).",
    tags=("agg", "cube"),
)
def cube_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").cast("int").alias("event_hour"), "value"
    )
    return (
        ev.cube("event_type", "event_hour")
        .agg(F.count(F.lit(1)).alias("events"), dsum("value").alias("total_value"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("event_hour", F.lit(-1)).alias("event_hour"),
            "events",
            "total_value",
        )
    )


# ---------------------------------------------------------------------------
# PIVOT: daily event counts, one column per event type
# ---------------------------------------------------------------------------
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "pivot_daily_event_counts",
    oracle=f"""
        SELECT CAST(ts AS DATE) AS day,
               {', '.join(f"COALESCE(COUNT(*) FILTER (event_type = '{t}'), 0) AS {t}"
                          for t in EVENT_TYPES)}
        FROM events GROUP BY 1
        """,
    doc="PIVOT reshaping: one row per day, one column per event type "
    "(explicit value list so the output schema is static — the only sane "
    "form at scale; Spark plans it as a single conditional aggregate, no "
    "second pass to discover values).",
    tags=("reshape", "pivot"),
)
def pivot_daily_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0, list(EVENT_TYPES))
    )


# ---------------------------------------------------------------------------
# UNPIVOT/melt: wide lineitem measures → long (metric, value) form
# ---------------------------------------------------------------------------
UNPIVOT_METRICS = ("l_quantity", "l_discount", "l_tax")

# Measure envelope for the melted totals: a |value| beyond 1e9 is garbage for
# these per-line measures (quantity/discount/tax) and would push the decimal
# total past 2^53 micro-units, where DECIMAL->DOUBLE conversion is no longer
# bit-identical across engines (DuckDB converts int128 to double BEFORE the
# scale division — two roundings; Spark rounds once.  A 1e20 summand made the
# engines disagree by 1 ULP — round-7 sweep finding).  NaN/Inf/NULL carry no
# total signal either; all of them contribute NULL, identically in both
# dialects, while COUNT(*) still counts the row.
_MEASURE_GUARD = (
    "CASE WHEN value IS NULL OR isnan(value) OR abs(value) > 1000000000.0 "
    "THEN CAST(NULL AS DOUBLE) ELSE value END"
)


@register(
    "unpivot_lineitem_measures",
    oracle=f"""
        WITH long AS (
          {' UNION ALL '.join(
              f"SELECT '{m}' AS metric, {m} AS value FROM lineitem"
              for m in UNPIVOT_METRICS)}
        )
        SELECT metric, COUNT(*) AS n, {sql_dsum(_MEASURE_GUARD)} AS total
        FROM long GROUP BY metric
        """,
    doc="UNPIVOT (melt): wide measure columns to long (metric, value) rows — "
    "Spark's unpivot expands in-place in the scan stage (no shuffle added); "
    "aggregated back down so the driver compares a 3-row result.",
    tags=("reshape", "unpivot"),
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    long = l.unpivot(
        ids=[], values=list(UNPIVOT_METRICS), variableColumnName="metric",
        valueColumnName="value",
    )
    return long.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n"), dsum(F.expr(_MEASURE_GUARD)).alias("total")
    )


# ---------------------------------------------------------------------------
# Native session_window — cross-checked against the first-principles oracle
# ---------------------------------------------------------------------------
@register(
    "session_window_native",
    oracle=f"""
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {temporal.SESSION_GAP_S * 1_000_000}
                      THEN 1 ELSE 0 END AS new_s
          FROM events
          WHERE ts IS NOT NULL  -- session_window drops timeless rows; mirror it
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sess AS (
          SELECT user_id, ts,
                 SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
          FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL '{temporal.SESSION_GAP_S} seconds' AS session_end,
               COUNT(*) AS n
        FROM sess GROUP BY user_id, session_id
        """,
    doc="Spark's NATIVE session_window aggregation (the streaming-capable "
    "session operator, batch mode) cross-checked against the hand-derived "
    "lag/cumsum session oracle — the two constructions must agree exactly.",
    tags=("temporal", "session"),
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window("ts", f"{temporal.SESSION_GAP_S} seconds").alias("sw"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n",
        )
    )


# ---------------------------------------------------------------------------
# Cohort retention: users grouped by first-activity day, tracked by offset
# ---------------------------------------------------------------------------
_DAY_US = 86_400_000_000


@register(
    "cohort_retention",
    oracle=f"""
        WITH activity AS (
          SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events
        ),
        cohorts AS (
          SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
        ),
        sizes AS (
          SELECT cohort_day, COUNT(*) AS cohort_users FROM cohorts GROUP BY cohort_day
        ),
        joined AS (
          SELECT c.cohort_day, a.day - c.cohort_day AS offset_days, a.user_id
          FROM activity a JOIN cohorts c ON a.user_id = c.user_id
        ),
        ret AS (
          SELECT cohort_day, offset_days, COUNT(*) AS active_users
          FROM joined GROUP BY cohort_day, offset_days
        )
        SELECT r.cohort_day, r.offset_days, r.active_users, s.cohort_users,
               CAST((r.active_users * 1000) // s.cohort_users AS BIGINT)
                 AS retention_permille
        FROM ret r JOIN sizes s ON r.cohort_day = s.cohort_day
        """,
    doc="Cohort retention — the event-analytics staple: users grouped by "
    "first-activity day, activity tracked at day offsets from it, retention "
    "as an integer permille (no float thresholds).  Dataflow: distinct "
    "(user, day) activity → per-user MIN(day) cohort → join back on user → "
    "(cohort, offset) counts → join the (tiny, broadcast) cohort sizes.  "
    "Two shuffles on user_id (distinct + cohort agg share partitioning via "
    "exchange reuse) + one on cohort_day; at 100 TB the activity distinct "
    "is the dominant shuffle and prunes to (user_id, day) pairs only.",
    tags=("temporal", "cohort", "retention"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.expr(f"unix_micros(ts) div {_DAY_US}").alias("day")
    ).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sizes = cohorts.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("cohort_users"))
    joined = activity.join(cohorts, ["user_id"]).select(
        "cohort_day", (F.col("day") - F.col("cohort_day")).alias("offset_days"), "user_id"
    )
    ret = joined.groupBy("cohort_day", "offset_days").agg(
        F.count(F.lit(1)).alias("active_users")
    )
    return ret.join(F.broadcast(sizes), ["cohort_day"]).select(
        "cohort_day",
        "offset_days",
        "active_users",
        "cohort_users",
        F.expr("CAST((active_users * 1000) div cohort_users AS BIGINT)").alias(
            "retention_permille"
        ),
    )


# ---------------------------------------------------------------------------
# Ordered funnel conversion: view → click → purchase, strictly in order
# ---------------------------------------------------------------------------
FUNNEL_STEP_US = 24 * 3_600_000_000  # each step must follow within 24 h


@register(
    "funnel_conversion",
    oracle=f"""
        WITH s1 AS (
          SELECT user_id, MIN(epoch_us(ts)) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ),
        s2 AS (
          SELECT e.user_id, MIN(epoch_us(e.ts)) AS t2
          FROM events e JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.t1
            AND epoch_us(e.ts) <= s1.t1 + {FUNNEL_STEP_US}
          GROUP BY e.user_id
        ),
        s3 AS (
          SELECT e.user_id, MIN(epoch_us(e.ts)) AS t3
          FROM events e JOIN s2 ON e.user_id = s2.user_id
          WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
            AND epoch_us(e.ts) <= s2.t2 + {FUNNEL_STEP_US}
          GROUP BY e.user_id
        )
        SELECT * FROM (
          SELECT CAST(1 AS BIGINT) AS stage, 'view' AS step,
                 (SELECT COUNT(*) FROM s1) AS users
          UNION ALL
          SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
          UNION ALL
          SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
        ) t
        """,
    doc="Ordered funnel analysis — the other event-analytics staple next to "
    "cohort_retention: users counted at each stage only if the stage event "
    "happens STRICTLY AFTER their previous stage's first occurrence and "
    "within a 24-hour step window (view → click → purchase).  Each stage is a filtered MIN-aggregate "
    "joined to the previous stage's (small) user set — the user table "
    "shrinks monotonically down the funnel, so at 100 TB stages 2+ are "
    "joins against an ever-smaller broadcastable frontier, and the event "
    "scan's type filter pushes to parquet.",
    tags=("temporal", "funnel"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(us).alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, ["user_id"])
        .filter((us > F.col("t1")) & (us <= F.col("t1") + FUNNEL_STEP_US))
        .groupBy("user_id")
        .agg(F.min(us).alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, ["user_id"])
        .filter((us > F.col("t2")) & (us <= F.col("t2") + FUNNEL_STEP_US))
        .groupBy("user_id")
        .agg(F.min(us).alias("t3"))
    )
    rows = [
        s1.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(1).cast("bigint").alias("stage"), F.lit("view").alias("step"), "users"
        ),
        s2.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(2).cast("bigint").alias("stage"), F.lit("click").alias("step"), "users"
        ),
        s3.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(3).cast("bigint").alias("stage"), F.lit("purchase").alias("step"), "users"
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


# ---------------------------------------------------------------------------
# Upsert compaction: latest-record-wins current-state table
# ---------------------------------------------------------------------------
@register(
    "events_latest_state",
    oracle="""
        SELECT user_id, ts AS last_ts, event_type AS last_type,
               value AS last_value, n_events
        FROM (
          SELECT user_id, ts, event_type, value,
                 COUNT(*) OVER (PARTITION BY user_id) AS n_events,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events
        ) t WHERE rn = 1
        """,
    doc="CDC upsert compaction — latest-record-wins current state per key "
    "(the MERGE INTO / changelog-compaction shape): one shuffle on the key, "
    "row_number argmax with the (ts, event_id) total order making ties "
    "deterministic.  At scale this is the periodic compaction of an append "
    "log into a keyed state table; AQE handles per-key skew in the single "
    "window exchange.",
    tags=("temporal", "upsert"),
)
def events_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    wc = Window.partitionBy("user_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .withColumn("n_events", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.col("value").alias("last_value"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# Behavioral sequence mining: path signatures + transition matrix
# ---------------------------------------------------------------------------
PATH_MAX_STEPS = 10


@register(
    "user_path_signatures",
    oracle=f"""
        WITH ranked AS (
          SELECT user_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events
        ),
        paths AS (
          SELECT user_id,
                 string_agg(event_type, '>' ORDER BY rn) AS path
          FROM ranked WHERE rn <= {PATH_MAX_STEPS}
          GROUP BY user_id
        )
        SELECT path, COUNT(*) AS n_users FROM paths GROUP BY path
        """,
    doc="User journey signatures: each user's first 10 events in (ts, "
    "event_id) total order collapse to one '>'-joined path string, then "
    "paths aggregate to their population counts — the funnel-discovery "
    "complement of the fixed-order funnel_conversion.  The step cap bounds "
    "state per user at any history length; one shuffle on user_id, one on "
    "the path.",
    tags=("temporal", "sequence"),
)
def user_path_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PATH_MAX_STEPS)
        .select("user_id", "event_type", "rn")
    )
    paths = ranked.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda s: s["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "event_transition_matrix",
    oracle="""
        WITH seq AS (
          SELECT user_id, event_type,
                 LAG(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_type
          FROM events
        ),
        trans AS (
          SELECT prev_type AS from_type, event_type AS to_type, COUNT(*) AS n
          FROM seq WHERE prev_type IS NOT NULL
          GROUP BY 1, 2
        )
        SELECT from_type, to_type, n,
               CAST(1000 * n // SUM(n) OVER (PARTITION BY from_type)
                    AS BIGINT) AS permille
        FROM trans
        """,
    doc="First-order Markov transition matrix over per-user event streams: "
    "lag window in (ts, event_id) total order -> transition hash agg -> "
    "integer-permille row normalization (window over the TYPE pairs, not "
    "the events).  The sequence-model features a next-event predictor "
    "trains on; one shuffle on user_id, aggregates shrink to |types|^2.",
    tags=("temporal", "sequence"),
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(w).alias("from_type"),
    ).filter(F.col("from_type").isNotNull())
    trans = seq.groupBy("from_type", F.col("event_type").alias("to_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    trans = trans.withColumn(
        "tot", F.sum("n").over(Window.partitionBy("from_type"))
    )
    return trans.select(
        "from_type",
        "to_type",
        "n",
        F.expr("CAST((1000 * n) div tot AS BIGINT)").alias("permille"),
    )


# ---------------------------------------------------------------------------
# Windowed dedup: first occurrence per (user, type) within each hour wins
# ---------------------------------------------------------------------------
_DEDUP_WIN_US = 3_600_000_000  # 1-hour tumbling dedup window


@register(
    "windowed_first_dedup",
    oracle=f"""
        WITH keyed AS (
          SELECT event_type, user_id,
                 epoch_us(ts) // {_DEDUP_WIN_US} AS win,
                 ROW_NUMBER() OVER (
                   PARTITION BY user_id, event_type, epoch_us(ts) // {_DEDUP_WIN_US}
                   ORDER BY epoch_us(ts), event_id) AS rn
          FROM events
        )
        SELECT event_type,
               CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept,
               CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dropped
        FROM keyed GROUP BY event_type
        """,
    doc="Time-windowed dedup — the batch twin of streaming "
    "dropDuplicatesWithinWatermark: within each 1-hour tumbling window, the "
    "FIRST (ts, event_id) occurrence of a (user, event_type) key survives, "
    "later ones are duplicates.  The dedup key (user, type, window) is "
    "fine-grained — millions of small groups, so the ROW_NUMBER partition "
    "never concentrates; state per key is bounded by the window, exactly "
    "the property that lets the streaming form expire state at the "
    "watermark.  Output is the per-type keep/drop ledger.",
    tags=("dedup", "event-time", "window", "added-r3"),
)
def windowed_first_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    win = F.expr(f"unix_micros(ts) div {_DEDUP_WIN_US}")
    w = Window.partitionBy("user_id", "event_type", "win").orderBy(
        F.expr("unix_micros(ts)"), "event_id"
    )
    keyed = ev.select("event_type", "user_id", win.alias("win"), "ts", "event_id")
    rn = keyed.withColumn("rn", F.row_number().over(w))
    return rn.groupBy("event_type").agg(
        F.sum(F.when(F.col("rn") == 1, 1).otherwise(0)).cast("long").alias("kept"),
        F.sum(F.when(F.col("rn") > 1, 1).otherwise(0)).cast("long").alias("dropped"),
    )


# ---------------------------------------------------------------------------
# Half-life decayed user value: recency-weighted scoring in exact integers
# ---------------------------------------------------------------------------
_WEEK_US = 7 * 86_400_000_000
_DECAY_CAP = 40  # cap the shift so the divisor stays well inside int64
# Exact-integer envelope for the micro-unit value (cf. MAD_CLAMP in
# analytic_queries): a value above 1e9 clamps to 1e15 micros (9.2e18/1e15 ≈
# 9200 max-clamped events per user before the int64 SUM could overflow — the
# documented per-user budget); NEGATIVE values floor to 0 (the score is a
# magnitude by contract — that alone justifies the clamp; both engines'
# integer division truncates toward zero, cf. orders_yoy_growth); NaN/NULL values carry no
# magnitude and contribute NULL (excluded from sums, counted in n_events).
# Spark's floor(double)->LONG would otherwise SILENTLY saturate (NaN->0,
# 1e41->int64 max) while DuckDB's CAST errors — the explicit CASE replaces
# both behaviors with one engine-identical contract.
_DECAY_CLAMP = "1000000000.0"  # 1e9, double literal
_DECAY_CLAMP_VI = 1_000_000_000_000_000  # 1e15 = clamp * 1e6, exact int64
_DECAY_VI = (
    "CASE WHEN value IS NULL OR isnan(value) THEN CAST(NULL AS BIGINT) "
    f"WHEN value > {_DECAY_CLAMP} THEN CAST({_DECAY_CLAMP_VI} AS BIGINT) "
    "WHEN value < 0 THEN CAST(0 AS BIGINT) "
    "ELSE CAST(FLOOR(value * CAST(1000000 AS DOUBLE)) AS BIGINT) END"
)


@register(
    "decayed_user_value",
    oracle=f"""
        WITH mx AS (SELECT MAX(epoch_us(ts)) AS max_us FROM events),
        scored AS (
          SELECT user_id,
                 {_DECAY_VI} AS value_micro,
                 LEAST((mx.max_us - epoch_us(ts)) // {_WEEK_US}, {_DECAY_CAP}) AS age_weeks
          FROM events CROSS JOIN mx
        )
        SELECT user_id,
               COUNT(*) AS n_events,
               CAST(SUM(value_micro) AS BIGINT) AS value_micro_sum,
               CAST(SUM(value_micro // (CAST(1 AS BIGINT) << age_weeks)) AS BIGINT)
                 AS decayed_micro_sum
        FROM scored GROUP BY user_id
        """,
    doc="Recency-weighted user value with a one-week half-life — the "
    "engagement-scoring / churn-feature shape.  Powers of two ONLY: the "
    "decay factor 2^-age_weeks is an integer right-shift of the micro-unit "
    "value, so the whole scoring pipeline is exact int64 arithmetic — no "
    "pow(), no per-engine float exponentiation drift — and the aggregate "
    "is map-side combinable.  The reference anchor (age relative to the "
    "corpus max event time) is one broadcast scalar row.",
    tags=("event-time", "scoring", "agg", "added-r3"),
)
def decayed_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # _DECAY_VI: the explicit micro-unit envelope (clamp/zero-floor/NaN
    # exclusion) — identical CASE text in both dialects, see the constant.
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.expr("MAX(unix_micros(ts))").alias("max_us"))
    scored = ev.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.expr(_DECAY_VI).alias("value_micro"),
        F.expr(
            f"LEAST((max_us - unix_micros(ts)) div {_WEEK_US}, {_DECAY_CAP})"
        ).alias("age_weeks"),
    )
    return scored.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value_micro").cast("long").alias("value_micro_sum"),
        F.expr(
            "CAST(SUM(value_micro div shiftleft(CAST(1 AS BIGINT), CAST(age_weeks AS INT))) AS BIGINT)"
        ).alias("decayed_micro_sum"),
    )


# ---------------------------------------------------------------------------
# SCD Type-2 interval construction — per-user state history from an event log
# ---------------------------------------------------------------------------
@register(
    "scd2_state_intervals",
    oracle="""
        WITH seq AS (
          SELECT user_id, ts, event_id, event_type,
                 LAG(event_type) OVER w AS prev_type,
                 MAX(ts) OVER (PARTITION BY user_id) AS user_max
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        starts AS (
          SELECT user_id, ts, event_id, event_type, user_max FROM seq
          WHERE prev_type IS NULL OR prev_type <> event_type
        ),
        iv AS (
          SELECT event_type,
                 epoch_us(COALESCE(
                   LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   user_max)) - epoch_us(ts) AS dwell_us
          FROM starts
        )
        SELECT event_type, COUNT(*) AS n_intervals,
               CAST(SUM(dwell_us) AS DOUBLE) / 1000000.0 AS total_dwell_s
        FROM iv GROUP BY event_type
        """,
    doc="Slowly-changing-dimension Type-2 interval construction from an "
    "append-only event log: per user, each run of equal event_type "
    "collapses to one validity interval [change_ts, next_change_ts) — the "
    "standard 'current state history' materialization a warehouse derives "
    "from a CDC feed.  One shuffle on user_id feeds all three window "
    "passes (lag change detection, per-user max close-off, lead interval "
    "end); dwell accumulates as exact int64 microseconds with a single "
    "final division.  The reference's per-key ordered semantics "
    "(part5/OrderedStreamGenerator.scala:137-161) is the streaming twin "
    "of this batch construction.",
    tags=("temporal", "window", "scd2", "added-r3"),
)
def scd2_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.max("ts").over(Window.partitionBy("user_id")).alias("user_max"),
    )
    starts = seq.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    end_ts = F.coalesce(F.lead("ts").over(w), F.col("user_max"))
    iv = starts.select(
        "event_type",
        (F.unix_micros(end_ts) - F.unix_micros(F.col("ts"))).alias("dwell_us"),
    )
    return iv.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        (F.sum("dwell_us").cast("double") / F.lit(1_000_000.0)).alias("total_dwell_s"),
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution — linear credit over the 24h pre-purchase window
# ---------------------------------------------------------------------------
ATTRIB_WINDOW_US = 86_400_000_000  # 24h lookback


@register(
    "linear_attribution",
    oracle=f"""
        WITH purchases AS (
          SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us
          FROM events WHERE event_type = 'purchase'
        ),
        clicks AS (
          -- json_valid + TRY_CAST: a malformed props payload or non-numeric
          -- k (the string 'NaN') attributes to campaign NULL instead of
          -- aborting the job (round-6 sweep finding; Spark twin: try_cast)
          SELECT user_id, epoch_us(ts) AS c_us,
                 CASE WHEN json_valid(props)
                      THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                      END AS campaign
          FROM events WHERE event_type = 'click'
        ),
        touches AS (
          SELECT p.p_id, c.campaign,
                 COUNT(*) OVER (PARTITION BY p.p_id) AS n_touches
          FROM purchases p
          JOIN clicks c
            ON p.user_id = c.user_id
           AND c.c_us <= p.p_us
           AND c.c_us > p.p_us - {ATTRIB_WINDOW_US}
        )
        SELECT campaign,
               CAST(COUNT(*) AS BIGINT) AS touches,
               CAST(SUM(1000 // n_touches) AS BIGINT) AS credit_milli
        FROM touches GROUP BY campaign
        """,
    doc="Linear multi-touch attribution: every click in the 24h window "
    "before a purchase shares the conversion credit equally (integer "
    "milli-credit 1000 div n — deterministic under any summation "
    "order), aggregated per campaign (the props.k payload field).  The "
    "touch join is an equi-join on user_id with the window as a pushed "
    "residual predicate — per-user fan-out is bounded by the 24h "
    "window, never a time-unbounded cross of a user's history; the "
    "per-purchase touch count is a window over p_id (hash-partitioned "
    "by purchase, no global sort).  The reference's delivery semantics "
    "track hops mechanically (part1/MessageEnvelope.scala); this is the "
    "analytical twin — credit assignment across a causal event chain.",
    tags=("temporal", "attribution", "window", "added-r3"),
)
def linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.unix_micros("ts").alias("p_us"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.unix_micros("ts").alias("c_us"),
        F.get_json_object(F.col("props"), "$.k").try_cast("long").alias("campaign"),
    )
    touches = (
        purchases.join(clicks, "user_id")
        .filter(
            (F.col("c_us") <= F.col("p_us"))
            & (F.col("c_us") > F.col("p_us") - F.lit(ATTRIB_WINDOW_US))
        )
        .select(
            "p_id",
            "campaign",
            F.count(F.lit(1)).over(Window.partitionBy("p_id")).alias("n_touches"),
        )
    )
    return touches.groupBy("campaign").agg(
        F.count(F.lit(1)).alias("touches"),
        F.sum(F.expr("1000 div n_touches")).alias("credit_milli"),
    )


# ---------------------------------------------------------------------------
# Cohort LTV curve: cumulative revenue per acquisition cohort by year offset
# ---------------------------------------------------------------------------
# Total cents ledger for the LTV curve (cf. analytic_queries._YOY_CENTS):
# revenue is a magnitude, so NULL/NaN prices contribute NULL (excluded),
# negatives floor to 0, and a price above 1e12 clamps to 1e14 cents instead
# of letting the BIGINT cast abort (DuckDB errors on inf/1e35·100 -> int64;
# Spark ANSI can overflow the yearly SUM) — round-7 sweep finding.  Identical
# CASE text in both dialects.
_LTV_CENTS = (
    "CASE WHEN o_totalprice IS NULL OR isnan(o_totalprice) "
    "THEN CAST(NULL AS BIGINT) "
    "WHEN o_totalprice > 1000000000000.0 THEN CAST(100000000000000 AS BIGINT) "
    "WHEN o_totalprice < 0 THEN CAST(0 AS BIGINT) "
    "ELSE CAST(FLOOR(o_totalprice * CAST(100 AS DOUBLE)) AS BIGINT) END"
)


@register(
    "cohort_ltv_curve",
    oracle=f"""
        WITH cohorts AS (
          SELECT o_custkey, MIN(year(o_orderdate)) AS cohort_yr
          FROM orders GROUP BY o_custkey
        ),
        facts AS (
          -- dateless orders have no offset position (and a NULL offset_yrs
          -- would order NULLS FIRST in Spark's cumulative window but NULLS
          -- LAST in DuckDB's) — they carry no cohort-curve signal; drop them
          SELECT c.cohort_yr,
                 year(o.o_orderdate) - c.cohort_yr AS offset_yrs,
                 {_LTV_CENTS} AS cents
          FROM orders o JOIN cohorts c ON o.o_custkey = c.o_custkey
          WHERE o.o_orderdate IS NOT NULL
        ),
        rev AS (
          SELECT cohort_yr, offset_yrs, CAST(SUM(cents) AS BIGINT) AS rev_cents
          FROM facts GROUP BY 1, 2
        ),
        sizes AS (
          SELECT cohort_yr, COUNT(*) AS customers FROM cohorts GROUP BY 1
        )
        SELECT CAST(r.cohort_yr AS BIGINT) AS cohort_yr,
               CAST(r.offset_yrs AS BIGINT) AS offset_yrs,
               s.customers,
               CAST(SUM(r.rev_cents) OVER (PARTITION BY r.cohort_yr
                                           ORDER BY r.offset_yrs) AS BIGINT)
                 AS cum_rev_cents,
               CAST(SUM(r.rev_cents) OVER (PARTITION BY r.cohort_yr
                                           ORDER BY r.offset_yrs)
                    // s.customers AS BIGINT) AS ltv_cents_per_customer
        FROM rev r JOIN sizes s ON r.cohort_yr = s.cohort_yr
        """,
    doc="Customer-lifetime-value curve per acquisition cohort: cumulative "
    "revenue by years-since-first-order, normalized per cohort customer.  "
    "PRE-AGGREGATE THEN WINDOW: the per-customer cohort table and the "
    "order facts share one o_custkey shuffle (co-partitioned equi-join), "
    "collapse to |cohorts| x |offsets| exact-integer-cents rows, and only "
    "THAT bounded table sees the cumulative window — the window input "
    "never scales with order count.  Cohort sizes join back as a "
    "cohort-count-sized side (AQE broadcasts it).  All arithmetic is "
    "integer cents with a single integer division per output row.",
    tags=("window", "cohort", "agg", "added-r3b"),
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cohorts = orders.groupBy("o_custkey").agg(
        F.expr("MIN(year(o_orderdate))").alias("cohort_yr")
    )
    facts = (
        orders.filter(F.col("o_orderdate").isNotNull())
        .join(cohorts, "o_custkey")
        .select(
            "cohort_yr",
            F.expr("year(o_orderdate) - cohort_yr").alias("offset_yrs"),
            F.expr(_LTV_CENTS).alias("cents"),
        )
    )
    rev = facts.groupBy("cohort_yr", "offset_yrs").agg(
        F.sum("cents").cast("long").alias("rev_cents")
    )
    sizes = cohorts.groupBy("cohort_yr").agg(F.count(F.lit(1)).alias("customers"))
    w = Window.partitionBy("cohort_yr").orderBy("offset_yrs")
    return (
        rev.join(sizes, "cohort_yr")
        .withColumn("cum_rev_cents", F.sum("rev_cents").over(w).cast("long"))
        .select(
            F.col("cohort_yr").cast("long").alias("cohort_yr"),
            F.col("offset_yrs").cast("long").alias("offset_yrs"),
            "customers",
            "cum_rev_cents",
            F.expr("CAST(cum_rev_cents div customers AS BIGINT)").alias(
                "ltv_cents_per_customer"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Point-in-time join: facts against the SCD2 state version valid at fact time
# ---------------------------------------------------------------------------
@register(
    "pit_state_revenue",
    oracle=f"""
        WITH changes AS (
          SELECT user_id, ts, event_type AS state
          FROM (
            SELECT user_id, ts, event_type,
                   LAG(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM events WHERE event_type <> 'purchase'
          )
          WHERE prev IS NULL OR prev <> event_type
        ),
        p AS (
          SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
        )
        SELECT COALESCE(c.state, 'none') AS state,
               COUNT(*) AS purchases,
               {sql_dsum('p.value')} AS revenue
        FROM p ASOF LEFT JOIN changes c
          ON p.user_id = c.user_id AND p.ts >= c.ts
        GROUP BY 1
        """,
    doc="Point-in-time (PIT) dimension join — the data-warehouse staple of "
    "joining facts to the dimension VERSION that was valid when the fact "
    "happened: each purchase is attributed to the user's behavioral state "
    "(latest non-purchase event-type change at purchase time, i.e. the "
    "SCD2 current-version lookup).  NO JOIN OPERATOR: state-change points "
    "and purchases union into one (user_id, ts, event_id)-ordered stream "
    "and a last(ignorenulls) running window carries the current state "
    "onto each fact row — one shuffle, the same union+window construction "
    "as the as-of join, against DuckDB's native ASOF JOIN as an "
    "implementation-independent oracle.  Revenue accumulates through "
    "DECIMAL(38,6).",
    tags=("temporal", "asof", "scd2", "scale-default", "added-r3b"),
)
def pit_state_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.filter(F.col("event_type") != "purchase")
        .withColumn("prev", F.lag("event_type").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .select(
            "user_id",
            "ts",
            "event_id",
            F.col("event_type").alias("state"),
            F.lit(None).cast("double").alias("value"),
            F.lit(0).alias("is_fact"),
        )
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("string").alias("state"),
        "value",
        F.lit(1).alias("is_fact"),
    )
    # is_fact between ts and event_id: at an equal-timestamp tie the state
    # change must sort BEFORE the purchase so the fact sees it — DuckDB's
    # ASOF ON p.ts >= c.ts attributes equal-ts changes unconditionally,
    # and (ts, event_id) order would hide a change carrying a higher id
    wc = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_fact", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = changes.unionByName(facts).withColumn(
        "cur_state", F.last("state", ignorenulls=True).over(wc)
    )
    return (
        carried.filter(F.col("is_fact") == 1)
        .groupBy(F.coalesce("cur_state", F.lit("none")).alias("state"))
        .agg(
            F.count(F.lit(1)).alias("purchases"),
            dsum("value").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Conversion latency histogram: first view -> first purchase, hour buckets
# ---------------------------------------------------------------------------
_HOUR_US = 3_600_000_000


@register(
    "conversion_latency_histogram",
    oracle=f"""
        WITH per_user AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v_us,
                 MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p_us
          FROM events GROUP BY user_id
        )
        SELECT CAST((p_us - v_us) // {_HOUR_US} AS BIGINT) AS latency_hours,
               COUNT(*) AS users
        FROM per_user
        WHERE v_us IS NOT NULL AND p_us IS NOT NULL AND p_us > v_us
        GROUP BY 1
        """,
    doc="Time-to-convert distribution: per user, the latency from FIRST "
    "view to FIRST purchase, bucketed into hours — the funnel-timing "
    "report behind every conversion-window decision (how long must "
    "attribution look back?).  ONE hash aggregate computes both "
    "per-user firsts as conditional MINs (no join between the two event "
    "subsets, no window), then a bounded histogram roll-up; all "
    "arithmetic is exact int64 microseconds.  Non-converters and "
    "purchase-before-view users drop out by the NULL/order filter.",
    tags=("temporal", "funnel", "agg", "scale-default", "added-r3b"),
)
def conversion_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(
            F.when(F.col("event_type") == "view", F.expr("unix_micros(ts)"))
        ).alias("v_us"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.expr("unix_micros(ts)"))
        ).alias("p_us"),
    )
    return (
        per_user.filter(
            F.col("v_us").isNotNull()
            & F.col("p_us").isNotNull()
            & (F.col("p_us") > F.col("v_us"))
        )
        .groupBy(
            F.expr(f"CAST((p_us - v_us) div {_HOUR_US} AS BIGINT)").alias(
                "latency_hours"
            )
        )
        .agg(F.count(F.lit(1)).alias("users"))
    )
