"""Core engine-semantics queries over the message-attempt ledger.

Each query is the batch-analytic form of a reference operator (SURVEY.md §2,
operator ids in parens).  Spark side = DataFrame API; oracle side = DuckDB SQL
over the identical ENVELOPE_CTE derivation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_pekko_streams_example_spark.envelope import ENVELOPE_CTE, attempts_ledger
from pulsar_pekko_streams_example_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from pulsar_pekko_streams_example_spark.plans.registry import register
from pulsar_pekko_streams_example_spark.sources.tables import load_table


def _env(sql: str) -> str:
    return f"WITH {ENVELOPE_CTE} {sql}"


# ---------------------------------------------------------------------------
# S1 + T1 + G2 + G7 — the flagship envelope-decode query (build plan M0)
# ---------------------------------------------------------------------------
@register(
    "envelope_decode_per_key",
    oracle=_env(
        """
        SELECT topic, key,
               COUNT(DISTINCT message_id) AS messages,
               MAX(seq) AS max_seq,
               MAX(num_publishes) AS max_hops
        FROM attempts
        WHERE status = 'success'
        GROUP BY topic, key
        """
    ),
    doc="S1/T1/G2/G7: decode envelope, keep terminal successes, per-key aggregate "
    "(reference: Message[T] consume part1/PulsarPekkoSource.scala:54-65 + hop "
    "counter util/PulsarClientSetup.scala:17).",
    tags=("envelope", "flagship"),
)
def envelope_decode_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    led = attempts_ledger(spark, sf_dir)
    return (
        led.filter(F.col("status") == "success")
        .groupBy("topic", "key")
        .agg(
            F.countDistinct("message_id").alias("messages"),
            F.max("seq").alias("max_seq"),
            F.max("num_publishes").alias("max_hops"),
        )
    )


# ---------------------------------------------------------------------------
# G4 — success/error counters (util/StandardTestTools.scala:49-75)
# ---------------------------------------------------------------------------
@register(
    "status_counts",
    oracle=_env(
        """
        SELECT status,
               COUNT(*) AS attempts,
               COUNT(DISTINCT message_id) AS messages
        FROM attempts GROUP BY status
        """
    ),
    doc="G4: SingleStreamCollector success/error counters as a hash aggregation.",
    tags=("metrics",),
)
def status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    led = attempts_ledger(spark, sf_dir)
    return led.groupBy("status").agg(
        F.count(F.lit(1)).alias("attempts"),
        F.countDistinct("message_id").alias("messages"),
    )


# ---------------------------------------------------------------------------
# T2 + S6/S7 — ack/nack routing volumes per topic
# ---------------------------------------------------------------------------
@register(
    "routing_split",
    oracle=_env(
        f"""
        SELECT topic, status,
               COUNT(*) AS attempts,
               {sql_davg('ack_ms')} AS avg_ack_ms
        FROM attempts GROUP BY topic, status
        """
    ),
    doc="T2: the ack-vs-nack router (part2/PekkoStreamGenerator.scala:57-89) as "
    "a grouped count + ack-latency mean per (topic, outcome).",
    tags=("routing", "metrics"),
)
def routing_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    led = attempts_ledger(spark, sf_dir)
    return led.groupBy("topic", "status").agg(
        F.count(F.lit(1)).alias("attempts"),
        davg("ack_ms").alias("avg_ack_ms"),
    )


# ---------------------------------------------------------------------------
# T5 — topic normalization (part3/LimitedMessageProcessor.scala:75)
# ---------------------------------------------------------------------------
@register(
    "topic_normalization",
    oracle=_env(
        """
        SELECT topic_raw, topic, COUNT(*) AS attempts
        FROM attempts GROUP BY topic_raw, topic
        """
    ),
    doc="T5: regexp strip of '-partition-N' suffix; groups raw→normalized routing.",
    tags=("functions",),
)
def topic_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    led = attempts_ledger(spark, sf_dir)
    return led.groupBy("topic_raw", "topic").agg(F.count(F.lit(1)).alias("attempts"))


# ---------------------------------------------------------------------------
# K3 + G2 — per-key gauges (part5/OrderedMessageProcessor.scala:66-74)
# ---------------------------------------------------------------------------
@register(
    "per_key_counts",
    oracle=_env(
        """
        SELECT key,
               COUNT(*) AS attempts,
               COUNT(DISTINCT message_id) AS messages,
               COUNT(*) FILTER (WHERE status = 'failure') AS failures
        FROM attempts GROUP BY key
        """
    ),
    doc="K3/G2: per-key in-progress/failure gauges as hash aggregation.",
    tags=("metrics", "keyed"),
)
def per_key_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    led = attempts_ledger(spark, sf_dir)
    return led.groupBy("key").agg(
        F.count(F.lit(1)).alias("attempts"),
        F.countDistinct("message_id").alias("messages"),
        F.count(F.when(F.col("status") == "failure", 1)).alias("failures"),
    )


# ---------------------------------------------------------------------------
# K2 — per-key order invariant (the Key_Shared contract, batch form)
# ---------------------------------------------------------------------------
@register(
    "order_violations",
    oracle=_env(
        """
        SELECT topic,
               COUNT(*) AS checked,
               COUNT(*) FILTER (WHERE prev_seq IS NOT NULL AND seq < prev_seq) AS violations
        FROM (
          SELECT topic, seq,
                 LAG(seq) OVER (PARTITION BY key ORDER BY attempt_time, event_id, attempt) AS prev_seq
          FROM attempts WHERE status = 'success'
        ) t
        GROUP BY topic
        """
    ),
    doc="K2: per-key order check — lag(seq) over arrival order; redeliveries "
    "(+10 s) legitimately reorder, and both engines count identically "
    "(reference contract: part5/OrderedStreamGenerator.scala:137-161).",
    tags=("keyed", "invariant"),
)
def order_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    led = attempts_ledger(spark, sf_dir).filter(F.col("status") == "success")
    w = Window.partitionBy("key").orderBy("attempt_time", "event_id", "attempt")
    flagged = led.withColumn("prev_seq", F.lag("seq").over(w))
    return flagged.groupBy("topic").agg(
        F.count(F.lit(1)).alias("checked"),
        F.count(F.when(F.col("prev_seq").isNotNull() & (F.col("seq") < F.col("prev_seq")), 1)).alias(
            "violations"
        ),
    )


# ---------------------------------------------------------------------------
# S7 — redelivery-delay invariant (nack → broker redelivery ≥ 10 s)
# ---------------------------------------------------------------------------
@register(
    "redelivery_invariant",
    oracle=_env(
        """
        SELECT COUNT(*) AS redeliveries,
               MIN(gap_s) AS min_gap_s,
               MAX(gap_s) AS max_gap_s
        FROM (
          SELECT CAST((epoch_ms(a2.attempt_time) - epoch_ms(a1.attempt_time)) / 1000 AS BIGINT) AS gap_s
          FROM attempts a1 JOIN attempts a2
            ON a1.message_id = a2.message_id AND a1.attempt = 1 AND a2.attempt = 2
        ) g
        """
    ),
    doc="S7: every nacked message is redelivered exactly redeliveryDelay later "
    "(util/PulsarClientWrapper.scala:171); self-join first↔second attempt.",
    tags=("delivery", "invariant"),
)
def redelivery_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    led = attempts_ledger(spark, sf_dir)
    a1 = led.filter(F.col("attempt") == 1).select("message_id", F.col("attempt_time").alias("t1"))
    a2 = led.filter(F.col("attempt") == 2).select("message_id", F.col("attempt_time").alias("t2"))
    gaps = a1.join(a2, "message_id").select(
        ((F.unix_millis("t2") - F.unix_millis("t1")) / F.lit(1000)).cast("long").alias("gap_s")
    )
    return gaps.agg(
        F.count(F.lit(1)).alias("redeliveries"),
        F.min("gap_s").alias("min_gap_s"),
        F.max("gap_s").alias("max_gap_s"),
    )


# ---------------------------------------------------------------------------
# S6 — at-least-once terminal state (every message ends in success)
# ---------------------------------------------------------------------------
@register(
    "terminal_status",
    oracle=_env(
        """
        SELECT a.status AS terminal_status, COUNT(*) AS messages
        FROM attempts a
        JOIN (SELECT message_id, MAX(attempt) AS last_attempt FROM attempts GROUP BY message_id) m
          ON a.message_id = m.message_id AND a.attempt = m.last_attempt
        GROUP BY a.status
        """
    ),
    doc="S6: at-least-once — the final attempt of every message is an ack "
    "(part2/PekkoStreamGenerator.scala:62-75). Join each message to its last attempt.",
    tags=("delivery", "invariant"),
)
def terminal_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    led = attempts_ledger(spark, sf_dir)
    last = led.groupBy("message_id").agg(F.max("attempt").alias("last_attempt"))
    return (
        led.join(
            last,
            (led.message_id == last.message_id) & (led.attempt == last.last_attempt),
        )
        .select(F.col("status").alias("terminal_status"))
        .groupBy("terminal_status")
        .agg(F.count(F.lit(1)).alias("messages"))
    )


# ---------------------------------------------------------------------------
# G7 — hop-counter monotonicity (numPublishes strictly increments per key+name)
# ---------------------------------------------------------------------------
@register(
    "hop_monotonic",
    oracle=_env(
        """
        SELECT key, name,
               MAX(num_publishes) AS max_hops,
               COUNT(*) AS publishes,
               COUNT(*) FILTER (WHERE prev_hops IS NOT NULL AND num_publishes <> prev_hops + 1)
                 AS violations
        FROM (
          SELECT key, name, num_publishes,
                 LAG(num_publishes) OVER (PARTITION BY key, name ORDER BY publish_time, event_id)
                   AS prev_hops
          FROM attempts WHERE attempt = 1
        ) t
        GROUP BY key, name
        """
    ),
    doc="G7: TestPayload.numPublishes hop counter strictly increments per "
    "republish cycle (util/PulsarClientSetup.scala:17).",
    tags=("metrics", "invariant"),
)
def hop_monotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    led = attempts_ledger(spark, sf_dir).filter(F.col("attempt") == 1)
    w = Window.partitionBy("key", "name").orderBy("publish_time", "event_id")
    t = led.withColumn("prev_hops", F.lag("num_publishes").over(w))
    return t.groupBy("key", "name").agg(
        F.max("num_publishes").alias("max_hops"),
        F.count(F.lit(1)).alias("publishes"),
        F.count(
            F.when(F.col("prev_hops").isNotNull() & (F.col("num_publishes") != F.col("prev_hops") + 1), 1)
        ).alias("violations"),
    )


# ---------------------------------------------------------------------------
# A1/A3/G3 — permit accounting: running concurrency never exceeds the cap
# ---------------------------------------------------------------------------
@register(
    "permit_running_max",
    oracle=_env(
        """
        , tasks AS (
          SELECT topic, event_id, attempt,
                 epoch_ms(attempt_time) AS start_ms,
                 epoch_ms(attempt_time) + processing_ms AS finish_ms
          FROM attempts
        ),
        ticks AS (
          SELECT topic, start_ms AS t_ms, CAST(1 AS BIGINT) AS delta, event_id, attempt FROM tasks
          UNION ALL
          SELECT topic, finish_ms AS t_ms, CAST(-1 AS BIGINT) AS delta, event_id, attempt FROM tasks
        ),
        running AS (
          SELECT topic,
                 SUM(delta) OVER (
                   PARTITION BY topic
                   ORDER BY t_ms, delta, event_id, attempt
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS active
          FROM ticks
        )
        SELECT topic, CAST(MAX(active) AS BIGINT) AS max_concurrent, CAST(COUNT(*) / 2 AS BIGINT) AS tasks
        FROM running GROUP BY topic
        """
    ),
    doc="A1/A3/G3: PermittedTaskExecutor accounting "
    "(part3/PermittedTaskExecutor.scala:63-65,85-98) as a task ledger: "
    "explode start/finish ticks, running SUM window, max concurrency per topic. "
    "Finishes sort before starts at equal timestamps (delta asc).",
    tags=("permits", "window"),
)
def permit_running_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    led = attempts_ledger(spark, sf_dir)
    tasks = led.select(
        "topic",
        "event_id",
        "attempt",
        F.unix_millis("attempt_time").alias("start_ms"),
        (F.unix_millis("attempt_time") + F.col("processing_ms")).alias("finish_ms"),
    )
    starts = tasks.select("topic", F.col("start_ms").alias("t_ms"), F.lit(1).cast("long").alias("delta"), "event_id", "attempt")
    finishes = tasks.select("topic", F.col("finish_ms").alias("t_ms"), F.lit(-1).cast("long").alias("delta"), "event_id", "attempt")
    ticks = starts.unionAll(finishes)
    w = (
        Window.partitionBy("topic")
        .orderBy("t_ms", "delta", "event_id", "attempt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = ticks.withColumn("active", F.sum("delta").over(w))
    return running.groupBy("topic").agg(
        F.max("active").alias("max_concurrent"),
        (F.count(F.lit(1)) / 2).cast("long").alias("tasks"),
    )


# ---------------------------------------------------------------------------
# L4 — desired-vs-existing reconciliation (anti-join set difference)
# ---------------------------------------------------------------------------
@register(
    "reconciliation",
    oracle=_env(
        """
        , desired AS (
          SELECT key AS workload_name FROM attempts
          WHERE event_type = 'purchase' GROUP BY key HAVING COUNT(*) % 2 = 1
        ),
        existing AS (
          SELECT key AS workload_name FROM attempts
          WHERE event_type = 'click' GROUP BY key HAVING COUNT(*) % 2 = 1
        )
        SELECT 'start' AS action, workload_name
        FROM desired WHERE workload_name NOT IN (SELECT workload_name FROM existing)
        UNION ALL
        SELECT 'stop' AS action, workload_name
        FROM existing WHERE workload_name NOT IN (SELECT workload_name FROM desired)
        """
    ),
    doc="L4: WorkloadReport.workloadsToStart/Delete set-difference "
    "(part4/WorkloadManagementService.scala:44-50) as two left-anti joins.",
    tags=("control-plane", "join"),
)
def reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    led = attempts_ledger(spark, sf_dir)

    def _odd_count_keys(event_type: str) -> DataFrame:
        # odd attempt-count per key: a deterministic predicate that differs
        # between the two sets, so the anti-joins produce real rows
        return (
            led.filter(F.col("event_type") == event_type)
            .groupBy(F.col("key").alias("workload_name"))
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") % 2 == 1)
            .select("workload_name")
        )

    desired = _odd_count_keys("purchase")
    existing = _odd_count_keys("click")
    to_start = desired.join(existing, "workload_name", "left_anti").select(
        F.lit("start").alias("action"), "workload_name"
    )
    to_stop = existing.join(desired, "workload_name", "left_anti").select(
        F.lit("stop").alias("action"), "workload_name"
    )
    return to_start.unionAll(to_stop)


# ---------------------------------------------------------------------------
# G5 — processing/ack latency stats per topic
# ---------------------------------------------------------------------------
@register(
    "latency_stats",
    oracle=_env(
        f"""
        SELECT topic,
               {sql_davg('processing_ms')} AS avg_processing_ms,
               MIN(processing_ms) AS min_processing_ms,
               MAX(processing_ms) AS max_processing_ms,
               {sql_davg('ack_ms')} AS avg_ack_ms,
               quantile_cont(ack_ms, 0.5) AS p50_ack_ms
        FROM attempts GROUP BY topic
        """
    ),
    doc="G5: latency recording (part2/PekkoStreamGenerator.scala:42-49, "
    "util/StandardTestTools.scala:54-60) → avg/min/max/median per topic.",
    tags=("metrics",),
)
def latency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    led = attempts_ledger(spark, sf_dir)
    return led.groupBy("topic").agg(
        davg("processing_ms").alias("avg_processing_ms"),
        F.min("processing_ms").alias("min_processing_ms"),
        F.max("processing_ms").alias("max_processing_ms"),
        davg("ack_ms").alias("avg_ack_ms"),
        F.expr("percentile(ack_ms, 0.5)").alias("p50_ack_ms"),
    )


# ---------------------------------------------------------------------------
# G1/G6 + §2.7 windows — tumbling-window throughput gauge
# ---------------------------------------------------------------------------
@register(
    "windowed_throughput",
    oracle=_env(
        f"""
        SELECT CAST(date_trunc('day', attempt_time) AS DATE) AS day,
               COUNT(*) AS attempts,
               COUNT(DISTINCT message_id) AS messages,
               {sql_dsum('value')} AS volume
        FROM attempts WHERE attempt_time IS NOT NULL GROUP BY 1
        """
    ),
    doc="G1/G6: sampled in-progress/batch-size gauges become tumbling event-time "
    "windows (reference samples on fixed wall-clock, part2/MessageProcessor.scala:35-40).",
    tags=("metrics", "window"),
)
def windowed_throughput(spark: SparkSession, sf_dir: str) -> DataFrame:
    led = attempts_ledger(spark, sf_dir)
    return (
        led.groupBy(F.window("attempt_time", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("attempts"),
            F.countDistinct("message_id").alias("messages"),
            dsum("value").alias("volume"),
        )
        .select(F.col("w.start").cast("date").alias("day"), "attempts", "messages", "volume")
    )


# ---------------------------------------------------------------------------
# S7 — DLQ candidates: messages that ever failed, per topic
# ---------------------------------------------------------------------------
@register(
    "dlq_candidates",
    oracle=_env(
        """
        SELECT topic,
               COUNT(DISTINCT message_id) AS failed_messages,
               COUNT(*) AS failure_attempts
        FROM attempts WHERE status = 'failure'
        GROUP BY topic
        """
    ),
    doc="S7: retry/DLQ correlation — the population the retry topic would carry.",
    tags=("delivery",),
)
def dlq_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    led = attempts_ledger(spark, sf_dir)
    return (
        led.filter(F.col("status") == "failure")
        .groupBy("topic")
        .agg(
            F.countDistinct("message_id").alias("failed_messages"),
            F.count(F.lit(1)).alias("failure_attempts"),
        )
    )


# ---------------------------------------------------------------------------
# payload JSON decode — the schema codec (util/PulsarClientSetup.scala:21-29)
# ---------------------------------------------------------------------------
_PJD_K = (
    "CASE WHEN json_valid(props) "
    "THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) END"
)


@register(
    "payload_json_decode",
    oracle=f"""
        SELECT event_type,
               COUNT(*) AS events,
               {sql_davg(_PJD_K)} AS avg_k,
               MAX({_PJD_K}) AS max_k
        FROM events GROUP BY event_type
        """,
    doc="Schema codec: JSON payload decode (play-json encode/decode, "
    "util/PulsarClientSetup.scala:21-29) → get_json_object + typed aggregate.  "
    "External payloads are hostile: malformed JSON, a missing key, and a "
    "non-numeric k (e.g. the string 'NaN') all decode to NULL — try_cast in "
    "Spark, json_valid + TRY_CAST in the oracle (a plain CAST ANSI-aborts "
    "the whole job on one poisoned message; round-6 sweep finding).",
    tags=("functions", "json"),
)
def payload_json_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("events"),
        davg(k).alias("avg_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "skew_safe_distinct_users",
    oracle="""
        SELECT event_type,
               COUNT(DISTINCT user_id) AS users,
               COUNT(*) AS events
        FROM events GROUP BY event_type
        """,
    doc="Skew-safe distinct: pre-aggregate on (event_type, user_id) so the "
    "first shuffle is diluted across the full composite key (an event_type "
    "hot key — 5 types over billions of rows — never lands on one reducer), "
    "then the tiny second phase counts groups per type.  Same result as "
    "COUNT(DISTINCT), immune to key skew at 100 TB.",
    tags=("agg", "skew"),
)
def skew_safe_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_pair = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    return per_pair.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("users"),
        F.sum("c").alias("events"),
    )


# Percentiles are order statistics over the FINITE values only: a NaN ranks
# differently across engines (Spark's percentile sorts it last; DuckDB's
# quantile_cont skips it), and one ±Inf would poison every interpolated
# cut above/below it — so non-finite values map to NULL INSIDE the
# aggregate (groups survive even if all their values are garbage).
_FINITE_VALUE_SPARK = (
    "CASE WHEN NOT isnan(value) AND abs(value) < CAST('Infinity' AS DOUBLE) "
    "THEN value END"
)
_FINITE_VALUE_DUCK = "CASE WHEN isfinite(value) THEN value END"


@register(
    "value_percentiles",
    oracle=f"""
        SELECT event_type,
               quantile_cont({_FINITE_VALUE_DUCK}, 0.5) AS p50,
               quantile_cont({_FINITE_VALUE_DUCK}, 0.95) AS p95,
               quantile_cont({_FINITE_VALUE_DUCK}, 0.99) AS p99
        FROM events GROUP BY event_type
        """,
    doc="Exact interpolated percentiles per event type (G5's latency "
    "percentile shape, util/StandardTestTools.scala:54-60), over finite "
    "values only (non-finite -> NULL inside the aggregate, identical in "
    "both engines).  Exact percentile = per-group sort; at 100 TB swap in "
    "percentile_approx (t-digest-style mergeable sketch) — same query "
    "shape, bounded memory.",
    tags=("agg", "percentile", "exact-audit"),
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr(f"percentile({_FINITE_VALUE_SPARK}, 0.5)").alias("p50"),
        F.expr(f"percentile({_FINITE_VALUE_SPARK}, 0.95)").alias("p95"),
        F.expr(f"percentile({_FINITE_VALUE_SPARK}, 0.99)").alias("p99"),
    )
