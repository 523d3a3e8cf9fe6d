"""End-to-end STREAMING throughput of the envelope pipeline — the number the
reference's examples bound by construction.

The reference's steady-state throughput is configuration-derived, not
measured: 5 permits / 1 s simulated latency ≈ 5 msg/s (part 3), ≤ 4 msg/s
per workload pair (part 5) — see BASELINE.md.  This tool measures the Spark
engine's equivalent pipeline END TO END through Structured Streaming:

    parquet-backlog file source (admission-capped micro-batches)
      → Arrow-batched processor (the deterministic simulated processor, T1/T4)
      → ack/nack routing (T2)
      → parquet sink (S3's durable-republish analog)

and prints ONE JSON line: messages/second over the whole run, sink-verified
(ack + nack counts must equal the seeded message count).

    python tools/bench_streaming.py              # 1M messages
    SPARK_GRAFT_STREAM_MSGS=200000 python tools/bench_streaming.py
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import sys
import tempfile
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N_MESSAGES = int(os.environ.get("SPARK_GRAFT_STREAM_MSGS", "1000000"))
SEED_FILES = 32  # backlog split so admission and micro-batching are exercised


def run(spark, n_messages: int, seed_files: int = SEED_FILES) -> dict:
    """Drive ``n_messages`` through the pipeline; return the measurement."""
    from pyspark.sql import functions as F

    from examples._common import seed_messages
    from pulsar_pekko_streams_example_spark.sources.streams import (
        envelope_file_stream,
    )
    from pulsar_pekko_streams_example_spark.streaming.processor import (
        apply_processor,
        simulated_processor,
    )

    base = tempfile.mkdtemp(prefix="spark-graft-stream-bench-")
    try:
        src = os.path.join(base, "backlog")
        seed_messages(spark, n_messages).repartition(seed_files).write.mode(
            "overwrite"
        ).parquet(src)
        sink = os.path.join(base, "outcomes")

        stream = envelope_file_stream(spark, src, max_files_per_trigger=8)
        processed = apply_processor(stream, simulated_processor())
        # single sink, partitioned by outcome: one stream drains the backlog,
        # and both outcome feeds stay queryable (the DLQ-candidate shape)
        routed = processed.withColumn(
            "outcome", F.when(F.col("ok"), "ack").otherwise("nack")
        )
        t0 = time.perf_counter()
        q = (
            routed.writeStream.format("parquet")
            .partitionBy("outcome")
            .option("path", sink)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0

        out = spark.read.parquet(sink)
        n_ack = out.filter(F.col("outcome") == "ack").count()
        n_nack = out.filter(F.col("outcome") == "nack").count()
        assert n_ack + n_nack == n_messages, (n_ack, n_nack, n_messages)
        return {
            "metric": "streaming_envelope_msgs_per_sec",
            "value": round(n_messages / wall, 1),
            "unit": "msg/s",
            "messages": n_messages,
            "wall_sec": round(wall, 2),
            "acked": n_ack,
            "nacked": n_nack,
            "reference_derived_msgs_per_sec": 5,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def run_ordered(
    spark, n_messages: int, n_keys: int = 1024, idle_timeout_ms: int | None = None
) -> dict:
    """K2 throughput: the per-key ORDERED serial path (applyInPandasWithState
    over groupBy(key)) — the operator that bounds the reference's part 5 at
    <= 4 msg/s per workload pair.  Sink-verified: every message lands exactly
    once and every key's first-pass cursor is gap-free in order.

    The backlog is seeded key-partitioned (each key's full seq range lives in
    exactly one file, sorted by seq), so the measurement is robust to ANY
    file-granularity micro-batch split — an admission cap or a future Spark
    default can slice the backlog without manufacturing forward gaps the
    cursor would (correctly) flag as continuity violations.  Cross-micro-batch
    cursor semantics (seq-ordered arrival) are pinned by
    tests/test_streaming.py::test_ordered_per_key_across_microbatches; this
    measures the grouped-stateful path's throughput."""
    from pyspark.sql import functions as F

    from examples._common import seed_messages
    from pulsar_pekko_streams_example_spark.sources.streams import (
        envelope_file_stream,
    )
    from pulsar_pekko_streams_example_spark.streaming.ordered_state import (
        ordered_per_key,
    )

    base = tempfile.mkdtemp(prefix="spark-graft-stream-bench-ord-")
    try:
        src = os.path.join(base, "backlog")
        # hash-partition by key: a key never straddles two files, so no
        # file-level batch split can break its seq continuity
        seed_messages(spark, n_messages, keys=n_keys).repartition(
            SEED_FILES, "key"
        ).sortWithinPartitions("key", "seq").write.mode("overwrite").parquet(src)
        sink = os.path.join(base, "ordered")

        stream = envelope_file_stream(spark, src)
        if idle_timeout_ms is not None:
            # the bounded-state variant: watermarked input + event-time TTL
            # (measures the guarded path's overhead, not expiry — every
            # key stays live for the whole backlog)
            from pulsar_pekko_streams_example_spark.sources.streams import watermarked

            stream = watermarked(stream, "10 minutes")
        t0 = time.perf_counter()
        q = (
            ordered_per_key(stream, idle_timeout_ms=idle_timeout_ms)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0

        out = spark.read.parquet(sink)
        n_out = out.count()
        assert n_out == n_messages, (n_out, n_messages)
        n_disorder = out.filter(~F.col("in_order")).count()
        assert n_disorder == 0, f"{n_disorder} out-of-order rows"
        return {
            "metric": (
                "streaming_ordered_per_key_msgs_per_sec"
                if idle_timeout_ms is None
                else "streaming_ordered_ttl_msgs_per_sec"
            ),
            "value": round(n_messages / wall, 1),
            "unit": "msg/s",
            "messages": n_messages,
            "keys": n_keys,
            "wall_sec": round(wall, 2),
            "idle_timeout_ms": idle_timeout_ms,
            "reference_derived_msgs_per_sec": 4,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def run_windowed(spark, n_messages: int) -> dict:
    """G1 throughput: the watermarked tumbling-window path through the
    library's front door (``watermarked`` = bounded_event_time + watermark,
    guard ON).  The seeded backlog carries one poisoned year-9999 envelope —
    the measurement double-checks the guard at scale: every legitimate
    message must land in a window (the unguarded engine would emit 0 rows
    for everything after the poison, per the round-8 canary test)."""
    from pyspark.sql import functions as F

    from examples._common import seed_messages
    from pulsar_pekko_streams_example_spark.sources.streams import (
        envelope_file_stream,
        watermarked,
    )

    base = tempfile.mkdtemp(prefix="spark-graft-stream-bench-win-")
    try:
        src = os.path.join(base, "backlog")
        poison = seed_messages(spark, 1).select(
            F.lit("poison").alias("message_id"),
            F.lit(-1).cast("long").alias("event_id"),
            "topic",
            "key",
            "seq",
            "attempt",
            "status",
            F.lit("9999-01-01 00:00:00").cast("timestamp").alias("publish_time"),
        )
        seed_messages(spark, n_messages, keys=64).unionByName(poison).repartition(
            SEED_FILES
        ).write.mode("overwrite").parquet(src)
        sink = os.path.join(base, "windows")

        stream = envelope_file_stream(spark, src)
        windowed = (
            watermarked(stream, "10 minutes")
            .groupBy(F.window("publish_time", "1 minute").alias("w"), "key")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("win_start"), "key", "n")
        )
        t0 = time.perf_counter()
        q = (
            windowed.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # one in-bounds heartbeat batch closes the tail windows
        seed_messages(spark, 1).select(
            F.lit("heartbeat").alias("message_id"),
            F.lit(-2).cast("long").alias("event_id"),
            "topic",
            "key",
            "seq",
            "attempt",
            "status",
            F.lit("2024-06-01 00:00:00").cast("timestamp").alias("publish_time"),
        ).coalesce(1).write.mode("append").parquet(src)
        q2 = (
            windowed.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination()
        wall = time.perf_counter() - t0

        out = spark.read.parquet(sink)
        n_windowed = out.agg(F.sum("n")).collect()[0][0]
        # every legitimate message windowed; poison excluded by the guard
        assert n_windowed == n_messages, (n_windowed, n_messages)
        return {
            "metric": "streaming_windowed_msgs_per_sec",
            "value": round(n_messages / wall, 1),
            "unit": "msg/s",
            "messages": n_messages,
            "wall_sec": round(wall, 2),
            "poisoned_rows_excluded": 1,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def run_retry_lifecycle(spark, n_messages: int) -> dict:
    """S6/S7 throughput: the FULL delivery lifecycle to convergence — route
    to sink/retry (streaming, foreachBatch under the ledger lease),
    re-ingest due retries, repeat until the frontier drains.  10% of
    messages fail their first attempt and deliver on redelivery, so the
    run exercises routing, the frontier scan, the ``_redelivered``
    termination flag, and idempotent ledger writes end to end.
    Sink-verified: every seeded message delivered exactly once."""
    from examples._common import seed_messages
    from pulsar_pekko_streams_example_spark.sources.streams import (
        envelope_file_stream,
    )
    from pulsar_pekko_streams_example_spark.streaming import (
        RetryRouter,
        apply_processor,
    )

    base = tempfile.mkdtemp(prefix="spark-graft-stream-bench-retry-")
    try:
        src = os.path.join(base, "backlog")
        seed_messages(spark, n_messages).repartition(SEED_FILES).write.mode(
            "overwrite"
        ).parquet(src)
        router = RetryRouter(
            sink_path=os.path.join(base, "sink"),
            retry_path=os.path.join(base, "retry"),
            dlq_path=os.path.join(base, "dlq"),
            redelivery_delay_s=0,
            max_attempts=3,
        )

        def flaky(pdf):
            return ~((pdf["event_id"] % 10 == 0) & (pdf["attempt"] == 1))

        t0 = time.perf_counter()
        q = (
            router.attach(
                apply_processor(envelope_file_stream(spark, src), flaky),
                os.path.join(base, "ckpt"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        cycles, bid = 0, 1_000_000
        while True:
            due = router.due_retries(spark, as_of="2100-01-01 00:00:00")
            batch = due.drop("available_at", "_batch_id", "ok", "error")
            if not batch.limit(1).count():
                break
            bid += 1
            cycles += 1
            router.route_batch(apply_processor(batch, flaky), bid)
        wall = time.perf_counter() - t0

        sink = spark.read.parquet(router.sink_path)
        n_sink = sink.count()
        assert n_sink == n_messages, (n_sink, n_messages)
        n_distinct = sink.select("message_id").distinct().count()
        assert n_distinct == n_messages, (n_distinct, n_messages)
        return {
            "metric": "streaming_retry_lifecycle_msgs_per_sec",
            "value": round(n_messages / wall, 1),
            "unit": "msg/s",
            "messages": n_messages,
            "redelivered": n_messages // 10,
            "redelivery_cycles": cycles,
            "wall_sec": round(wall, 2),
            "reference_derived_msgs_per_sec": 5,
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)


def main() -> None:
    from pulsar_pekko_streams_example_spark.session import get_spark

    spark = get_spark(app_name="bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps(run(spark, N_MESSAGES)))
    print(json.dumps(run_ordered(spark, N_MESSAGES)))
    print(json.dumps(run_ordered(spark, N_MESSAGES, idle_timeout_ms=3_600_000)))
    print(json.dumps(run_windowed(spark, N_MESSAGES)))
    print(json.dumps(run_retry_lifecycle(spark, N_MESSAGES)))


if __name__ == "__main__":
    main()
