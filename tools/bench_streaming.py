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
#: optional admission bound (files per micro-batch) for the NON-WATERMARKED
#: stages (ordered NoTimeout, retry lifecycle) — unset keeps the historical
#: one-big-batch readings comparable; set it for large feeds (>= 16M
#: messages).  This is the same max_files_per_trigger admission knob
#: (receiverQueueSize analog, L11) a production deployment would run with.
#: The WATERMARKED stages (ordered TTL, windowed) deliberately ignore it:
#: the backlog is seeded key-partitioned with every file spanning the FULL
#: event-time range, so bounded batches would advance the watermark past
#: later files and the engine would (correctly) drop their rows as late —
#: replaying an un-time-ordered historical backlog through a watermarked
#: query needs either one batch, a watermark sized to the backlog span, or
#: a time-ordered feed.  That is watermark semantics, not a harness bug.
MAX_FILES_PER_TRIGGER = (
    int(os.environ["SPARK_GRAFT_STREAM_MFPT"])
    if os.environ.get("SPARK_GRAFT_STREAM_MFPT")
    else None
)


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

        stream = envelope_file_stream(
            spark,
            src,
            # admission bound only for the unwatermarked variant: bounded
            # batches over full-time-range files would make the TTL
            # variant's watermark late-drop later files (see the
            # MAX_FILES_PER_TRIGGER note)
            max_files_per_trigger=(
                MAX_FILES_PER_TRIGGER if idle_timeout_ms is None else None
            ),
        )
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

        # deliberately UNBOUNDED admission: this stage is watermarked, and
        # bounded batches over full-time-range files would late-drop later
        # files' rows (see the MAX_FILES_PER_TRIGGER note); the cost is a
        # single-JVM heap ceiling around 16M messages for this stage
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
        # one in-bounds heartbeat batch closes the tail windows.  Its event
        # time must sit BEYOND the backlog's max (2024-01-01 + n seconds),
        # else the final watermark-delay of windows never flushes — found
        # at 16M messages, where the backlog's ~185-day event-time span
        # outran the previous fixed stamp and exactly keys × delay-minutes
        # of tail rows went unemitted (still < the 2100 guard bound)
        seed_messages(spark, 1).select(
            F.lit("heartbeat").alias("message_id"),
            F.lit(-2).cast("long").alias("event_id"),
            "topic",
            "key",
            "seq",
            "attempt",
            "status",
            (
                F.lit("2024-01-01 00:00:00").cast("timestamp")
                + F.make_interval(secs=F.lit(n_messages + 3600))
            ).alias("publish_time"),
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
                apply_processor(
                    envelope_file_stream(
                        spark, src, max_files_per_trigger=MAX_FILES_PER_TRIGGER
                    ),
                    flaky,
                ),
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


def _steal_jiffies() -> int:
    """Hypervisor-steal counter (round 15, mirrors bench.py): loadavg is
    blind to the host taking cycles, so each stage's reading carries its own
    stolen-core-seconds evidence — a band-miss with high steal_sec is
    ambient, not an engine signal."""
    try:
        with open("/proc/stat") as fh:
            return int(fh.readline().split()[8])
    except (OSError, ValueError, IndexError):
        return 0


def main() -> None:
    from pulsar_pekko_streams_example_spark.session import get_spark

    spark = get_spark(app_name="bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    # one stage hitting a local-JVM limit (e.g. the watermarked windowed
    # stage's single-batch heap ceiling at very large N) must not cost the
    # other stages' readings: print an error line for it and exit non-zero
    failures = 0
    # windowed runs LAST: at very large N its unbounded (watermark-required)
    # single batch can exhaust the local JVM hard enough to take the shared
    # SparkContext down — the other stages' readings must already be printed
    for label, fn in (
        ("envelope", lambda: run(spark, N_MESSAGES)),
        ("ordered", lambda: run_ordered(spark, N_MESSAGES)),
        (
            "ordered_ttl",
            lambda: run_ordered(spark, N_MESSAGES, idle_timeout_ms=3_600_000),
        ),
        ("lifecycle", lambda: run_retry_lifecycle(spark, N_MESSAGES)),
        ("windowed", lambda: run_windowed(spark, N_MESSAGES)),
    ):
        try:
            s0 = _steal_jiffies()
            out = fn()
            out["steal_sec"] = round((_steal_jiffies() - s0) / 100.0, 1)
            print(json.dumps(out), flush=True)
        except Exception as e:  # noqa: BLE001 — a bench stage, report + go on
            failures += 1
            print(
                json.dumps(
                    {
                        "metric": f"streaming_{label}_msgs_per_sec",
                        "error": f"{type(e).__name__}: {e}"[:300],
                        "messages": N_MESSAGES,
                    }
                ),
                flush=True,
            )
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
