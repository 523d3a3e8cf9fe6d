"""Part 1 — backpressured source, with a metered event-time guard.

Reference: ``PulsarPekkoSource`` pulls exactly one message per downstream
demand (part1/PulsarPekkoSource.scala:54-65) with a (0,1) input buffer so the
broker, not the app, holds the backlog (part2/PekkoStreamGenerator.scala:91-94).

Spark twin: the micro-batch file source with ``maxFilesPerTrigger=1`` — each
trigger admits one file; unread backlog stays at the source.  The progress
log proves admission control: N files → N micro-batches, never one giant pull.

Stage 2 is the operational front door at the same source: hostile event
times (a year-9999 clock skew, a NULL timestamp, a pre-epoch stamp) would
poison the watermark or vanish silently, so ingest goes through
``watermarked(..., guard_metrics=...)`` and the books are CLOSED per run —
``scanned - in_bounds`` from the listener's guard observation must equal the
seeded poison count exactly, proving the guard dropped the poison and
nothing else."""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from examples._common import main, seed_messages, subdir
from pulsar_pekko_streams_example_spark.sources.streams import (
    envelope_file_stream,
    watermarked,
)
from pulsar_pekko_streams_example_spark.streaming import metrics as M
from pulsar_pekko_streams_example_spark.streaming.metrics import (
    GUARD_OBSERVATION_NAME,
)

N_FILES = 3
ROWS_PER_FILE = 40
POISON_TIMES = ["9999-01-01 00:00:00", None, "1969-12-31 23:59:59"]


def run(spark: SparkSession, base: str) -> dict:
    src = subdir(base, "src")
    for i in range(N_FILES):
        seed_messages(spark, ROWS_PER_FILE).coalesce(1).write.parquet(
            os.path.join(src, f"file-{i}")
        )
        time.sleep(1.1)  # file source orders by modification time

    stream = envelope_file_stream(spark, src + "/*", max_files_per_trigger=1)
    query = (
        stream.writeStream.format("noop")
        .option("checkpointLocation", subdir(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)

    batches = [p for p in query.recentProgress if p["numInputRows"] > 0]
    total = sum(p["numInputRows"] for p in batches)
    assert len(batches) == N_FILES, f"expected {N_FILES} admitted pulls, got {len(batches)}"
    assert total == N_FILES * ROWS_PER_FILE

    # ------------------------------------------------------------------
    # Stage 2: guarded ingest with reconciled drop accounting.  Seed the
    # same backlog plus known poison; the guard must drop EXACTLY the
    # poison (scanned - in_bounds == len(POISON_TIMES)) and the sink must
    # hold exactly the legitimate rows — no silent loss either way.
    # ------------------------------------------------------------------
    poison_src = subdir(base, "poison-src")
    clean = seed_messages(spark, ROWS_PER_FILE)
    poison = spark.createDataFrame(
        [(f"poison-{i}", t) for i, t in enumerate(POISON_TIMES)],
        "message_id string, ts_raw string",
    ).select(
        "message_id",
        F.lit(-1).cast("long").alias("event_id"),
        F.lit("persistent://testing/examples/topic-0").alias("topic"),
        F.lit("key-poison").alias("key"),
        F.lit(None).cast("long").alias("seq"),
        F.lit(1).cast("long").alias("attempt"),
        F.lit("pending").alias("status"),
        F.col("ts_raw").cast("timestamp").alias("publish_time"),
    )
    clean.unionByName(poison).coalesce(1).write.parquet(
        os.path.join(poison_src, "backlog")
    )

    listener = M.install(spark)
    try:
        guarded = watermarked(
            envelope_file_stream(spark, poison_src + "/*"),
            "10 minutes",
            guard_metrics=GUARD_OBSERVATION_NAME,
        )
        q2 = (
            guarded.writeStream.format("memory")
            .queryName("part1_guarded_ingest")
            .outputMode("append")
            .option("checkpointLocation", subdir(base, "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(120)
        deadline = time.time() + 30
        while time.time() < deadline and not listener.guard_rows:
            time.sleep(0.2)  # listener events are async
        g = listener.guard_totals()
    finally:
        M.uninstall(spark, listener)

    n_poison = len(POISON_TIMES)
    # the books close: every scanned row is accounted for, the drops are
    # exactly the seeded poison, and the survivors all reached the sink
    assert g["scanned"] == ROWS_PER_FILE + n_poison, g
    assert g["dropped"] == n_poison, g
    assert g["in_bounds"] == ROWS_PER_FILE, g
    delivered = spark.table("part1_guarded_ingest").count()
    assert delivered == g["in_bounds"] == ROWS_PER_FILE
    return {
        "micro_batches": len(batches),
        "rows": total,
        "guard_scanned": g["scanned"],
        "guard_dropped": g["dropped"],
        "guard_delivered": delivered,
    }


if __name__ == "__main__":
    main(run)
