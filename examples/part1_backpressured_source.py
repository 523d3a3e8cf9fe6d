"""Part 1 — backpressured source.

Reference: ``PulsarPekkoSource`` pulls exactly one message per downstream
demand (part1/PulsarPekkoSource.scala:54-65) with a (0,1) input buffer so the
broker, not the app, holds the backlog (part2/PekkoStreamGenerator.scala:91-94).

Spark twin: the micro-batch file source with ``maxFilesPerTrigger=1`` — each
trigger admits one file; unread backlog stays at the source.  The progress
log proves admission control: N files → N micro-batches, never one giant pull.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession

from examples._common import main, seed_messages, subdir
from pulsar_pekko_streams_example_spark.sources.streams import envelope_file_stream

N_FILES = 3
ROWS_PER_FILE = 40


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
    return {"micro_batches": len(batches), "rows": total}


if __name__ == "__main__":
    main(run)
