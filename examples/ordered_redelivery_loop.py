"""Extension — K2 × S6/S7 composed: the ordered redelivery loop.

The reference's part 5 processes each key strictly serially AND relies on
broker redelivery for failures (``part5/OrderedStreamGenerator.scala:137-161``
per-key ``mapZIOPar(1)``; nack → Key_Shared redelivery back into the SAME
key's queue).  The two halves are unit-pinned separately here
(``ordered_per_key`` cursor semantics; ``RetryRouter`` lifecycle); this
example closes the loop the way a deployment actually runs it:

1. a keyed backlog streams through ``ordered_per_key`` — ONE checkpointed
   query whose per-key cursors persist across drains (the consumer);
2. each drain's newly ordered rows (per-key ``processing_index`` past the
   consumer's offset — the offset ledger a real consumer keeps) are joined
   back to their envelopes and pushed through the flaky processor + router;
3. failures re-enter the SOURCE as aged redelivery envelopes; the next
   drain routes them through the SAME key cursors, so K2 flags them
   ``is_redelivery`` (seq at/below the cursor) — exactly what Key_Shared
   redelivery looks like to an ordered consumer;
4. the loop converges: every message delivered exactly once, every
   redelivery flagged on a LONG-LIVED cursor (``fresh_cursor`` false —
   no TTL lapse masquerading as a first delivery), first-pass order
   preserved per key.

Scale note: the envelope join-back is per-cycle batch work over this
cycle's rows only; at 100 TB the envelope would ride through the stateful
op (wider OUTPUT_SCHEMA) instead — the example favors the observable
offset-ledger shape.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from examples._common import main, seed_messages, subdir
from pulsar_pekko_streams_example_spark.sources.streams import (
    ATTEMPT_STREAM_SCHEMA,
    envelope_file_stream,
)
from pulsar_pekko_streams_example_spark.streaming import RetryRouter, apply_processor
from pulsar_pekko_streams_example_spark.streaming.ordered_state import ordered_per_key

N_KEYS = 4
N_MESSAGES = 120
AS_OF = "2100-01-01 00:00:00"
ENVELOPE_COLS = [f.split()[0] for f in ATTEMPT_STREAM_SCHEMA.split(", ")]


def run(spark: SparkSession, base: str) -> dict:
    src = subdir(base, "src")
    ordered_log = os.path.join(base, "ordered_log")
    seed_messages(spark, N_MESSAGES, keys=N_KEYS).coalesce(1).write.parquet(
        os.path.join(src, "backlog")
    )
    router = RetryRouter(
        sink_path=os.path.join(base, "sink"),
        retry_path=os.path.join(base, "retry"),
        dlq_path=os.path.join(base, "dlq"),
        redelivery_delay_s=0,
        max_attempts=3,
    )

    def flaky(pdf):  # every 10th message fails its first attempt only
        return ~((pdf["event_id"] % 10 == 0) & (pdf["attempt"] == 1))

    def drain_ordered():
        """One consumer pass: the SAME checkpoint, so the file source feeds
        only new files and the per-key cursors carry over."""
        q = (
            ordered_per_key(envelope_file_stream(spark, src + "/*"))
            .writeStream.format("parquet")
            .option("path", ordered_log)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(ordered_log)

    offsets: dict[str, int] = {}  # per-key consumer offset into processing_index
    cycles = 0
    for cycle in range(1, 6):
        log = drain_ordered().collect()
        fresh = [
            r for r in log if r.processing_index >= offsets.get(r.key, 0)
        ]
        if not fresh:
            break
        cycles = cycle
        for r in fresh:
            offsets[r.key] = max(offsets.get(r.key, 0), r.processing_index + 1)

        # join this pass's ordered rows back to their envelopes (attempt
        # rides on the envelope; the ordered output is the processing order)
        envelopes = spark.read.parquet(src + "/*")
        batch = envelopes.join(
            spark.createDataFrame(
                [(r.message_id,) for r in fresh], "message_id string"
            ),
            ["message_id"],
            "left_semi",
        )
        # latest attempt per message: a redelivery envelope supersedes the
        # original file's attempt-1 row for the same id
        from pyspark.sql.window import Window

        w = Window.partitionBy("message_id").orderBy(F.col("attempt").desc())
        batch = (
            batch.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        router.route_batch(apply_processor(batch, flaky), batch_id=cycle)

        # failures re-enter the source as aged redelivery envelopes —
        # the broker-redelivery analog feeding the SAME key queues
        due = router.due_retries(spark, as_of=AS_OF)
        if due.limit(1).count():
            due.select(*ENVELOPE_COLS).coalesce(1).write.parquet(
                os.path.join(src, f"redelivery-{cycle}")
            )

    # convergence: exactly one delivery per message, ledgers drained
    sink = spark.read.parquet(router.sink_path)
    assert sink.select("message_id").distinct().count() == N_MESSAGES
    assert sink.count() == N_MESSAGES
    assert router.due_retries(spark, as_of=AS_OF).count() == 0
    assert not os.path.exists(router.dlq_path)

    # the ordered log tells the whole story: failed messages appear twice —
    # first pass in order, second pass flagged as a redelivery on a
    # long-lived cursor (fresh only in the very first batch per key)
    log = spark.read.parquet(ordered_log).collect()
    n_failures = N_MESSAGES // 10
    assert len(log) == N_MESSAGES + n_failures
    redeliveries = [r for r in log if r.is_redelivery]
    assert len(redeliveries) == n_failures
    assert all(not r.fresh_cursor for r in redeliveries), (
        "redeliveries ran on persisted cursors, not TTL-lapsed ones"
    )
    per_key: dict[str, list] = {}
    for r in log:
        per_key.setdefault(r.key, []).append(r)
    assert len(per_key) == N_KEYS
    for key, krows in per_key.items():
        krows.sort(key=lambda r: r.processing_index)
        first_pass = [r.seq for r in krows if not r.is_redelivery]
        assert first_pass == sorted(first_pass), f"key {key} out of order"
        assert all(r.in_order for r in krows)  # redeliveries are in_order too

    return {
        "delivered": N_MESSAGES,
        "redelivered_through_key_queues": len(redeliveries),
        "consumer_cycles": cycles,
    }


if __name__ == "__main__":
    main(run)
