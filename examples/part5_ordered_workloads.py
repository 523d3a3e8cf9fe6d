"""Part 5 — per-key ordered processing (Key_Shared).

Reference: ``OrderedWorkloadsExample`` (part5/OrderedWorkloadsExample.scala:70)
— 2 workloads × 2 keys × 2 names (:124-141); each key's messages are
processed strictly serially, one in flight per key
(OrderedStreamGenerator.scala:137-161: ``groupByKey(buffer=1).mapZIOPar(1)``).

Spark twin: ``ordered_per_key`` (`applyInPandasWithState`) — shuffle on key
routes every key to one task per micro-batch (Key_Shared), GroupState carries
the per-key cursor across batches; the order invariant is asserted per key.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import SparkSession

from examples._common import main, seed_messages, subdir
from pulsar_pekko_streams_example_spark.sources.streams import envelope_file_stream
from pulsar_pekko_streams_example_spark.streaming.ordered_state import ordered_per_key

N_KEYS = 4
N_MESSAGES = 80


def run(spark: SparkSession, base: str) -> dict:
    src = subdir(base, "src")
    msgs = seed_messages(spark, N_MESSAGES, keys=N_KEYS)
    half = N_MESSAGES // 2
    msgs.filter(f"event_id < {half}").coalesce(1).write.parquet(os.path.join(src, "b1"))
    time.sleep(1.1)
    msgs.filter(f"event_id >= {half}").coalesce(1).write.parquet(os.path.join(src, "b2"))

    stream = envelope_file_stream(spark, src + "/*", max_files_per_trigger=1)
    query = (
        ordered_per_key(stream)
        .writeStream.format("memory")
        .queryName("part5_ordered")
        .outputMode("append")
        .option("checkpointLocation", subdir(base, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(180)

    rows = spark.table("part5_ordered").collect()
    assert len(rows) == N_MESSAGES
    per_key: dict[str, list] = {}
    for r in rows:
        per_key.setdefault(r.key, []).append(r)
    assert len(per_key) == N_KEYS
    for key, krows in per_key.items():
        krows.sort(key=lambda r: r.processing_index)
        seqs = [r.seq for r in krows]
        assert seqs == sorted(seqs), f"key {key} processed out of order"
        assert all(r.in_order for r in krows)
    return {"keys": len(per_key), "messages": len(rows)}


if __name__ == "__main__":
    main(run)
