"""Part 2 — single workload: process + ack/nack routing.

Reference: ``SingleWorkloadExample`` (part2/SingleWorkloadExample.scala:47) —
one stream applies a user processor with bounded parallelism
(PekkoStreamGenerator.scala:40-56), then routes `ProcessSuccess` → ack and
`ProcessFailure` → nack (:57-89); the simulated processor fails 1-in-10
(part2/MessageProcessor.scala:58 — random there, deterministic here so the
outcome is assertable).

Spark twin: Arrow-batched processor UDF returning struct(ok, error) — errors
become data, never stream failure — and the router splits the outcome into
the ack path and the retry path (two filtered writers).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from examples._common import main, seed_messages
from pulsar_pekko_streams_example_spark.streaming.processor import (
    apply_processor,
    route_outcomes,
    simulated_processor,
)

N_MESSAGES = 200
FAILURE_MOD = 10


def run(spark: SparkSession, base: str) -> dict:
    messages = seed_messages(spark, N_MESSAGES)
    processed = apply_processor(messages, simulated_processor(FAILURE_MOD))
    acks, nacks = route_outcomes(processed)

    n_ack, n_nack = acks.count(), nacks.count()
    expected_failures = messages.filter(F.col("event_id") % FAILURE_MOD == 0).count()
    assert n_nack == expected_failures
    assert n_ack + n_nack == N_MESSAGES
    # the ack stage increments the hop counter on republish
    # (util/PulsarClientSetup.scala:17)
    republished = acks.withColumn("attempt", F.col("attempt") + 1)
    assert republished.agg(F.min("attempt")).collect()[0][0] == 2
    return {"acked": n_ack, "nacked": n_nack}


if __name__ == "__main__":
    main(run)
