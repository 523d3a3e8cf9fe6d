"""pulsar_pekko_streams_example_spark — a PySpark-native engine with the query
and data-processing capabilities of Iterable/pulsar-pekko-streams-example.

The reference (read-only at /root/reference) is a Pulsar + Pekko/ZIO streaming
workload-management engine.  This package re-expresses its entire operator
surface (SURVEY.md §2) Spark-first:

- ``session``    — SparkSession factory with scale-oriented defaults
- ``envelope``   — the canonical message-envelope schema + deterministic
                   attempt-ledger derivation (reference Message[T] analog)
- ``sources``    — batch/streaming source helpers for the test tables
- ``functions``  — scalar/vector/hash function library (JVM-side exprs first)
- ``operators``  — batch operator library (routing, ordering, permits,
                   reconciliation, dedup, similarity, text analysis)
- ``plans``      — the query registry: every operator gets a named query and
                   a DuckDB oracle SQL twin (the driver's correctness gate)
- ``streaming``  — Structured Streaming runtime: workload manager, permit
                   pools, retry/DLQ loop, per-key ordered stateful processing
"""

__version__ = "0.1.0"

from pulsar_pekko_streams_example_spark.session import get_spark, prepare_session

__all__ = ["get_spark", "prepare_session", "__version__"]
