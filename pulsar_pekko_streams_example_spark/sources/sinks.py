"""Batch/stream sinks: partitioned table layout + the republish path.

Reference analogs: the producer sink (S3, ``util/PulsarClientWrapper.scala:48-49``
— republish with hop counter ``PulsarClientSetup.scala:17``) and key-hash
routing (S4, JavaStringHash → partition, ``:158``).

At 100 TB the sink *layout* is the performance feature: partitioning by a
low-cardinality routing column turns downstream topic/day-scoped reads into
partition-pruned scans (Spark plans them with PartitionFilters — zero I/O
outside the requested partitions), and bucketing by key co-locates joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def republish(df: DataFrame) -> DataFrame:
    """The producer republish transform: hop counter + 1
    (util/PulsarClientSetup.scala:17).

    NULL hop counters coalesce to 1 before the increment: the reference's
    counter is a non-nullable Int so the case can't arise there, but our
    envelope admits NULLs, and NULL+1=NULL would freeze the counter at
    NULL across every republish — the hop ledger (hop_monotonic) and the
    retry budget would never see those messages age.  Same
    NULL-attempt-is-first-attempt contract as RetryRouter.route_batch."""
    return df.withColumn(
        "attempt", F.coalesce(F.col("attempt"), F.lit(1)) + F.lit(1)
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write a table partitioned by routing columns (topic/day/...).

    ``fmt`` ∈ parquet|orc|json|csv: columnar formats for engine tables, json/csv for
    interchange — all three share the same partition layout and pruning.

    ``mode='overwrite'`` is DYNAMIC: only the partitions present in ``df``
    are replaced (the idempotent republish contract — replaying one
    topic/day overwrites that slice).  Spark's session default is STATIC
    overwrite, which would delete EVERY existing partition on each write —
    for an incremental sink helper that is silent data loss, so the dynamic
    mode is pinned per-write here rather than left to session config."""
    writer = df.write.format(fmt).mode(mode).partitionBy(*partition_by)
    if mode == "overwrite":
        writer = writer.option("partitionOverwriteMode", "dynamic")
    if fmt == "csv":
        writer = writer.option("header", "true")
    writer.save(path)


def read_partitioned(
    spark: SparkSession, path: str, fmt: str = "parquet", schema: str | None = None
) -> DataFrame:
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if schema:
        reader = reader.schema(schema)
    return reader.load(path)
