"""Batch table loaders for the driver's parquet test tables.

Reference analog: topic subscription (``util/PulsarClientWrapper.scala:203-226``)
— a named durable stream becomes, in batch-analytic form, a named parquet
table.  At 100 TB these would be partitioned/bucketed table locations; the
loader stays a thin `spark.read.parquet` so Catalyst owns pushdown/pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pulsar_pekko_streams_example_spark.session import prepare_session

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table.  Keeps the scan bare so filter pushdown and
    column pruning reach the parquet reader (verify with .explain: the scan
    should show PushedFilters / a narrow ReadSchema).

    Deliberately NOT wrapped in ``operators.partitioning.spread``: scan-then-
    aggregate queries are fine at the scan's natural parallelism, and blanket
    repartitioning taxed every light query with an extra exchange (measured:
    bench total 24 s → 42 s).  Fan-out operators that DO need pre-shuffle
    parallelism (shingle explode, signature hashing) call spread themselves.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    prepare_session(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS); with nanosAsLong it arrives as long
        # nanos.  Integer `div` (not `/`) — int64 nanos exceed double's 53-bit
        # mantissa — then truncate to µs exactly like DuckDB's ns→µs read.
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)
