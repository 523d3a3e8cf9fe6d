"""Input-parallelism guard for fan-out operators.

Fan-out pipelines (tokenize → explode shingles → self-join) do their heavy
work BEFORE the first shuffle: whatever parallelism the scan has is the
parallelism of the explode and of every per-row hash expression.  A narrow
scan (one small parquet file = one row group = ONE task) therefore serializes
the entire pre-shuffle pipeline onto a single core, no matter how many the
session has.

``spread`` repartitions such narrow inputs up to the session's default
parallelism.  The repartition shuffles only the RAW input rows (tiny compared
to the exploded/fanned-out data) and is a no-op on inputs that already arrive
in enough splits — which is exactly the situation on a real cluster reading
100 TB across thousands of files, so at scale this guard costs nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the session default parallelism iff it is a
    batch DataFrame currently planned with fewer partitions than that."""
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Hot-key-safe equi-join: fact rows get a salt in [0, n_salts); the
    (small) ``dim`` side is replicated once per salt value, so one hot key
    spreads across ``n_salts`` shuffle partitions instead of melting a
    single reducer.

    AQE's skew-join split handles this at runtime for sort-merge joins —
    prefer it when available.  Salting still matters where AQE can't see or
    split the skew: stateful/streaming joins, the FIRST shuffle of a job
    (no runtime stats yet), or engines/pipelines with AQE off.  The salt
    value never affects the result — every (key, salt) pair exists on the
    replicated side — it only re-buckets the shuffle.

    Only fact-preserving join types are legal: the replication would
    duplicate unmatched dim rows under right/full joins.
    """
    if how not in ("inner", "left", "left_semi", "leftsemi", "left_anti", "leftanti"):
        raise ValueError(f"salted_join supports fact-preserving joins only, not {how!r}")
    from pyspark.sql import functions as F

    f = facts.withColumn(
        "__salt",
        F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int"),
    )
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("int") for i in range(n_salts)]))
    )
    on = [F.col(f"f.{key}") == F.col(f"d.{key}"), F.col("f.__salt") == F.col("d.__salt")]
    joined = f.alias("f").join(d.alias("d"), on, how)
    if how in ("left_semi", "leftsemi", "left_anti", "leftanti"):
        return joined.drop("__salt")
    return joined.drop(F.col("d.__salt")).drop(F.col("f.__salt")).drop(F.col(f"d.{key}"))


def write_bucketed(
    df: DataFrame,
    key: str,
    n_buckets: int,
    table: str,
    path: str,
) -> DataFrame:
    """Persist ``df`` as an external parquet table BUCKETED by ``key`` (and
    sorted by it within each bucket), returning the catalog-backed frame.

    Bucketing is the 100 TB answer to "this join/aggregation key is used by
    every nightly job": both sides pre-hashed into the same number of
    buckets join WITHOUT a shuffle (Spark plans a SortMergeJoin whose
    children are bare scans — zero Exchange), and an equality filter on the
    bucket key prunes to 1/n_buckets of the files before the scan starts
    (``SelectedBucketsCount`` in the plan).  The one-time write pays the
    shuffle ONCE instead of per-query.

    Replaces the reference's JavaStringHash key routing to partitioned
    topics (util/PulsarClientWrapper.scala:158, RoundRobin routing :151-162)
    with the relational equivalent: a durable hash-layout contract.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.write.format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .saveAsTable(table)
    )
    return spark.table(table)
