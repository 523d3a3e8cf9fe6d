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
