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
