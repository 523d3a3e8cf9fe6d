"""AQE skew-join splitting: the runtime answer to hot join keys.

operators/partitioning.salted_join is the engine's static skew defense (first
shuffle of a job, streaming, AQE-off pipelines); for everything else the
posture documented in SURVEY §2.8 is "let AQE split the skewed partition at
runtime".  This proves that posture actually fires on this engine's session:
a 90%-one-key fact joined under sort-merge ends with SortMergeJoin(skew=true)
/ AQEShuffleRead skewed in the final adaptive plan, with correct results.

Skew detection compares COMPRESSED shuffle-partition bytes, so the hot rows
carry an incompressible sha2 payload — a constant-key, constant-value hot
partition run-length-compresses below any realistic threshold and the
optimizer (correctly) sees no skew.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import final_plan_of, override_confs


def test_aqe_skew_join_splits_hot_partition(spark):
    n_fact, n_dim = 400_000, 50_000
    # 90% of fact rows share key 0 — one reducer would sort-merge 360k rows
    # while its siblings get a few thousand each
    fact = spark.range(n_fact).select(
        F.when(F.col("id") % 10 == 0, F.col("id") % 1000).otherwise(0).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    dim = spark.range(n_dim).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    with override_confs(
        spark,
        {
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "131072",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "131072",
            # coalescing first would merge the small partitions and shift the
            # median the skew factor compares against
            "spark.sql.adaptive.coalescePartitions.enabled": "false",
        },
    ):
        joined = fact.join(dim, "k").groupBy().agg(
            F.count(F.lit(1)).alias("n"), F.max("payload").alias("p")
        )
        [row] = joined.collect()
        plan = final_plan_of(joined)
    assert "skew=true" in plan, plan
    assert "AQEShuffleRead skewed" in plan, plan
    # correctness: every fact row matches exactly one dim row (keys < n_dim)
    assert row["n"] == n_fact
