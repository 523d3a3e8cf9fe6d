"""spread(): the input-parallelism guard for fan-out pipelines.

A single-row-group parquet file plans as ONE input split; everything before
the first shuffle then runs on one core.  spread() must widen exactly that
case — and stay a no-op on inputs that already have enough partitions (the
real-cluster situation, where an extra repartition would be a pure-cost
shuffle of the whole input).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulsar_pekko_streams_example_spark.operators import dedup
from pulsar_pekko_streams_example_spark.operators.partitioning import spread
from pulsar_pekko_streams_example_spark.sources.tables import load_table

from tests.conftest import SF_SMOKE


def test_spread_widens_single_split_scan(spark):
    raw = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    assert raw.rdd.getNumPartitions() == 1
    wide = spread(raw)
    assert wide.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_spread_noops_on_wide_input(spark):
    n = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, 1, n * 2).toDF("x")
    assert spread(wide) is wide  # no repartition node added at all


def test_spread_keeps_pushdown(spark):
    # load_table stays a bare scan (light queries must not pay a shuffle);
    # spread() on top must not block parquet filter pushdown
    li = spread(load_table(spark, SF_SMOKE, "lineitem"))
    q = li.filter(F.col("l_shipdate") <= "1998-09-02").select("l_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    # the filter must still reach the parquet reader through the repartition
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("]")[0]


def test_simhash_histogram_equals_pair_join(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    via_pairs = {
        (r["hamming"], r["pairs"])
        for r in dedup.simhash_near_pairs(docs, 3)
        .groupBy("hamming")
        .agg(F.count(F.lit(1)).alias("pairs"))
        .collect()
    }
    via_hist = {
        (r["hamming"], r["pairs"])
        for r in dedup.simhash_hamming_histogram(docs, 3).collect()
    }
    assert via_hist == via_pairs


def test_salted_join_matches_plain_join(spark):
    """Salting re-buckets the shuffle but must never change the result —
    every (key, salt) pair exists on the replicated dim side."""
    from pulsar_pekko_streams_example_spark.operators.partitioning import salted_join

    # 90% of facts share one hot key
    facts = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 5).alias("k"),
        F.col("id").alias("v"),
    )
    dim = spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 100).alias("w"))

    plain = facts.join(dim, "k").select("k", "v", "w")
    salted = salted_join(facts, dim, "k", n_salts=8).select("k", "v", "w")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))

    semi = salted_join(facts, dim.filter(F.col("k") < 3), "k", how="left_semi")
    plain_semi = facts.join(dim.filter(F.col("k") < 3), "k", "left_semi")
    assert sorted(map(tuple, semi.collect())) == sorted(map(tuple, plain_semi.collect()))


def test_salted_join_rejects_dim_preserving_types(spark):
    from pulsar_pekko_streams_example_spark.operators.partitioning import salted_join

    facts = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="fact-preserving"):
        salted_join(facts, facts, "k", how="full_outer")
