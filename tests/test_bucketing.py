"""Bucketed-layout contract: co-located joins and bucket pruning.

The 100 TB posture for a join key that every nightly job reuses is to pay
the shuffle ONCE at write time: both sides bucketed by the key into the
same bucket count join with ZERO Exchange in the plan, and an equality
filter on the bucket key scans 1/n of the files (bucket pruning).  These
tests prove both properties end to end against real bucketed parquet
written through operators/partitioning.write_bucketed.
"""

from __future__ import annotations

import pytest

from pulsar_pekko_streams_example_spark.operators.partitioning import write_bucketed
from pulsar_pekko_streams_example_spark.sources.tables import load_table

from tests.conftest import SF_SMOKE, final_plan_of, override_confs

N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    bo = write_bucketed(
        orders, "o_orderkey", N_BUCKETS, "bkt_orders", str(base / "orders")
    )
    bl = write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "o_orderkey",
        N_BUCKETS,
        "bkt_lineitem",
        str(base / "lineitem"),
    )
    yield bo, bl
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    bo, bl = bucketed_pair
    with override_confs(spark, {"spark.sql.autoBroadcastJoinThreshold": "-1"}):
        joined = bo.join(bl, "o_orderkey").groupBy("o_orderstatus").count()
        plan = final_plan_of(joined)
        # the join itself is shuffle-free: the ONLY allowed exchange is the
        # one the downstream groupBy introduces AFTER the join
        join_part = plan.split("SortMergeJoin")[-1]
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan
        assert "Exchange" not in join_part, join_part
        # cross-check the result is right, not just the plan shape
        rows = {r["o_orderstatus"]: r["count"] for r in joined.collect()}
        lineitem = load_table(spark, SF_SMOKE, "lineitem")
        orders = load_table(spark, SF_SMOKE, "orders")
        expect = {
            r["o_orderstatus"]: r["count"]
            for r in lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
            .join(orders, "o_orderkey")
            .groupBy("o_orderstatus")
            .count()
            .collect()
        }
        assert rows == expect


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_pair):
    _, bl = bucketed_pair
    agg = bl.groupBy("o_orderkey").count()
    plan = final_plan_of(agg)
    assert "Exchange" not in plan, plan


def test_bucket_pruning_scans_one_bucket(spark, bucketed_pair):
    bo, _ = bucketed_pair
    some_key = bo.limit(1).collect()[0]["o_orderkey"]
    # autoBucketedScan drops the bucketed layout when no downstream operator
    # wants the hash partitioning — pin it on so the point-lookup filter can
    # prune to a single bucket's files
    with override_confs(
        spark, {"spark.sql.sources.bucketing.autoBucketedScan.enabled": "false"}
    ):
        plan = final_plan_of(bo.filter(f"o_orderkey = {some_key}"))
    assert f"SelectedBucketsCount: 1 out of {N_BUCKETS}" in plan, plan
