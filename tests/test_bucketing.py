"""Bucketed-table co-located joins: the pre-shuffle layout strategy.

SURVEY §2's scale posture claims bucketing co-locates fact joins; this proves
it: two tables bucketed by the join key produce a sort-merge join with NO
Exchange on either side — the shuffle happened once at write time, every
subsequent join is free.  At 100 TB this is the difference between re-
shuffling 100 TB per join and never shuffling it again.
"""

from __future__ import annotations

import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from pulsar_pekko_streams_example_spark.sources.tables import load_table

from tests.conftest import SF_SMOKE
from tests.test_plans import plan_of


@pytest.fixture()
def bucket_db(spark):
    name = f"bucketdb_{uuid.uuid4().hex[:8]}"
    spark.sql(f"CREATE DATABASE {name}")
    yield name
    spark.sql(f"DROP DATABASE {name} CASCADE")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{name}.db", ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, bucket_db):
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable(f"{bucket_db}.orders_b")
    )
    (
        lineitem.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable(f"{bucket_db}.lineitem_b")
    )

    ob = spark.table(f"{bucket_db}.orders_b")
    lb = spark.table(f"{bucket_db}.lineitem_b")

    def build():
        return (
            ob.join(lb, ob.o_orderkey == lb.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    # sf0.001 tables would broadcast (correct at this size); force the
    # sort-merge path the fact-fact join takes at real scale.  The conf is
    # captured when the DataFrame is CREATED, so build inside the window.
    threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = build()
        plan = plan_of(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    # exactly ONE Exchange in the whole plan — the post-join groupBy shuffle;
    # a second one would mean a join input was re-shuffled despite bucketing
    n_exchanges = plan.count(") Exchange")
    assert n_exchanges == 1, f"expected 1 exchange (groupBy), found {n_exchanges}"

    # and the answer matches the unbucketed plan
    plain = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))
