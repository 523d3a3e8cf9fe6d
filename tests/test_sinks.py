"""Partitioned sink layout: round-trips across formats and — the scale
property — partition-pruned reads (PartitionFilters in the scan, not a
post-hoc filter over all partitions)."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from pulsar_pekko_streams_example_spark.sources.sinks import (
    read_partitioned,
    republish,
    write_partitioned,
)
from pulsar_pekko_streams_example_spark.sources.tables import load_table

from tests.conftest import SF_SMOKE
from tests.test_plans import plan_of


@pytest.fixture()
def tmpdir():
    with tempfile.TemporaryDirectory() as d:
        yield d


def test_partitioned_roundtrip_all_formats(spark, tmpdir):
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "day", F.col("ts").cast("date").cast("string")
    )
    n = ev.count()
    for fmt in ("parquet", "orc", "json", "csv"):
        path = os.path.join(tmpdir, fmt)
        write_partitioned(ev, path, ["event_type"], fmt=fmt)
        back = read_partitioned(spark, path, fmt=fmt)
        assert back.count() == n
        assert set(back.select("event_type").distinct().toPandas()["event_type"]) == {
            "click", "error", "purchase", "signup", "view",
        }


def test_overwrite_replaces_only_the_partitions_present(spark, tmpdir):
    """write_partitioned's overwrite is DYNAMIC — the idempotent republish
    contract: re-writing one routing slice replaces THAT slice and leaves
    every other partition intact.  Pre-fix the session-default STATIC
    overwrite deleted every existing partition on each incremental write —
    silent loss of all prior days."""
    path = os.path.join(tmpdir, "sink")
    day1 = spark.createDataFrame([("a", "d1"), ("b", "d1")], "id string, day string")
    day2 = spark.createDataFrame([("c", "d2")], "id string, day string")
    write_partitioned(day1, path, ["day"])
    write_partitioned(day2, path, ["day"])
    assert sorted(
        (r.id, r.day) for r in read_partitioned(spark, path).collect()
    ) == [("a", "d1"), ("b", "d1"), ("c", "d2")]  # d1 SURVIVES the d2 write

    # replaying a slice overwrites it exactly once (idempotent republish)
    day2_replay = spark.createDataFrame([("c2", "d2")], "id string, day string")
    write_partitioned(day2_replay, path, ["day"])
    assert sorted(
        (r.id, r.day) for r in read_partitioned(spark, path).collect()
    ) == [("a", "d1"), ("b", "d1"), ("c2", "d2")]


def test_partition_pruning_in_scan(spark, tmpdir):
    ev = load_table(spark, SF_SMOKE, "events")
    path = os.path.join(tmpdir, "by_type")
    write_partitioned(ev, path, ["event_type"])
    pruned = read_partitioned(spark, path).filter(F.col("event_type") == "error")
    plan = plan_of(pruned.select("event_id"))
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "event_type" in pf  # the predicate prunes directories, not rows


def test_republish_increments_hop(spark, tmpdir):
    from examples._common import seed_messages

    msgs = seed_messages(spark, 20)
    out = republish(msgs)
    assert out.agg(F.min("attempt"), F.max("attempt")).collect()[0] == (2, 2)


def test_republish_null_hop_counter_ages(spark):
    """A NULL hop counter must still age on republish: NULL+1=NULL would
    freeze the counter forever, so the hop ledger and the retry budget
    would never see those messages make progress.  NULL coalesces to 1
    (first attempt) before the increment — the same contract
    RetryRouter.route_batch applies to NULL attempts."""
    msgs = spark.createDataFrame(
        [("m1", None), ("m2", 3)], "message_id string, attempt long"
    )
    got = {r.message_id: r.attempt for r in republish(msgs).collect()}
    assert got == {"m1": 2, "m2": 4}
    # and it keeps aging on the next hop
    got2 = {r.message_id: r.attempt for r in republish(republish(msgs)).collect()}
    assert got2 == {"m1": 3, "m2": 5}
