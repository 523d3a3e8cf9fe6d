"""Part 4 — dynamic workload discovery and lifecycle.

Reference: ``WorkloadDiscoveryExample`` (part4/WorkloadDiscoveryExample.scala:64)
— a 5-second tick polls the discovery service, diffs desired vs running
(WorkloadManagementService.scala:44-50) and starts/stops streams; the script
then walks the desired state through add → remove → re-add transitions
(:164-194).

Spark twin: the same choreography through ``WorkloadManager.reconcile`` —
each tick is two set differences; stops drain before closing (L6).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from examples._common import main
from pulsar_pekko_streams_example_spark.sources.streams import rate_stream
from pulsar_pekko_streams_example_spark.streaming.workload import (
    Workload,
    WorkloadManager,
)


def run(spark: SparkSession, base: str) -> dict:
    def factory(w: Workload):
        return (
            rate_stream(spark, rows_per_second=5)
            .writeStream.format("noop")
            .queryName(w.workload_name)
            .start()
        )

    mgr = WorkloadManager(spark=spark, stream_factory=factory)
    w = {n: Workload(n, f"persistent://testing/part4/{n}") for n in "abc"}

    transitions = [
        ({w["a"], w["b"]}, {"a", "b"}),   # initial start       (:174-178)
        ({w["b"], w["c"]}, {"b", "c"}),   # stop a, start c     (:180-186)
        (set(), set()),                   # stop everything     (:188-194)
        ({w["a"]}, {"a"}),                # restart a (names reusable after stop)
    ]
    observed = []
    for desired, expect_running in transitions:
        report = mgr.reconcile(desired)
        # supervision contract (round-9 sweep): tick failures are data on
        # the report, never exceptions that abort the tick
        assert not report.start_errors and not report.stop_errors
        running = mgr.running()
        assert running == expect_running, (running, expect_running)
        observed.append(sorted(running))

    assert mgr.shutdown_all() == {}  # every stop converged
    assert mgr.running() == set()
    return {"transitions": observed}


if __name__ == "__main__":
    main(run)
