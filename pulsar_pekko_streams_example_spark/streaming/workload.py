"""Control plane: dynamic workload discovery → per-workload streaming queries.

Reference: ``WorkloadManagementService`` (``part4/WorkloadManagementService.scala``)
— a registry of running streams (TrieMap ``:105-106``), backpressured
start/stop queues (``:118-152``), a 5-second discovery tick (``:161-202``),
set-difference reconciliation (``:44-50``), duplicate-start filtering
(``:122-124``) and graceful drain-then-shutdown (``part1/PulsarPekkoSource.scala:75-113``).

Spark-first: one ``StreamingQuery`` per workload; the registry is a dict on
the driver (control state is tiny — it was a TrieMap in the reference too);
reconciliation is set difference over workload names (its SQL form is the
``reconciliation`` anti-join query in plans/core_queries.py); graceful stop =
``processAllAvailable()`` then ``stop()``.  Each workload gets its own FAIR
scheduler pool so a busy workload can't starve the others (the reference's
per-stream dispatcher isolation).
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery


@dataclass(frozen=True)
class Workload:
    """part4/WorkloadManagementService.scala:35-42 — equality by name only."""

    workload_name: str
    topic: str  # source identifier (path/topic)
    processing_parallelism: int = 5
    ack_parallelism: int = 5
    ordered: bool = False

    def __eq__(self, other: object) -> bool:
        return isinstance(other, Workload) and other.workload_name == self.workload_name

    def __hash__(self) -> int:
        return hash(self.workload_name)


@dataclass
class WorkloadReport:
    """part4/WorkloadManagementService.scala:44-50."""

    requested: set[Workload]
    existing: set[Workload]

    @property
    def workloads_to_start(self) -> set[Workload]:
        return self.requested - self.existing

    @property
    def workloads_to_delete(self) -> set[Workload]:
        return self.existing - self.requested


StreamFactory = Callable[[Workload], StreamingQuery]


@dataclass
class WorkloadManager:
    """L1–L6: start/stop queues collapse into direct (locked) registry ops —
    Spark's StreamingQuery.start is already async; queue backpressure was a
    Pekko materialization concern that has no analog here."""

    spark: SparkSession
    stream_factory: StreamFactory
    registry: dict[str, StreamingQuery] = field(default_factory=dict)
    _lock: threading.Lock = field(default_factory=threading.Lock)

    def running(self) -> set[str]:
        with self._lock:
            return set(self.registry)

    def start(self, workload: Workload) -> bool:
        """L1 with T6 duplicate filter: no-op if the name is registered."""
        with self._lock:
            if workload.workload_name in self.registry:
                return False
            # per-workload FAIR pool — the per-stream dispatcher isolation
            self.spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", workload.workload_name
            )
            try:
                query = self.stream_factory(workload)
            finally:
                self.spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)
            self.registry[workload.workload_name] = query
            return True

    def stop(self, workload_name: str, drain: bool = True) -> bool:
        """L2 + L6 graceful shutdown: drain in-flight work, then stop."""
        with self._lock:
            query = self.registry.pop(workload_name, None)
        if query is None:
            return False
        if drain and query.isActive:
            try:
                query.processAllAvailable()  # complete() + drain analog
            except Exception:
                pass
        query.stop()  # close() analog
        return True

    def reconcile(self, requested: set[Workload]) -> WorkloadReport:
        """L3/L4 one discovery tick: diff desired vs running, apply both sides."""
        with self._lock:
            existing_names = set(self.registry)
        existing = {Workload(n, "") for n in existing_names}
        report = WorkloadReport(requested=set(requested), existing=existing)
        for w in report.workloads_to_start:
            self.start(w)
        for w in report.workloads_to_delete:
            self.stop(w.workload_name)
        return report

    def run_discovery_loop(
        self,
        get_requested: Callable[[], set[Workload]],
        interval_s: float = 5.0,
        stop_event: threading.Event | None = None,
    ) -> threading.Thread:
        """L3 discovery tick (Source.tick 5 s analog) on a daemon thread."""
        stop_event = stop_event or threading.Event()

        def loop() -> None:
            while not stop_event.is_set():
                self.reconcile(get_requested())
                stop_event.wait(interval_s)

        t = threading.Thread(target=loop, daemon=True, name="workload-discovery")
        t.stop_event = stop_event  # type: ignore[attr-defined]
        t.start()
        return t

    def shutdown_all(self) -> None:
        """L9 coordinated shutdown: drain + stop every registered query."""
        for name in list(self.running()):
            self.stop(name)
