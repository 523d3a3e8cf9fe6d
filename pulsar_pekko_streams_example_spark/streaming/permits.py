"""A1–A4: global admission control across workloads.

Reference: ``PermittedTaskExecutor`` (``part3/PermittedTaskExecutor.scala:41-167``)
— a queue-backed stream executing submitted thunks with a global concurrency
cap (``globalPermitLimit``), queue depth ``maxTasksQueued``, and bounded
concurrent offers; per-stream caps compose on top
(``part3/PermittedPekkoStreamGenerator.scala:58-79``).

Spark-first: concurrency is the scheduler's job, so the permit system becomes
configuration + admission, not a custom executor:

- the GLOBAL cap is the executor core budget (``local[N]`` / cluster cores):
  Spark never runs more than that many tasks — exactly the permit invariant;
- FAIR scheduler pools give per-workload weights/minShares (a busy workload
  queues instead of starving others) — the reference's queue smoothing;
- per-source admission (``maxOffsetsPerTrigger``/``maxFilesPerTrigger``
  analogs) bounds in-flight rows per micro-batch — ``maxTasksQueued``;
- the *accounting* invariant (running ≤ limit at every instant) is checked as
  data by the ``permit_running_max`` ledger query (plans/core_queries.py).

``PermitSystem.ledger_conf`` below returns the conf set; ``admit`` applies
per-stream read limits.
"""

from __future__ import annotations

import atexit
import os
import tempfile
from dataclasses import dataclass

from pyspark.sql import SparkSession

FAIR_SCHEDULER_XML = """<?xml version="1.0"?>
<allocations>
  <pool name="default">
    <schedulingMode>FAIR</schedulingMode>
    <weight>1</weight>
    <minShare>1</minShare>
  </pool>
</allocations>
"""


@dataclass(frozen=True)
class PermitConfig:
    """BASELINE.md envelope: globalPermitLimit 5/20, queue 20, waiting 10/20."""

    global_permit_limit: int = 20
    max_tasks_queued: int = 20
    max_tasks_waiting: int = 20


def fair_scheduler_confs(config: PermitConfig) -> dict[str, str]:
    """Builder-time confs implementing the global cap + fair sharing.

    The permit limit maps to the core budget: tasks beyond it queue in the
    scheduler exactly like the reference's Source.queue backlog.
    """
    xml = tempfile.NamedTemporaryFile(
        "w", suffix=".xml", prefix="fairscheduler", delete=False
    )
    xml.write(FAIR_SCHEDULER_XML)
    xml.close()
    # the JVM reads the file once at session build; reclaim it at interpreter
    # exit so repeated session builds don't accrete temp files
    atexit.register(lambda p=xml.name: os.path.exists(p) and os.unlink(p))
    return {
        "spark.scheduler.mode": "FAIR",
        "spark.scheduler.allocation.file": xml.name,
        # local mode: local[N] with N = global_permit_limit IS the permit cap
    }


def admission_options(config: PermitConfig) -> dict[str, str]:
    """Per-stream reader options bounding in-flight work per micro-batch
    (receiver-queue / maxTasksQueued analog)."""
    return {"maxFilesPerTrigger": str(max(1, config.max_tasks_queued // 10))}


def use_pool(spark: SparkSession, pool: str | None) -> None:
    """Route subsequently-submitted jobs on this thread to a scheduler pool."""
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
