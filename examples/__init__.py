"""Runnable Spark twins of the reference's five tutorial examples.

The reference's user-facing surface is five example programs (its README runs
them one by one); each module here reproduces one scenario on this engine —
same seed messages, same invariants, asserted instead of log-inspected.

| module | reference entry point |
|---|---|
| part1_backpressured_source | part1 example (README.md:96-123) |
| part2_single_workload | part2/SingleWorkloadExample.scala:47 |
| part3_multiple_workloads | part3/MultipleWorkloadsExample.scala:173 |
| part4_workload_discovery | part4/WorkloadDiscoveryExample.scala:64 |
| part5_ordered_workloads | part5/OrderedWorkloadsExample.scala:70 |

Each module exposes ``run(spark, workdir) -> dict`` (summary metrics) and is
directly runnable: ``python -m examples.part2_single_workload``.
"""
