"""SparkSession factory and session preparation.

Reference analog: the ActorSystem + Materializer + fixed thread-pool setup in
``part2/SingleWorkloadExample.scala:50-53``.  In Spark the session IS the
engine; everything else (admission control, parallelism caps) is config.

Scale posture (100 TB target):
- AQE on: runtime shuffle-partition coalescing + skew-join splitting replace
  the reference's hand-tuned ``StreamParallelism`` knobs.
- Arrow on: every Python-side exchange is vectorized.
- UTC session timezone: deterministic timestamp semantics across engines
  (the DuckDB oracle reads parquet timestamps as naive/UTC).
- shuffle.partitions defaults to the core count locally; on a real cluster
  AQE coalesces from a high initial number, so the default is a floor, not a
  ceiling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to ANY session we are handed (the driver
# constructs its own SparkSession for verification, so these must not rely on
# builder-time configuration).
_RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # parquet scans: keep filter pushdown + vectorized reader on (defaults,
    # but pinned so a misconfigured parent session can't silently regress)
    "spark.sql.parquet.filterPushdown": "true",
    # the driver's events table stores TIMESTAMP(NANOS) which Spark 4 rejects
    # by default; read as long nanos, converted in sources.tables.load_table
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # timezone-less parquet timestamps (timestamp[us], isAdjustedToUTC=false)
    # must land as TIMESTAMP (LTZ) not TIMESTAMP_NTZ: the engine's epoch
    # arithmetic (unix_micros/unix_millis) and the DuckDB oracle both treat
    # them as instants, and with the UTC session timezone the readings agree
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def prepare_session(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an externally-created session (idempotent).

    Guarded per session object: load_table calls this on every load, and
    each conf.set is a driver py4j round-trip — hundreds of wasted calls per
    bench run without the guard."""
    if getattr(spark, "_ppes_prepared", False):
        return spark
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # non-runtime-settable in this deployment — leave as-is
            pass
    try:
        # An externally-created session (the driver's verifier) usually ships
        # Spark's stock 200 shuffle partitions — 6× the local core count of
        # pure task-scheduling overhead per exchange at sf0.01.  Lower it to
        # the core count, but ONLY when it is the untouched default so any
        # deliberate setting (bench, a real cluster submit) wins.  On a real
        # cluster AQE coalesces from the configured initial number; this is a
        # local-mode latency fix, not a scale knob.
        if spark.conf.get("spark.sql.shuffle.partitions") == "200":
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(os.cpu_count() or 4)
            )
    except Exception:
        pass
    spark._ppes_prepared = True
    return spark


def get_spark(
    app_name: str = "pulsar-pekko-streams-example-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) the engine session.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all local cores.  On a real
    cluster the master/resource settings come from spark-submit; this factory
    only pins semantics + optimizer posture.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or os.cpu_count() or 4
    shuffle = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return prepare_session(builder.getOrCreate())
