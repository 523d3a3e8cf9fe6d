"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``pulsar_pekko_streams_example_spark`` — this module
only adapts the registry to the driver's calling convention.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pulsar_pekko_streams_example_spark.plans.registry import all_oracles, all_queries
from pulsar_pekko_streams_example_spark.session import prepare_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Decodes the message envelope from the events table, keeps terminal
    successes, aggregates per (topic, key) — exercising source decode,
    per-record transform, per-key aggregation and the hop counter in one plan
    (SURVEY.md §7 M0).
    """
    prepare_session(spark)
    return all_queries()["envelope_decode_per_key"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL twin per query (omitted => rows-only check)."""
    return all_oracles()
