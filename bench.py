"""Benchmark harness — runs the registry's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Timing methodology: each query is built and fully materialized (count of a
cheap terminal agg via ``df.write.format("noop")``) — wall clock per query,
cold plans, shared warmed session (JVM startup excluded; that's harness cost,
not engine cost).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pulsar_pekko_streams_example_spark.plans.registry import REGISTRY, all_queries
from pulsar_pekko_streams_example_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    queries = all_queries()
    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the session (JVM + parquet footer caches) with a trivial action
    spark.range(1).count()

    timings: dict[str, float] = {}
    for name in sorted(queries):
        build = queries[name]
        t0 = time.perf_counter()
        df = build(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "registry_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
                "n_queries": len(timings),
            }
        )
    )


if __name__ == "__main__":
    main()
