"""Time named registry queries sequentially: N noop-materialized walls each.

Usage: python tools/time_queries.py N query [query ...]
Prints per-run walls + min (the steal-robust statistic on this host).
SF dir from $SPARK_GRAFT_SF_DIR (default sf0.1 — the bench SF).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pulsar_pekko_streams_example_spark.plans.registry import REGISTRY  # noqa: E402
from pulsar_pekko_streams_example_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    n, names = int(sys.argv[1]), sys.argv[2:]
    spark = get_spark(app_name="time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    for name in names:
        walls = []
        for _ in range(n):
            t0 = time.perf_counter()
            df = REGISTRY[name].build(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: min={min(walls)} runs={walls}", flush=True)


if __name__ == "__main__":
    main()
