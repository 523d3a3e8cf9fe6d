"""Oracle-verify + time a subset of registry queries (local measurement aid).

Usage: python tools/verify_subset.py [--sf SF_DIR] query [query ...]
Mirrors the driver's gate: schema + order-insensitive normalized values vs
the DuckDB oracle, plus each query's noop-materialized wall at the same SF.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from pulsar_pekko_streams_example_spark import verify as V  # noqa: E402
from pulsar_pekko_streams_example_spark.plans.registry import (  # noqa: E402
    REGISTRY,
    all_oracles,
)
from pulsar_pekko_streams_example_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf = args[1]
        args = args[2:]
    spark = get_spark(app_name="verify-subset")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    oracles = all_oracles()
    fails = []
    for name in args:
        t0 = time.perf_counter()
        df = REGISTRY[name].build(spark, sf)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        problems = V.compare(REGISTRY[name].build(spark, sf), con.sql(oracles[name]))
        status = "MATCH" if not problems else f"MISMATCH {problems[:3]}"
        print(f"{name}: {status}  wall={wall:.2f}s")
        if problems:
            fails.append(name)
    print("RESULT:", "ALL_MATCH" if not fails else fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
