"""Dump .explain("formatted") for named registry queries to files.

Usage: python tools/explain_query.py OUTDIR SUFFIX query [query ...]
Writes OUTDIR/<query>_<SUFFIX>.txt per query (sf dir from
$SPARK_GRAFT_SF_DIR, default /root/testdata/sf0.001 — plan SHAPE is
sf-independent; only AQE runtime stats differ).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pulsar_pekko_streams_example_spark.plans.registry import REGISTRY  # noqa: E402
from pulsar_pekko_streams_example_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].build(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(path, len(plan.splitlines()), "lines")


if __name__ == "__main__":
    main()
