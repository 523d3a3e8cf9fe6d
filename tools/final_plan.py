"""Dump the FINAL (post-AQE) physical plan for named registry queries.

Usage: python tools/final_plan.py OUTDIR SUFFIX query [query ...]
Runs each query to completion (collect — these are audit/topk-sized
results) so AdaptiveSparkPlan re-optimizes, then writes
OUTDIR/<query>_<SUFFIX>.txt with isFinalPlan=true: the plan that actually
ran, including ReusedExchange / AQEShuffleRead nodes that the initial
explain cannot show (VERDICT r16 ask #6 — the trained-ANN family's
training-subtree reuse is an AQE runtime decision).
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
    spark = get_spark(app_name="final-plan")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].build(spark, SF_DIR)
        df.collect()  # drive AQE to its final plan on THIS QueryExecution
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        reused = plan.count("ReusedExchange")
        print(f"{name}: final plan -> {path} (ReusedExchange x{reused})")


if __name__ == "__main__":
    main()
