"""Emit a one-line-per-query physical-plan census (TSV) for the whole
registry: operator counts + scan pushdown evidence, at a small SF (plan
SHAPE is sf-independent).

Usage: python tools/plan_census.py OUT.tsv [sf_dir]
Columns: query, ops, exchanges, bnlj, smj, shj, bhj, windows, scans,
scans_with_pushed_filters.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pulsar_pekko_streams_example_spark.plans.registry import REGISTRY  # noqa: E402
from pulsar_pekko_streams_example_spark.session import get_spark  # noqa: E402


def main() -> None:
    out = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan-census")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name in sorted(REGISTRY):
        df = REGISTRY[name].build(spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        # count operators from the numbered detail headers: "(N) OpName"
        heads = re.findall(r"^\((\d+)\)\s+(\S+)", plan, flags=re.M)
        ops = {h[1] for h in heads} and len(heads)
        def n(op: str) -> int:
            return sum(1 for _, o in heads if o == op)
        scans = sum(1 for _, o in heads if o.startswith("Scan"))
        pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
        rows.append(
            (
                name,
                ops,
                n("Exchange"),
                n("BroadcastNestedLoopJoin"),
                n("SortMergeJoin"),
                n("ShuffledHashJoin"),
                n("BroadcastHashJoin"),
                n("Window"),
                scans,
                pushed,
            )
        )
        print(name, rows[-1][1:])
    with open(out, "w") as fh:
        fh.write(
            "query\tops\texchanges\tbnlj\tsmj\tshj\tbhj\twindows\tscans"
            "\tscans_with_pushed_filters\n"
        )
        for r in rows:
            fh.write("\t".join(str(x) for x in r) + "\n")


if __name__ == "__main__":
    main()
