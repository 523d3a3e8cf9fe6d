"""Extension example — choosing an ANN index, driven by the engine's own
quality ledgers.

Not a reference scenario (the reference has no similarity surface); this is
the decision workflow a 100 TB embedding deployment actually runs, each step
a registry query the DuckDB oracle gate checks:

    exact cosine top-k (ground truth, the audit path)
    → ann_method_recall_matrix (recall of EVERY approximate path at once:
      hyperplane-LSH, IVF, PQ/ADC, composed IVFADC, ADC+refine)
    → ann_ivf_recall_report (the nprobe tuning curve: the smallest probe
      count whose recall clears the product bar)
    → ann_pq_refine_topk (the accuracy/IO trade: refine must dominate ADC)

The invariants asserted here are the ones that make the ledgers trustworthy:
the matrix tiles its ground truth exactly, the nprobe curve is monotone,
and refinement can only help.
"""

from __future__ import annotations

import os

from examples._common import main
from pulsar_pekko_streams_example_spark.plans import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMOKE", "/root/testdata/sf0.001")


def run(spark, workdir: str) -> dict:
    # 1. ground truth: the exact brute-force path (the audit you run on a
    # sample before trusting any index)
    exact = REGISTRY["ann_cosine_topk"].build(spark, SF_DIR).collect()
    assert exact, "ground truth must rank at least one neighbor"
    n_truth = len(exact)

    # 2. the method matrix: one recall row per approximate path
    matrix = {
        r.method: r
        for r in REGISTRY["ann_method_recall_matrix"].build(spark, SF_DIR).collect()
    }
    assert set(matrix) == {
        "lsh", "ivf", "pq_adc", "ivfadc", "pq_refine", "ivf_trained",
        "ivfadc_residual", "ivfadc_trained", "pq_trained",
        "ivfadc_residual_refine",
    }
    for r in matrix.values():
        assert r.exact_pairs == n_truth, "every row shares one ground truth"
        assert r.found + r.missed == r.exact_pairs, "the ledger must tile"
    # refinement can only help: any true top-k pair surviving the ADC
    # shortlist is guaranteed into the refined top-k
    assert matrix["pq_refine"].found >= matrix["pq_adc"].found

    # 3. the IVF tuning curve: recall@k per nprobe, monotone by construction
    curve = sorted(
        REGISTRY["ann_ivf_recall_report"].build(spark, SF_DIR).collect(),
        key=lambda r: r.nprobe,
    )
    assert all(a.found <= b.found for a, b in zip(curve, curve[1:]))
    # the deployment decision: smallest nprobe clearing an 80% recall bar
    bar = 800_000
    cleared = [r.nprobe for r in curve if r.recall_micro >= bar]
    nprobe_pick = cleared[0] if cleared else None

    # 4. the winning method at this corpus, by recall then name (ties break
    # deterministically so the example is reproducible)
    best = max(matrix.values(), key=lambda r: (r.recall_micro, r.method))

    return {
        "ground_truth_pairs": n_truth,
        "recall_micro": {m: r.recall_micro for m, r in sorted(matrix.items())},
        "best_method": best.method,
        "nprobe_for_80pct": nprobe_pick,
        "ivf_curve_points": len(curve),
    }


if __name__ == "__main__":
    main(run)
