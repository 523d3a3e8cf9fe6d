"""Extension example — tokenizer and context-length planning, end to end.

Not a reference scenario (the reference has no data-curation surface); this
is the round-14 planning stack as a pipeline owner would actually drive it
before committing a tokenizer and max_seq_len:

    vocabulary coverage curve  → how big must the type vocabulary be?
    truncation loss curve      → what does each candidate max_seq_len cost?
    BPE train → apply → count  → what do the first merges buy?
    fertility by source        → does the pooled tokenizer over-fragment
                                 any source?
    cross-corpus LM filter     → which sources drift from the reference
                                 slice (CCNet gate)?

Every step is a registry query — the exact artifacts the DuckDB oracle gate
checks — so this example doubles as the "switching user" walkthrough for the
tokenizer/planning family: the operators compose, the invariants hold, and
nothing needs more than a SparkSession and a parquet directory.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from examples._common import main
from pulsar_pekko_streams_example_spark.plans import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMOKE", "/root/testdata/sf0.001")


def run(spark: SparkSession, workdir: str) -> dict:
    # 1. vocabulary sizing: coverage must be monotone in depth and saturate
    #    once the depth exceeds the type count
    cov = sorted(
        REGISTRY["vocab_coverage_curve"].build(spark, SF_DIR).collect(),
        key=lambda r: r.depth,
    )
    assert cov and all(
        a.covered_tokens <= b.covered_tokens for a, b in zip(cov, cov[1:])
    ), "coverage must be non-decreasing in depth"
    assert cov[-1].coverage_permille <= 1000
    full_at = next(
        (r.depth for r in cov if r.covered_tokens == r.total_tokens), None
    )

    # 2. context-length budgeting: loss must be non-increasing in max_len
    #    and the kept+lost decomposition must be exact
    trunc = sorted(
        REGISTRY["truncation_loss_curve"].build(spark, SF_DIR).collect(),
        key=lambda r: r.max_len,
    )
    assert all(a.tokens_lost >= b.tokens_lost for a, b in zip(trunc, trunc[1:]))
    for r in trunc:
        assert r.tokens_lost + r.tokens_kept == trunc[0].tokens_lost + trunc[0].tokens_kept

    # 3. the tokenizer itself: the merge table's occurrence accounting must
    #    agree with the corpus compression it reports
    enc = REGISTRY["bpe_encode_stats"].build(spark, SF_DIR).collect()
    assert enc, "the smoke corpus trains at least one merge"
    assert all(r.syms_after <= r.syms_before for r in enc), "merging never grows the corpus"
    assert all(r.occurrences > 0 for r in enc), "a winning merge must survive somewhere"

    # 4. per-source fertility: every source must report, ratios must be sane
    fert = REGISTRY["tokenizer_fertility_by_source"].build(spark, SF_DIR).collect()
    assert fert and all(r.fertility_milli >= 1000 for r in fert), (
        "a word encodes to >= 1 token"
    )
    spread_milli = max(r.fertility_milli for r in fert) - min(
        r.fertility_milli for r in fert
    )

    # 5. the CCNet gate: held docs exist, OOV is a permille, surprisal > 0
    lm = REGISTRY["crosslm_perplexity_filter"].build(spark, SF_DIR).collect()
    assert lm and all(0 <= r.oov_permille <= 1000 for r in lm)
    assert all(r.avg_surprisal > 0 for r in lm)

    return {
        "vocab_full_coverage_at_depth": full_at,
        "loss_permille_at_smallest_len": trunc[0].loss_permille,
        "merges_trained": len(enc),
        "compression_permille": enc[0].syms_after * 1000 // enc[0].syms_before,
        "fertility_spread_milli": spread_milli,
        "lm_scored_sources": len(lm),
    }


if __name__ == "__main__":
    main(run)
