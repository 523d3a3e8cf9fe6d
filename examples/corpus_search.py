"""Extension example — corpus search and ranking QA, end to end.

Not a reference scenario (the reference has no query surface); this is the
round-13 retrieval stack as a user would actually drive it:

    boolean AND search  → BM25 OR-ranking over the same terms
    → rank-biased overlap between the two rankers (did scoring matter?)
    → a trained language-ID probe + its reliability curve (is the cheap
      score worth gating on?)

Every step is a registry query — the exact artifacts the DuckDB oracle
gate checks — so this example doubles as the "switching user" walkthrough:
the operators compose, the invariants hold, and nothing here needs more
than a SparkSession and a parquet directory.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from examples._common import main
from pulsar_pekko_streams_example_spark.plans import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMOKE", "/root/testdata/sf0.001")


def run(spark: SparkSession, workdir: str) -> dict:
    # 1. the two rankers over the same 3-term query
    keyword = REGISTRY["keyword_search_topk"].build(spark, SF_DIR).collect()
    bm25 = REGISTRY["bm25_search_topk"].build(spark, SF_DIR).collect()
    assert bm25, "BM25 must rank at least one document"
    scores = [r.score_pico for r in bm25]
    assert scores == sorted(scores, reverse=True), "BM25 output must be rank-ordered"
    # OR semantics is a superset of AND semantics
    and_ids = {r.doc_id for r in keyword}
    or_ids = {r.doc_id for r in bm25}
    assert len(or_ids) >= min(len(and_ids), 1)

    # 1b. stage-2 dense rerank over the BM25 candidates (round 14): the
    # candidate SET is unchanged BY CONTRACT — since round 15 the query
    # left-joins embeddings, so candidates without one stay in the output
    # at cosine -1 instead of silently dropping — only the order moves,
    # and the query doc (BM25 rank 1) scores ~1 against itself
    rerank = REGISTRY["search_rerank_stage"].build(spark, SF_DIR).collect()
    assert {r.doc_id for r in rerank} == or_ids, "rerank must not change the candidate set"
    top = next(r for r in rerank if r.bm25_rank == 1)
    assert top.cosine >= 1.0 - 1e-9, "the query doc must score ~1 against itself"
    moved = sum(1 for r in rerank if r.rerank_rank != r.bm25_rank)

    # 2. did BM25's idf + length normalization actually reorder anything?
    rbo = sorted(
        REGISTRY["ranking_rbo_report"].build(spark, SF_DIR).collect(),
        key=lambda r: r.d,
    )
    assert [r.d for r in rbo] == list(range(1, len(rbo) + 1))
    cums = [r.rbo_micro for r in rbo]
    assert cums == sorted(cums), "cumulative RBO must be non-decreasing"
    assert 0 <= cums[-1] <= 1_000_000, "RBO lives in [0, 1] (micro-units)"

    # 3. the language-ID probe: one Newton step, then its reliability curve
    probe = REGISTRY["logit_newton_langid"].build(spark, SF_DIR).collect()[0]
    curve = REGISTRY["logit_reliability_curve"].build(spark, SF_DIR).collect()
    assert sum(r.docs for r in curve) == probe.n_used, (
        "every trained-on doc must land in exactly one reliability bucket"
    )
    assert all(0 <= r.en_permille <= 1000 for r in curve)

    return {
        "and_hits": len(and_ids),
        "bm25_hits": len(or_ids),
        "rerank_moved": moved,
        "rbo_at_20_micro": cums[-1],
        "probe_docs": probe.n_used,
        "reliability_buckets": len(curve),
    }


if __name__ == "__main__":
    main(run)
