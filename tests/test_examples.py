"""The five reference example scenarios must run green end-to-end.

Each example module self-asserts its reference invariant; these tests just
execute them against the shared session (mirroring the reference's README
walkthrough, but automated)."""

from __future__ import annotations

import tempfile

import pytest

from examples import (  # noqa: F401  (docs the mapping)
    ann_index_selection,
    corpus_release,
    training_order_writer,
    corpus_search,
    curation_pipeline,
    tokenizer_planning,
    ordered_redelivery_loop,
    part1_backpressured_source,
    part2_single_workload,
    part3_multiple_workloads,
    part4_workload_discovery,
    part5_ordered_workloads,
    retry_maintenance,
)

EXAMPLES = [
    part1_backpressured_source,
    part2_single_workload,
    part3_multiple_workloads,
    part4_workload_discovery,
    part5_ordered_workloads,
    curation_pipeline,  # extension: training-data funnel end-to-end
    retry_maintenance,  # extension: delivery-lifecycle runbook (retry loop,
    # ledger compaction, DLQ requeue — conservation end to end)
    ordered_redelivery_loop,  # extension: K2 × S6/S7 composed — failures
    # re-enter the SAME key queues as flagged redeliveries, loop converges
    corpus_search,  # extension: retrieval stack walkthrough (boolean vs
    # BM25, RBO ranker agreement, logit probe + reliability curve)
    tokenizer_planning,  # extension: tokenizer + context-length planning
    # (coverage curve, truncation budget, BPE train/apply, fertility,
    # CCNet cross-corpus LM gate)
    ann_index_selection,  # extension: ANN index selection off the engine's
    # own recall ledgers (method matrix, nprobe curve, refine dominance)
    training_order_writer,  # extension: the ordering arc through STORAGE -
    # clumped corpus -> generate -> range-partitioned write -> stored-order
    # audit passes
    corpus_release,  # extension: the full release workflow - mixture
    # resample -> interleave order (audited) -> token-budgeted shard plan,
    # with cross-stage accounting asserted exactly
]


@pytest.mark.parametrize("mod", EXAMPLES, ids=lambda m: m.__name__.rsplit(".", 1)[-1])
def test_example_scenario(mod, spark):
    with tempfile.TemporaryDirectory() as d:
        summary = mod.run(spark, d)
    assert summary  # every example returns a non-empty metrics dict
