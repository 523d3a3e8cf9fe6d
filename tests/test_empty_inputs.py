"""Degenerate-input sweep: registry queries against ZERO-row tables.

The DuckDB parity gate proves agreement on populated corpora; what it cannot
reach is the crash surface of empty inputs — driver-side collects indexing
into empty matrices, scalar broadcasts yielding empty cross joins, division
guards.  (Found live: the vectorized ANN path raised IndexError building a
(0,)-shaped query matrix.)  Every query here must BUILD and COLLECT against
empty tables with the production schemas — rows out don't matter, not
crashing does.

The default run sweeps a deterministic 25-query sample plus the known
regressions (full 170+ sweep costs minutes); export
SPARK_GRAFT_EMPTY_SWEEP=all for the complete pass (last full run, round 5:
350/350 green — every registry query survives both degenerate inputs).
"""

from __future__ import annotations

import os
import zlib

import pytest

from pulsar_pekko_streams_example_spark.plans.registry import REGISTRY, all_queries

from tests.conftest import SF_SMOKE

all_queries()  # force registration

# once-broken on empty / single-row input: pinned forever
REGRESSIONS = [
    "ann_cosine_topk_vectorized",
    "zscore_anomalies",
    # round 5: AQE collapsed the empty near-dup / co-occurrence edge lists
    # to ZERO partitions and the graph loops crashed on coalesce(0)
    # (graph._right_size now repairs 0-partition frames)
    "neardup_components",
    "component_survivorship",
    "corpus_curation_funnel",
    "kcore_peel_profile",
]

SAMPLE_N = 25


def _selected() -> list[str]:
    names = sorted(REGISTRY)
    if os.environ.get("SPARK_GRAFT_EMPTY_SWEEP") == "all":
        return names
    # deterministic hash sample — stable across runs, spread over families
    sample = sorted(names, key=lambda n: zlib.crc32(n.encode()))[:SAMPLE_N]
    return sorted(set(sample) | set(REGRESSIONS))


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("empty_sf")
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(str(base / f"{t}.parquet"))
    return str(base)


@pytest.fixture(scope="module")
def one_row_sf(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("one_row_sf")
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        df.limit(1).write.mode("overwrite").parquet(str(base / f"{t}.parquet"))
    return str(base)


@pytest.mark.parametrize("name", _selected())
def test_query_survives_empty_input(name, spark, empty_sf):
    REGISTRY[name].build(spark, empty_sf).collect()


@pytest.mark.parametrize("name", _selected())
def test_query_survives_single_row_input(name, spark, one_row_sf):
    """n=1 is the divisor-degeneracy corner: sample variance, percent_rank,
    lag/lead baselines.  (Found live: zscore_anomalies divided by n-1 under
    ANSI doubles.)"""
    REGISTRY[name].build(spark, one_row_sf).collect()
