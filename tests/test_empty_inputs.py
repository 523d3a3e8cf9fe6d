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

# once-broken on a degenerate input: pinned forever
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
    # round 5, all-NULL sweep: [0] into a zero-centroid array / ANSI 0/0
    "kmeans_cluster_profile",
    "audio_silence_stats",
    # round 7, all-NULL sweep: every source weight clamps to 0, so the
    # mixture share hit ANSI 0.0/0.0 (share is NULL when total weight is 0)
    "mixture_temperature_weights",
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


@pytest.fixture(scope="module")
def all_null_sf(spark, tmp_path_factory):
    """Five rows per table, EVERY column NULL (production schemas kept) —
    the corrupted-shard shape: rows exist, values don't.  Found live:
    kmeans assignment indexed [0] into a zero-centroid array and
    audio_silence_stats hit ANSI 0/0 on an all-empty clip group."""
    from pyspark.sql import functions as F

    base = tmp_path_factory.mktemp("all_null_sf")
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        df = spark.read.parquet(f"{SF_SMOKE}/{t}.parquet")
        nulled = df.limit(5).select(
            [F.lit(None).cast(f.dataType).alias(f.name) for f in df.schema.fields]
        )
        nulled.write.mode("overwrite").parquet(str(base / f"{t}.parquet"))
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


@pytest.mark.parametrize("name", _selected())
def test_query_survives_all_null_input(name, spark, all_null_sf):
    """Rows present, every value NULL — the corrupted-shard corner.
    (Found live: kmeans [0] on a zero-centroid array; audio ANSI 0/0.)"""
    REGISTRY[name].build(spark, all_null_sf).collect()
