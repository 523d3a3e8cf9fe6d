"""Extension example — end-to-end training-data curation funnel.

Not a reference scenario (the reference stops at delivery semantics); this is
the north-star pipeline the engine's training-data operators exist for:

    documents → language-ID → quality gate → exact dedup → duplicated-span
    boilerplate gate → deterministic 10% sample → sequence packing →
    partitioned corpus sink

Every stage is a declarative DataFrame transform off ONE scan lineage; the
only shuffles are the dedup fingerprint argmin and the packing window.  The
script self-asserts funnel monotonicity, dedup idempotence, and packing
utilization, then writes the surviving corpus partitioned by language (the
layout a 100 TB run would bucket/partition for downstream readers).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from examples._common import main
from pulsar_pekko_streams_example_spark.functions import hashing as H
from pulsar_pekko_streams_example_spark.operators import curation, dedup, textstats
from pulsar_pekko_streams_example_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMOKE", "/root/testdata/sf0.001")
QUALITY_MIN_MILLI = 550
SAMPLE_PERMILLE = 100  # 10 %


def _survivors(docs: DataFrame) -> tuple[DataFrame, dict[str, int]]:
    counts: dict[str, int] = {"ingested": docs.count()}

    scored = textstats.with_predicted_lang(textstats.with_text_features(docs))
    kept_quality = scored.filter(F.col("quality_milli") >= QUALITY_MIN_MILLI)
    counts["quality_pass"] = kept_quality.count()

    # exact dedup: full-text fingerprint, keep the smallest doc_id per value
    fp = dedup.doc_fingerprints(kept_quality).select("doc_id", "fingerprint")
    keeper = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    deduped = kept_quality.join(keeper, ["doc_id"], "left_semi")
    counts["deduped"] = deduped.count()

    # span-level boilerplate gate: drop docs that are >= 50% duplicated
    # 5-token spans RELATIVE TO THE SURVIVORS (exact dedup removed verbatim
    # copies; this catches the near-copies and template-stuffed docs that
    # doc-level fingerprints cannot).  Coverage is recomputed on the
    # survivor set, as a real pipeline stage would.
    cov = dedup.dup_span_doc_coverage(deduped.select("doc_id", "text"), n=5)
    boiler = cov.filter(2 * F.col("dup") >= F.col("spans")).select("doc_id")
    span_kept = deduped.join(boiler, ["doc_id"], "left_anti")
    counts["span_gate_pass"] = span_kept.count()

    # deterministic hash-gate sample — reproducible across reruns/partitionings
    gate = F.expr(H.word_hash("CAST(doc_id AS STRING)", "spark")) % 1000
    sampled = span_kept.filter(gate < SAMPLE_PERMILLE)
    counts["sampled"] = sampled.count()
    return sampled, counts


def run(spark: SparkSession, base: str) -> dict:
    docs = load_table(spark, SF_DIR, "documents")
    sampled, counts = _survivors(docs)

    # funnel is monotone by construction — each stage only drops rows
    assert (
        counts["ingested"]
        >= counts["quality_pass"]
        >= counts["deduped"]
        >= counts["span_gate_pass"]
        >= counts["sampled"]
        > 0
    ), counts

    # dedup is idempotent: a second pass over the survivors drops nothing
    fp2 = dedup.doc_fingerprints(sampled).select("doc_id", "fingerprint")
    assert fp2.groupBy("fingerprint").count().filter(F.col("count") > 1).count() == 0

    # pack the surviving tokens into fixed budgets; utilization is a sane rate
    packing = curation.sequence_packing_stats(sampled.select("doc_id", "text", "source"))
    stats = packing.agg(
        F.sum("bins").alias("bins"), F.max("utilization").alias("max_util")
    ).collect()[0]
    assert stats.max_util is None or 0.0 < stats.max_util <= 1.0

    # partitioned corpus sink: the downstream-reader layout
    out = os.path.join(base, "corpus")
    sampled.select("doc_id", "lang", "source", "text").write.partitionBy("lang").parquet(out)
    langs_written = {
        r.lang for r in spark.read.parquet(out).select("lang").distinct().collect()
    }

    return {**counts, "packed_bins": stats.bins, "langs_written": len(langs_written)}


if __name__ == "__main__":
    main(run)
