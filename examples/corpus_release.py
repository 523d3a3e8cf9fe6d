"""Extension example — releasing a training corpus, end to end.

Not a reference scenario; this composes the round-15 measure→remediate
arcs into the workflow a data team actually runs to cut a corpus release:

    mixture_temperature_weights   (MEASURE: where should the mix sit?)
    → mixture_resample_manifest   (APPLY: deterministic hash-threshold
                                   downsample to the sqrt-temperature mix)
    → order_mixing_audit          (MEASURE: is the survivor order clumped?)
    → training_order_generate     (APPLY: stride-interleave order)
    → shard_plan_manifest         (PLAN: ~token-budgeted output shards)
    → holdout_sample_manifest     (CUT: the per-source eval holdout)
    → corpus_snapshot_diff core   (AUDIT: what changed vs the ingested set)

Every stage is a registry query (or its tested core); the example asserts
the cross-stage accounting invariants that make the release trustworthy:
the survivor set equals the manifest's selected counts exactly, the
generated order audits well-mixed, and the shard plan tiles the survivor
token mass with every shard seeing multiple sources.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from examples._common import main
from pulsar_pekko_streams_example_spark.plans import REGISTRY
from pulsar_pekko_streams_example_spark.plans.data_queries import (
    ORDER_SALT_P,
    _order_mixing_audit,
    _order_salt,
    _shard_plan_manifest,
    _training_order_generate,
)


def run(spark, workdir: str) -> dict:
    # a deliberately imbalanced, source-sorted corpus: the worst release
    # input — one dominant source, contiguous id runs
    rows = (
        [(i, " ".join(["w"] * (5 + i % 40)), "en", "web", 40) for i in range(1500)]
        + [(2000 + i, " ".join(["b"] * 30), "en", "books", 30) for i in range(400)]
        + [(3000 + i, " ".join(["c"] * 20), "en", "code", 20) for i in range(100)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )

    # 1. APPLY the mixture: manifest + the same deterministic hash rule
    # re-applied to materialize the survivor set
    from pulsar_pekko_streams_example_spark.plans.data_queries import (
        _mixture_resample_manifest,
    )

    manifest = {r.source: r for r in _mixture_resample_manifest(docs).collect()}
    tgt = spark.createDataFrame(
        [(s, r.n_docs, r.target_docs) for s, r in manifest.items()],
        "tsource string, n_docs long, target_docs long",
    )
    survivors = (
        docs.join(F.broadcast(tgt), docs.source.eqNullSafe(tgt.tsource))
        .filter(
            F.expr(
                "target_docs IS NOT NULL AND "
                f"{_order_salt('doc_id', 'spark')} * n_docs"
                f" < target_docs * {ORDER_SALT_P}L"
            )
        )
        .select("doc_id", "text", "lang", "source", "n_chars")
    )
    per_src = {r.source: r.n for r in survivors.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # the materialized survivor set must equal the manifest's accounting
    for s, r in manifest.items():
        assert per_src.get(s, 0) == r.selected_docs, (s, per_src.get(s), r)
    # the dominant source was actually downsampled; the minority kept whole
    assert per_src["web"] < manifest["web"].n_docs
    assert per_src["code"] == manifest["code"].n_docs

    # 2. APPLY the ordering and certify with the audit on the survivors
    gen = _training_order_generate(survivors).collect()
    ordered = sorted(gen, key=lambda r: (r.ord_key, r.source, r.doc_id))
    redocs = spark.createDataFrame(
        [(i, "t", "en", r.source, 1) for i, r in enumerate(ordered)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    audit = {r.source: r.clump_milli for r in _order_mixing_audit(redocs).collect()}
    assert all(v <= 1100 for v in audit.values()), audit

    # 3. PLAN the shards over the survivor corpus
    shards = _shard_plan_manifest(survivors).collect()
    total_tokens = sum(r.tokens for r in shards)
    survivor_tokens = survivors.select(
        F.sum(F.expr("size(filter(split(text, ' '), t -> t <> ''))"))
    ).first()[0]
    assert total_tokens == survivor_tokens, "shards must tile the token mass"
    assert sum(r.docs for r in shards) == sum(per_src.values())
    # mixing made visible: every shard (bar possibly the short last one)
    # sees more than one source
    full = [r for r in shards if r.tokens >= 1500]
    assert all(r.sources >= 2 for r in full), [(r.shard_id, r.sources) for r in full]

    # 4. CUT the per-source eval holdout from the survivors — fixed-size,
    # deterministic, re-cuttable (round-16 holdout_sample_manifest core)
    from pulsar_pekko_streams_example_spark.plans.mldata_queries import (
        HOLDOUT_PER_SOURCE,
    )
    from pulsar_pekko_streams_example_spark.functions import hashing as H
    from pyspark.sql.window import Window

    hw = Window.partitionBy("source").orderBy(
        F.expr(H.word_hash("CAST(doc_id AS STRING)", "spark")),
        F.col("doc_id"),
        F.expr(f"coalesce({H.word_hash('text', 'spark')}, -1L)"),
    )
    holdout = (
        survivors.select(
            "source", "doc_id", F.row_number().over(hw).alias("smp_rank")
        )
        .filter(F.col("smp_rank") <= HOLDOUT_PER_SOURCE)
        .collect()
    )
    per_holdout = {}
    for r in holdout:
        per_holdout[r.source] = per_holdout.get(r.source, 0) + 1
    # every surviving source contributes exactly min(R, survivors) docs
    for s_, n in per_src.items():
        assert per_holdout.get(s_, 0) == min(HOLDOUT_PER_SOURCE, n), (s_, per_holdout)
    # and the cut is REPRODUCIBLE: a second evaluation yields the same ids
    holdout2 = {
        (r.source, r.doc_id)
        for r in survivors.select(
            "source", "doc_id", F.row_number().over(hw).alias("smp_rank")
        )
        .filter(F.col("smp_rank") <= HOLDOUT_PER_SOURCE)
        .collect()
    }
    assert holdout2 == {(r.source, r.doc_id) for r in holdout}

    return {
        "ingested": len(rows),
        "survivors": sum(per_src.values()),
        "kept_by_source": per_src,
        "clump_after": audit,
        "shards": len(shards),
        "shard_tokens_total": total_tokens,
        "holdout_docs": len(holdout),
    }


if __name__ == "__main__":
    main(run)
