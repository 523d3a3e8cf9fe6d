"""Corpus-curation operators: class rebalancing, sequence packing,
train/test decontamination.

The last mile of a training-data pipeline after filtering + dedup
(operators/dedup.py, operators/textstats.py): shape WHAT survives into the
mixture and layout a trainer consumes.  All three are engine-portable
(plain integer arithmetic / window sums / inverted-index joins), so the
DuckDB oracle replicates them bit-for-bit.

Scale designs:

- rebalance: per-class accept rates derive from ONE tiny groupBy (classes ×
  counts, broadcast back); the gate itself is a pure per-row predicate —
  composes as a pushed filter, no shuffle of the corpus.
- packing: one window partitioned by source — the same partitioning a
  sharded trainer would use — with an integer running sum; no second pass.
- decontamination: inverted-index equi-join on shingle (never test × train
  cross join); the test side is tiny and broadcasts, the train side streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_pekko_streams_example_spark.operators import dedup

P = 1_000_000_007
GATE_A = 1_103_515_245
GATE_B = 12_345

PACK_BUDGET = 256  # tokens per packed training sequence

DECON_MIN_SHARED = 2  # shared distinct shingles to flag a train/test pair


def _gate_hash() -> str:
    """Deterministic per-doc gate hash in [0, P): LCG mix of doc_id.

    ``doc_id % P`` first so the product stays < ~1.2e18 at ANY doc_id —
    overflow-safe under ANSI mode at 100 TB id ranges, identical arithmetic
    in both engines."""
    return f"(((doc_id % {P}) * {GATE_A} + {GATE_B}) % {P})"


def rebalance_by_lang(docs: DataFrame) -> DataFrame:
    """(lang, total, kept): downsample every language class to ≈ the minority
    class size with a deterministic hash gate.

    Accept iff gate_hash % total(lang) < min_total: an exact integer-rational
    acceptance of min/total per class — no float rates, reproducible across
    reruns and partitionings, and the decision is per-row (the gate pushes
    into the scan; only the tiny class-count table broadcasts back)."""
    cnt = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("total"))
    floor = cnt.agg(F.min("total").alias("min_total"))
    gated = (
        docs.join(F.broadcast(cnt), "lang")
        .crossJoin(F.broadcast(floor))
        .withColumn(
            "kept_flag",
            (F.expr(_gate_hash()) % F.col("total") < F.col("min_total")).cast("int"),
        )
    )
    return gated.groupBy("lang").agg(
        F.max("total").alias("total"),
        F.sum("kept_flag").alias("kept"),
    )


def sequence_packing_stats(docs: DataFrame, budget: int = PACK_BUDGET) -> DataFrame:
    """(source, docs, total_tokens, bins, straddlers, utilization): stats of
    concat-and-chunk packing — documents concatenated in doc_id order per
    source, chunked into fixed ``budget``-token training sequences (documents
    may straddle a chunk boundary; counting them sizes the attention-mask /
    document-boundary loss).

    One window per source computes the exclusive running token sum; bins and
    straddlers are pure integer arithmetic on it.  utilization is the single
    final double division (last partial bin is the only slack)."""
    toks = docs.select(
        "doc_id",
        "source",
        F.expr(f"size({dedup.H.tokens('text', 'spark')})").cast("long").alias("tc"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = (
        toks.withColumn("cum_before", F.coalesce(F.sum("tc").over(w), F.lit(0)))
        .withColumn(
            "straddler",
            (
                F.expr(f"cum_before div {budget}")
                != F.expr(f"(cum_before + tc - 1) div {budget}")
            ).cast("int"),
        )
    )
    return staged.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("tc").alias("total_tokens"),
        F.expr(f"(sum(tc) + {budget} - 1) div {budget}").alias("bins"),
        F.sum("straddler").alias("straddlers"),
        (
            F.sum("tc").cast("double")
            / (F.expr(f"(sum(tc) + {budget} - 1) div {budget}") * F.lit(float(budget)))
        ).alias("utilization"),
    )


def decontamination_report(
    docs: DataFrame,
    test_source: str,
    min_shared: int = DECON_MIN_SHARED,
    max_df: int | None = dedup.JACCARD_MAX_DF,
    hot: DataFrame | None = None,
) -> DataFrame:
    """(test_doc, contaminated_train_docs, max_shared): for each held-out
    document, how many training documents share ≥ ``min_shared`` distinct
    n-gram shingles with it, and the worst overlap.

    The train/test comparison is an inverted-index equi-join on shingle —
    cost Σ df_train(s)·df_test(s), never |train|×|test|.  The held-out side
    is tiny (one source), so its postings broadcast; the training corpus
    streams through the join without a corpus-wide shuffle.

    The frequent-shingle cap (corpus-wide df, same JACCARD_MAX_DF constant as
    the dedup family and the oracle's posting CTE) keeps a stop-shingle from
    fanning the join out quadratically — a capped shingle can't plausibly
    evidence contamination anyway.  The hot set is materialized ONCE
    (eager localCheckpoint — it is at most total_postings/max_df shingles)
    and broadcast-anti-joined onto each side, so the per-side postings keep
    their pushed source filters; production would substitute a maintained
    document-frequency table for the extra corpus pass."""
    test = docs.filter(F.col("source") == test_source)
    train = docs.filter(F.col("source") != test_source)
    tp = dedup.shingle_postings(test).select(F.col("doc_id").alias("test_doc"), "s")
    rp = dedup.shingle_postings(train).select(F.col("doc_id").alias("train_doc"), "s")
    if max_df is not None:
        if hot is None:
            hot = dedup.hot_shingles(
                dedup.shingle_postings(docs), max_df
            ).localCheckpoint(eager=True)
        tp = tp.join(F.broadcast(hot), ["s"], "left_anti")
        rp = rp.join(F.broadcast(hot), ["s"], "left_anti")
    overlap = (
        rp.join(F.broadcast(tp), "s")
        .groupBy("train_doc", "test_doc")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    return overlap.groupBy("test_doc").agg(
        F.count(F.lit(1)).alias("contaminated_train_docs"),
        F.max("shared").alias("max_shared"),
    )
