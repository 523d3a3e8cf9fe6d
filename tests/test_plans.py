"""Physical-plan quality gates — the 100 TB posture, asserted.

Correctness tests prove the answers; these prove the *plans*: filters reach
the parquet scan, projections prune columns, small dimensions broadcast,
hot paths stay inside whole-stage codegen, and no operator silently degrades
to a cartesian product.  A plan regression fails CI even while results stay
right.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pulsar_pekko_streams_example_spark.plans import REGISTRY
from pulsar_pekko_streams_example_spark.sources.tables import load_table

from tests.conftest import SF_SMOKE


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_parquet_scan(spark):
    """S8/scan posture: a selective predicate must appear as PushedFilters on
    the parquet scan, not as a post-scan Filter only."""
    l = load_table(spark, SF_SMOKE, "lineitem").filter(
        F.col("l_shipdate") >= "1995-01-01"
    )
    plan = plan_of(l.select("l_orderkey"))
    assert "PushedFilters: [" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].split("]")[0]


def test_column_pruning_reaches_parquet_scan(spark):
    """A 2-column projection must scan 2 columns, not the whole table."""
    l = load_table(spark, SF_SMOKE, "lineitem")
    plan = plan_of(l.select("l_orderkey", "l_quantity"))
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_comment" not in read_schema


def test_small_dimension_joins_broadcast(spark):
    """q5's region/nation/supplier dims must broadcast — no sort-merge
    shuffle of a 5-row table."""
    plan = plan_of(REGISTRY["q5_local_supplier_volume"].build(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_no_cartesian_in_dedup_pipeline(spark):
    """The inverted-index join must never degrade to a cartesian product."""
    for name in ("dedup_jaccard_pairs", "dedup_minhash_lsh", "simhash_near_pairs",
                 "embedding_near_dup"):
        plan = plan_of(REGISTRY[name].build(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_aggregation_runs_in_wholestage_codegen(spark):
    """The pricing-summary hot path must be fused into whole-stage codegen
    (scan → filter → partial agg in one generated stage)."""
    df = REGISTRY["q1_pricing_summary"].build(spark, SF_SMOKE)
    df.collect()  # AQE only materializes the final plan (with codegen spans) on execution
    plan = plan_of(df)
    # formatted explain marks fused operators with "[codegen id : N]"
    assert "[codegen id :" in plan
    # scan→filter→project→partial-agg must share ONE codegen stage
    assert "(5) HashAggregate [codegen id : 1]" in plan or "[codegen id : 1]" in plan


def test_asof_join_has_no_join_operator(spark):
    """The as-of join must plan as union + window (single shuffle), not as
    any join operator at all."""
    plan = plan_of(REGISTRY["asof_last_click"].build(spark, SF_SMOKE))
    assert "Join" not in plan
    assert "Window" in plan


def test_range_join_is_equi_join(spark):
    """The bucketed range join must plan as a hash equi-join on (key, bucket),
    never a nested-loop over the inequality — and the KEY must be in the
    equi-join keys, not a post-join filter: a bucket-only join fans every
    left row out against ALL keys' events in that time bucket (round-12 fix).
    """
    plan = plan_of(REGISTRY["range_following_counts"].build(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    import re

    # formatted explain lists equi-join keys as "Left keys [n]: [...]"
    join_keys = re.findall(r"Left keys \[\d+\]: \[([^\]]*)\]", plan)
    assert any("_k#" in k and "_bucket#" in k for k in join_keys), join_keys


def test_global_topk_avoids_full_sort(spark):
    """Q3/Q10/Q18-style ORDER BY + LIMIT must plan as TakeOrderedAndProject
    (per-partition top-k + merge), never a global Sort exchange."""
    for name in ("q3_shipping_priority", "q10_returned_item_revenue",
                 "q18_large_volume_customers"):
        plan = plan_of(REGISTRY[name].build(spark, SF_SMOKE))
        assert "TakeOrderedAndProject" in plan, name


def test_pq_adc_scoring_never_shuffles_the_corpus(spark):
    """PQ/ADC's scale contract in the plan: the scoring join is codes ⋈ a
    BROADCAST query distance table (never a sort-merge shuffle of the code
    table against queries), and the only cross joins are the intended
    broadcast-nested-loop of vectors × the tiny codebook."""
    plan = plan_of(REGISTRY["ann_pq_adc_topk"].build(spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_argmin_aggregate_has_no_window(spark):
    """Q2's per-group argmin must be a single partial/final aggregate over
    (value, key) structs — no rank window, no join-back.  (Struct buffers are
    not hash-aggregable, so Spark plans a SortAggregate; the partial side is
    still map-combinable, which is what matters at scale.)"""
    plan = plan_of(REGISTRY["q2_cheapest_part_per_type"].build(spark, SF_SMOKE))
    assert "Window" not in plan
    assert "Join" not in plan
    assert "partial_min" in plan


def test_disjunctive_predicate_joins_broadcast(spark):
    """Q19's OR-of-ANDs spanning both join sides must still broadcast the part
    dim and derive a fact-side quantity residual — never a nested loop."""
    plan = plan_of(REGISTRY["q19_disjunctive_revenue"].build(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # Catalyst extracts l_quantity bounds from the disjunction and pushes them
    # into the lineitem scan as a residual filter
    assert "l_quantity" in plan.split("PushedFilters:")[1].split("]")[0]


def test_q21_decorrelation_has_no_nested_loop(spark):
    """The EXISTS/NOT-EXISTS decorrelation must stay equi-join only."""
    plan = plan_of(REGISTRY["q21_sole_late_supplier"].build(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_tfidf_df_table_broadcasts(spark):
    """TF-IDF's document-frequency table (vocabulary-sized) must broadcast
    back onto term counts — never shuffle the corpus-sized tf side for it."""
    plan = plan_of(REGISTRY["tfidf_top_terms"].build(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_funnel_is_single_scan(spark):
    """The five-stage curation funnel must read the documents parquet ONCE —
    stage accounting is a level column + explode, not five re-scans."""
    plan = plan_of(REGISTRY["pipeline_funnel_counts"].build(spark, SF_SMOKE))
    # formatted explain mentions each scan twice (tree + details) — count the
    # tree section only: main scan + the broadcast keeper side
    tree = plan.split("\n\n")[0]
    assert tree.count("Scan parquet") <= 2


def test_grouping_sets_single_expand(spark):
    """All four grouping sets must come from ONE Expand over one shuffle —
    never a union of four separate aggregation passes."""
    plan = plan_of(REGISTRY["grouping_sets_revenue"].build(spark, SF_SMOKE))
    tree = plan.split("\n\n")[0]
    assert "Expand" in tree
    assert tree.count("Scan parquet") <= 3  # orders + customer + nation, once each


def test_zscore_stats_table_broadcasts(spark):
    """The per-type moment table (one row per event_type) must broadcast back
    onto the events scan — the facts never shuffle for the join."""
    plan = plan_of(REGISTRY["zscore_anomalies"].build(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_rolling_range_frame_single_shuffle(spark):
    """The trailing-7-day RANGE frame must be one Window over one exchange on
    o_custkey — no self-join re-scan of orders."""
    plan = plan_of(REGISTRY["rolling_revenue_7d"].build(spark, SF_SMOKE))
    tree = plan.split("\n\n")[0]
    assert "Window" in tree
    assert tree.count("Scan parquet") == 1
    assert "Join" not in tree


def test_triangle_join_stays_equi(spark):
    """Edge-edge triangle joins must be hash equi-joins on node ids — never a
    nested loop over the edge set."""
    plan = plan_of(REGISTRY["cooccurrence_triangles"].build(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_single_shuffle_aggregations(spark):
    """Scan→agg queries must shuffle exactly once (partial agg map-side,
    final agg after ONE exchange) — the shuffle budget at 100 TB."""
    for name in ("q1_pricing_summary", "q6_forecast_revenue", "lang_quality_stats"):
        plan = plan_of(REGISTRY[name].build(spark, SF_SMOKE))
        tree = plan.split("\n\n")[0]
        assert tree.count("Exchange") == 1, f"{name}: {tree.count('Exchange')} exchanges"


def test_approx_rank_variants_have_no_global_sort_window(spark):
    """The scale variants of the rank queries must plan WITHOUT any window
    operator (the exact forms' unpartitioned Window is the one shape that
    cannot shard): histogram + broadcast bucket join only."""
    for name in ("customer_spend_deciles_approx", "priority_price_rank_approx"):
        plan = plan_of(REGISTRY[name].build(spark, SF_SMOKE))
        assert "Window" not in plan, name
        assert "ntile(" not in plan and "percent_rank()" not in plan, name


def test_kmeans_assign_corpus_never_shuffles(spark):
    """Lloyd's assignment must be a map-side pass: centroids broadcast, no
    exchange of the corpus, no window (the argmax is an array_sort in the
    projection).  At 100 TB the corpus keeps its scan partitioning."""
    from pulsar_pekko_streams_example_spark.operators import clustering

    emb = load_table(spark, SF_SMOKE, "embeddings")
    assigned = clustering.assign(emb, clustering.seed_centroids(emb, 8))
    plan = plan_of(assigned)
    tree = plan.split("\n\n")[0]
    assert "BroadcastExchange" in tree  # the k centroids
    assert "Window" not in tree
    assert "Sort" not in tree
    # the only allowed exchanges are the centroid side's single-partition
    # collect + broadcast (and spread()'s round-robin when the scan is
    # single-split) — never a hash repartition of the corpus
    assert "hashpartitioning(" not in plan


def test_kmeans_update_shuffles_only_aggregated_rows(spark):
    """The update step's one hash exchange carries (cluster, dim) partial
    sums — k*d rows — never the exploded corpus."""
    plan = plan_of(REGISTRY["kmeans_update_components"].build(spark, SF_SMOKE))
    tree = plan.split("\n\n")[0]
    # top-down the main branch must read final HashAggregate → Exchange →
    # partial HashAggregate: map-side combine BEFORE the shuffle, so the
    # exchange carries k*d partial rows, not the exploded corpus
    ops = [
        line.lstrip(" :+-").split(" (")[0]
        for line in tree.splitlines()
        if line.lstrip(" :+-").split(" (")[0]
    ]
    aggs = [i for i, op in enumerate(ops) if op == "HashAggregate"]
    exch = [i for i, op in enumerate(ops) if op == "Exchange"]
    assert len(aggs) >= 2, f"expected partial+final HashAggregate, got {ops}"
    assert any(aggs[0] < e < aggs[1] for e in exch), (
        f"no exchange between final and partial agg: {ops}"
    )
    # and the shuffle key is the aggregated (cluster_id, dim) pair
    assert "hashpartitioning(cluster_id" in plan


def test_salted_join_plan_joins_on_salt(spark):
    """The salted join must be an equi hash join whose keys include the salt
    column — proof the hot key is spread across salted buckets."""
    plan = plan_of(REGISTRY["salted_segment_event_agg"].build(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "__salt" in plan


def test_new_pair_joins_stay_equi(spark):
    """Fuzzy blocking, market-basket, and sparse-similarity self-joins must
    all remain hash equi-joins on their blocking keys — none may degrade to
    a cartesian product (the inequality predicates are post-join filters).
    tfidf's one BroadcastNestedLoopJoin is the sanctioned 1-row scalar
    broadcast (the n_docs aggregate), so only the self-join shape is
    asserted nested-loop-free for it."""
    for name in ("fuzzy_name_pairs", "copurchase_part_pairs"):
        plan = plan_of(REGISTRY[name].build(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name
    plan = plan_of(REGISTRY["tfidf_cosine_pairs"].build(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "ShuffledHashJoin" in plan  # the term self-join shape


def test_gapfill_spine_broadcasts(spark):
    """The calendar spine must derive from a broadcast single-row bounds
    aggregate — never a shuffle keyed on the spine."""
    plan = plan_of(REGISTRY["daily_revenue_gapfilled"].build(spark, SF_SMOKE))
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_scale_default_queries_have_no_single_partition_exchange(spark):
    """Every query tagged scale-default is the 100 TB path of an
    exact/approx twin pair — it must never funnel the data through a
    single-partition Exchange (global sort window, global coalesce(1));
    that collapse is exactly what the exact-audit twin is allowed to do
    and the scale twin exists to avoid."""
    tagged = [n for n, s in REGISTRY.items() if "scale-default" in s.tags]
    assert len(tagged) >= 5, f"expected the twin set to be tagged, got {tagged}"
    for name in tagged:
        plan = plan_of(REGISTRY[name].build(spark, SF_SMOKE))
        assert "Exchange SinglePartition" not in plan, name


def test_exact_audit_queries_have_scale_default_twins():
    """The registry must carry both sides of each trade-off pair: if an
    exact-audit query exists, at least one scale-default twin exists too
    (and vice versa), so a reader can always find the 100 TB path."""
    exact = [n for n, s in REGISTRY.items() if "exact-audit" in s.tags]
    scale = [n for n, s in REGISTRY.items() if "scale-default" in s.tags]
    assert exact and scale


def test_round3_additions_plan_posture(spark):
    """New round-3 operators: no cartesian, no single-partition Exchange.
    semantic_dedup_probe is allowed its one BroadcastNestedLoopJoin — the
    sanctioned 1-row centroid-scalar broadcast inside clustering.assign
    (same shape as the kmeans family); everything else must be fully
    equi-join/window shaped."""
    one_row_scalar_broadcast = {
        # sanctioned BroadcastNestedLoopJoin: a 1-row scalar/centroid table
        # broadcast onto the fact side (centroids; max-ts anchor; exact-count;
        # max-doc-id slice bound)
        "semantic_dedup_probe",
        "decayed_user_value",
        "join_cardinality_estimate",
        "ngram_novelty_curve",
        "join_key_skew_report",
        # sources x sources roster pairing over the 64-register-per-source
        # sketch table: bounded by the SOURCE COUNT (metadata cardinality),
        # never by corpus size — the corpus itself is touched once upstream
        "hll_vocab_overlap",
        # 1-row scalar broadcasts: recency anchor; total-token count; the
        # winning BPE pair feeding the merge fold; the min-day OLS anchor
        "rfm_customer_segments",
        "pmi_collocations",
        "bpe_merge_round",
        "trend_slope_by_type",
        # five 1-row (violations, total) scalar pairings
        "dq_expectations_report",
    }
    bounded_single_partition = {
        # the global rank window runs over the symbol-PAIR table, bounded by
        # |alphabet|^2 (+1 merged symbol) at ANY corpus size — the corpus
        # itself only ever feeds the word-count aggregate
        "bpe_merge_round",
    }
    round3 = sorted(
        n
        for n, s in REGISTRY.items()
        if "added-r3" in s.tags or "added-r3b" in s.tags
    )
    assert len(round3) >= 9
    for name in round3:
        plan = plan_of(REGISTRY[name].build(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, name
        if name not in bounded_single_partition:
            assert "Exchange SinglePartition" not in plan, name
        if name not in one_row_scalar_broadcast:
            assert "BroadcastNestedLoopJoin" not in plan, name


def test_hll_cube_scans_corpus_twice_only(spark):
    """hll_cube_users: the four lattice levels must aggregate the
    materialized register-cell table (one corpus scan inside the eager
    checkpoint), so the query plan itself carries exactly ONE parquet scan
    — the exact-CUBE audit branch.  Before the checkpoint, union branches
    got fresh expression ids, ReuseExchange matched only the audit branch,
    and the plan scanned events five times (round-5 verdict, next #5)."""
    import re

    plan = plan_of(REGISTRY["hll_cube_users"].build(spark, SF_SMOKE))
    # formatted explain lists each scan twice (tree line + detail header);
    # count the numbered detail headers
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, (
        "lattice levels must read the checkpointed cell table, not rescan "
        "the corpus"
    )


def test_cooc_slot_histogram_single_scan(spark):
    """The slot-df evidence report must be one scan + two hash aggregations
    — no joins, no corpus-sized window."""
    import re

    plan = plan_of(REGISTRY["cooc_slot_df_histogram"].build(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1
    assert "Join" not in plan and "Window" not in plan


def test_cooc_edges_cap_is_broadcast_anti_join(spark):
    """The hot-slot cap must apply as a broadcast anti-join on the tiny
    materialized hot-slot list — never a shuffle of the slot universe per
    consumer — and the slot self-join must stay an equi-join."""
    from pulsar_pekko_streams_example_spark.plans.data_queries import (
        _shared_cooc_edges,
    )

    plan = plan_of(_shared_cooc_edges(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_null_date_guards_push_to_parquet_scan(spark):
    """The round-7 NULL-date exclusions (cadence lag, running-min frontier,
    cohort offsets) must reach the orders scan as pushed IsNotNull filters —
    at 100 TB a post-scan filter re-reads every dateless row for nothing."""
    for name in (
        "order_interarrival_histogram",
        "price_frontier_by_priority",
        "cohort_ltv_curve",
    ):
        plan = plan_of(REGISTRY[name].build(spark, SF_SMOKE))
        assert "PushedFilters: [" in plan, name
        pushed = plan.split("PushedFilters:")[1].split("]")[0]
        assert "IsNotNull(o_orderdate)" in pushed, (name, pushed)


def test_bloom_probe_plan_is_broadcast_and_aggregate_only(spark):
    """The Bloom probe's scale contract in the plan (round 16): the filter
    words build via a hash aggregate, the batch probes them through a
    BROADCAST join — never a sort-merge shuffle of probe positions against
    words — and nothing cartesian appears anywhere."""
    plan = plan_of(REGISTRY["dedup_bloom_probe_report"].build(spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_image_neardup_collapses_before_pairing(spark):
    """image_neardup_pairs' aggregate-before-expand contract (round 16): the
    distinct-hash histogram aggregate sits BELOW the band self-join (the
    doc-pair set never materializes), blobs enter exactly one Python
    evaluation (the Arrow-batched dHash), and nothing cartesian appears."""
    plan = plan_of(REGISTRY["image_neardup_pairs"].build(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    # one mapInPandas for the dHash; the plan may re-plan the subtree per
    # join side, but no OTHER Python eval may exist
    assert plan.count("MapInPandas") >= 1
    assert "BatchEvalPython" not in plan


def test_jaccard_prefix_verify_carries_sizes(spark):
    """Round-16 optimization pin: jaccard_prefix_pairs carries each doc's
    shingle-set size ON the prefix candidate rows, so the verify stage needs
    no standalone sizes aggregate + two re-joins (one fewer corpus-wide
    posting pass).  The whole dataflow is exactly 5 join operators: postings
    x dfreq, the prefix self-join, the two candidate-verification joins
    against the postings, and the verified-pair key join — a regression to
    the size-rejoin shape adds two more (ADVICE r16: assert the exact count,
    not an upper bound that would also pass if a required join vanished;
    the r16 census pins 5 at sf0.001, and join COUNT is SF-independent —
    only the join STRATEGY varies with size).  Values are pinned exactly by
    test_jaccard_prefix_pairs_complete_vs_bruteforce."""
    import re

    plan = plan_of(REGISTRY["dedup_jaccard_prefix"].build(spark, SF_SMOKE))
    joins = re.findall(r"^\(\d+\)\s+\w*Join", plan, flags=re.M)
    assert len(joins) == 5, joins
    assert "CartesianProduct" not in plan
