"""Regenerate PLANS.md: formatted physical plans for the headline queries,
with the property each plan is expected to exhibit.  Run:

    python tools/gen_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pulsar_pekko_streams_example_spark.plans import REGISTRY  # noqa: E402
from pulsar_pekko_streams_example_spark.session import get_spark  # noqa: E402

SHOWCASE = [
    (
        "q1_pricing_summary",
        "Filter pushed to the parquet scan (PushedFilters), 7-column ReadSchema, "
        "scan→filter→project→partial-agg fused in one codegen stage, single "
        "shuffle for the final aggregate.",
    ),
    (
        "q5_local_supplier_volume",
        "6-table join tree: region/nation/supplier broadcast (no shuffle for "
        "dimension joins); the fact side shuffles once per join key.",
    ),
    (
        "asof_last_click",
        "As-of join with NO join operator: union + one Window over "
        "(user_id, ts) carries the last click forward — a single Exchange.",
    ),
    (
        "range_following_counts",
        "Interval join as a bucketed equi-join (explode ×2 on the bucket id); "
        "no BroadcastNestedLoopJoin / CartesianProduct anywhere.",
    ),
    (
        "dedup_minhash_lsh",
        "Shingle→MinHash→banded-LSH candidates via equi-joins only; "
        "exact-Jaccard verify restricted to candidate docs (candidate pairs "
        "materialized once via localCheckpoint — appears as a Scan of an "
        "ExistingRDD).",
    ),
    (
        "dedup_jaccard_pairs",
        "Inverted-index self-join as a ShuffledHashJoin: both sides are the "
        "IDENTICAL hashpartitioning(s) exchange, so the postings pipeline is "
        "computed once and reused (AQE ReusedExchange at runtime); per-doc "
        "sizes derive from the same postings subtree.",
    ),
    (
        "simhash_near_pairs",
        "Hamming histogram over DISTINCT simhash values: aggregate-first "
        "collapses the corpus to ≤2^16 rows BEFORE the banded self-join; the "
        "doc-pair set never materializes.",
    ),
    (
        "ann_lsh_topk",
        "LSH-bucketed ANN: candidates from (band, val) hash join; embeddings "
        "re-attached after dedup; rank window per query.",
    ),
    (
        "ann_pq_adc_topk",
        "PQ/ADC ANN: one broadcast-nested-loop pass scores vectors against "
        "the tiny codebook (codes via struct-min hash aggregate, no window); "
        "ADC scoring is codes BroadcastHashJoin-ed against the broadcast "
        "query distance table — the corpus embeddings never shuffle.",
    ),
    (
        "cube_event_stats",
        "CUBE expands all grouping sets into ONE expand + single-shuffle "
        "aggregate (no per-grouping-set rescan).",
    ),
    (
        "rolling_revenue_7d",
        "RANGE-frame rolling aggregation: one Window over one Exchange on "
        "o_custkey; no self-join and only a single orders scan.",
    ),
    (
        "zscore_anomalies",
        "Per-group moment table (one row per event_type) broadcast back onto "
        "the events scan — BroadcastHashJoin, facts never shuffle for the join.",
    ),
    (
        "customer_spend_deciles_approx",
        "Scale-safe decile ranking: NO Window operator anywhere — scalar "
        "min/max/count broadcast, 256-bin histogram aggregate, bin→decile "
        "map rebroadcast onto the spend table.  Compare customer_spend_"
        "deciles, whose ntile needs an Exchange SinglePartition + global "
        "Sort.",
    ),
    (
        "priority_price_rank_approx",
        "Scale-safe percent_rank/cume_dist rollup: histogram + cumulative "
        "bin counts via a tiny nested-loop over ≤256 histogram rows; the "
        "orders table is touched by scan→project→hash-agg only, no "
        "single-partition Sort.",
    ),
    (
        "tfidf_cosine_pairs",
        "Sparse similarity join: the term self-join is a shuffled-hash join "
        "on the df-capped posting lists (both sides the same "
        "hashpartitioning(term) exchange), integer dot/norm aggregates, no "
        "CartesianProduct anywhere.",
    ),
    (
        "kmeans_cluster_profile",
        "Lloyd's assignment with zero corpus shuffle: the k centroids "
        "collapse to one broadcast row, the argmax is an array_sort in the "
        "projection (no Window, no Sort of the corpus); only the k-row "
        "post-assignment profile aggregates shuffle.",
    ),
    (
        "kmeans_update_components",
        "Lloyd's update in mergeable form: posexplode → map-side partial "
        "HashAggregate BEFORE the one hashpartitioning(cluster_id, dim) "
        "exchange, so the shuffle carries k×d partial sums, never the "
        "exploded corpus.",
    ),
    (
        "incremental_daily_revenue",
        "Incremental-recompute shape: both branches push their cutoff "
        "predicate into the parquet scan (PushedFilters on o_orderdate), "
        "aggregate independently, and union partials — no full-history "
        "rescan in the fresh branch.",
    ),
    (
        "cooccurrence_pagerank",
        "Iterative scatter/gather: per round one edge⋈rank BroadcastHashJoin "
        "(rank table is k nodes ≪ edges) + one hash gather on dst; "
        "localCheckpoint truncates lineage so the plan stays one round deep "
        "— no O(rounds²) replay.",
    ),
    (
        "salted_segment_event_agg",
        "Skew-safe fact/dim join: the join keys include __salt, spreading "
        "each hot user key over 8 shuffle buckets; dim side replicated per "
        "salt (8× a small table), result provably identical to the plain "
        "join (the oracle IS the plain join).",
    ),
    (
        "semantic_dedup_probe",
        "SemDeDup shape: one shared assignment exchange feeds both the probe "
        "and member branches (scored once, AQE stage reuse); the cluster "
        "join carries __salt so k cluster keys spread over k×16 reducers; "
        "best-match is a windowless struct-min hash aggregate.",
    ),
    (
        "cooccurrence_triangles",
        "Degree-oriented (compact-forward) triangle listing: degree attach, "
        "wedge, and closure are all equi-joins; no CartesianProduct / "
        "BroadcastNestedLoopJoin — hub fan-out bounded by the orientation, "
        "not by luck of the id distribution.",
    ),
    (
        "corpus_curation_funnel",
        "The composed curation pipeline: one corpus scan computes all gate "
        "flags (features + lang scores fused in a single codegen stage), the "
        "near-dup loser set joins as a broadcast, and the only single-row "
        "exchange carries five counters — the stage rows unstack from one "
        "scalar aggregate.",
    ),
    (
        "daily_value_ohlc",
        "OHLC bars as ONE map-combinable hash aggregate: open/close are "
        "min_by/max_by on a packed (epoch_micros, event_id) decimal key — "
        "no Window, no self-join, no per-day sort anywhere in the plan.",
    ),
    (
        "pmi_collocations",
        "Collocation scoring: bigram explode and two hash aggs off one "
        "tokenize pass; the vocabulary-sized unigram table broadcasts back "
        "twice; top-k is TakeOrderedAndProject, never a global sort.",
    ),
    (
        "sql_recursive_reachability",
        "Spark 4 WITH RECURSIVE planned as UnionLoop: the depth-capped BFS "
        "walk iterates inside one operator, then collapses through two hash "
        "aggregates — the recursion text is shared verbatim with the DuckDB "
        "oracle.",
    ),
    (
        "hll_rolling_7d_users",
        "Sliding-window cardinality as sketch algebra: the CHECKPOINTED "
        "daily register table (both Scan ExistingRDD nodes — the corpus is "
        "scanned once, upstream) offset-explodes x7 into its trailing "
        "windows, equi-semi-joins a dense day spine (NO range/nested-loop "
        "join), register-MAX merge, one bounded aggregate per output day.",
    ),
    (
        "hll_cube_users",
        "Distinct-count lattice from the CHECKPOINTED register-cell table "
        "(|types|x7x64 rows): all four rollup levels read Scan ExistingRDD, "
        "so the query plan carries exactly ONE parquet scan — the exact "
        "CUBE audit branch.  (Round-6 fix: union branches previously got "
        "fresh exprIds, defeated ReuseExchange, and scanned events 5x.)",
    ),
    (
        "cooc_slot_df_histogram",
        "Hot-slot evidence report: one pushed-filter scan (IsNotNull(ts)), "
        "distinct + two map-side-combinable hash aggregations, no joins, "
        "no windows — the Σ users(slot)² volume COOC_MAX_SLOT_USERS drops "
        "from the graph family's slot self-join, quantified per bucket.",
    ),
    (
        "bm25_search_topk",
        "BM25 ranked retrieval (round 13): the token Generate explodes only "
        "the filtered query-term postings (the posting slice — the array "
        "filter sits inside the Generate, pruning before the shuffle); the "
        "≤n_terms-row df table is a BroadcastHashJoin build side and the "
        "1-row corpus totals a broadcast BNLJ; ranking is "
        "TakeOrderedAndProject, never a global sort.  All-integer BM25 "
        "arithmetic (idf_micro × tfnorm_micro) keeps the DuckDB oracle "
        "bit-identical.",
    ),
    (
        "rp_projection_distortion",
        "JL distortion audit (round 13): the 64→16 signed projection is a "
        "nested higher-order fold in ONE scan-stage Project; the pair "
        "sample is a BroadcastHashJoin on vec_id + stride (systematic O(n), "
        "never all-pairs); the ratio band is a TOTAL CASE expression — no "
        "deterministic predicate on fold-derived columns exists to be "
        "pushed into the join residual, so both sqdist folds evaluate "
        "exactly once per pair (the audit-tool double-eval signature this "
        "query was fixed against in 7b0e05e).",
    ),
    (
        "search_rerank_stage",
        "Two-stage retrieval (round 14; left-join contract round 15): the "
        "BM25 candidate list is a TakeOrderedAndProject prefix that "
        "BROADCASTS into the embeddings join (the scan side prunes to ≤k "
        "rows before any scoring); the 1-row query vector (deterministic "
        "fold-scalar tie-breaks) is a broadcast BNLJ into the cosine pass; "
        "uncovered candidates rejoin via a broadcast LEFT probe of the "
        "≤k-row scored set back onto ranked — the single embeddings scan "
        "is preserved because BroadcastHashJoin cannot build the preserved "
        "side of an outer join.  Stage 2 stays O(k×dim) at any corpus "
        "size.",
    ),
    (
        "signal_spearman_matrix",
        "Tie-corrected Spearman (round 14): NO global row sort anywhere in "
        "the plan — each signal's doubled average ranks come from a "
        "cumulative window over its ~100-row value HISTOGRAM (a "
        "SinglePartition exchange of histogram rows, not docs), broadcast "
        "back onto the doc stream as three BroadcastHashJoins; the moment "
        "sums are one map-side-combinable hash aggregate of DECIMAL-exact "
        "rank products.",
    ),
    (
        "token_budget_selection",
        "Budgeted quality selection (round 14): the (quality DESC, doc_id) "
        "greedy prefix runs WITHOUT a corpus sort — the descending "
        "cumulative lives on the ≤1001-row quality histogram, whole levels "
        "select via a broadcast left-semi join on the level key, and the "
        "single boundary level pays the only doc_id-ordered prefix window, "
        "bounded by one histogram bucket.  The per-source roll-up is one "
        "hash aggregate over the selection-flag left join.",
    ),
    (
        "ann_ivfadc_topk",
        "IVF + PQ composed (round 15): the corpus streams through the "
        "broadcast coarse quantizer into an argmax hash aggregate (list "
        "assignment) and through the broadcast codebook into the argmin "
        "(codes); the codes ⋈ assignment merge on vec_id is the one-time "
        "INDEX-BUILD shuffle (materialized once at ingest in a real "
        "deployment — cache.py posture).  Query-time work never touches a "
        "corpus embedding: scoring is an equi-join of coded lists against "
        "the broadcast (probe-list × distance-table) rows on "
        "(cent_id, m, code) + one decimal-exact ADC hash aggregate over "
        "the IVF-pruned candidate mass only.",
    ),
    (
        "training_order_generate",
        "Constructive training order (round 15): ONE shuffle total — the "
        "per-source rank window (hash-salted intra order); the stride "
        "interleave key is a projection.  No global sort appears in the "
        "plan: consumers achieve the total order with range partitioning "
        "on the emitted key.",
    ),
    (
        "mixture_resample_manifest",
        "Mixture APPLY stage (round 15): per-source aggregate → global "
        "window over the |sources|-row table → broadcast null-safe join "
        "of the target table back onto ONE corpus scan; the survivor "
        "predicate is exact integer arithmetic inside the scan's codegen "
        "stage.  Corpus-shaped work: one scan, one per-source shuffle.",
    ),
    (
        "ann_ivfadc_residual_topk",
        "Residual-encoded IVFADC (round 16, Jégou §VI complete): residuals "
        "r = x − c(x) form via the assignment join + broadcast centroid "
        "table, codes argmin against the broadcast RESIDUAL codebook, and "
        "query-time scoring is an equi-join of codes against the broadcast "
        "per-(query, probed-list) tables on (cent_id, m, code) — no corpus "
        "embedding is touched at query time, exactly the raw-code IVFADC "
        "shape with one extra broadcast join to form residuals.",
    ),
    (
        "image_neardup_pairs",
        "Perceptual-hash image near-dup (round 16): blobs stream through "
        "ONE Arrow-batched mapInPandas (dHash; binary never shuffles), "
        "collapse to the DISTINCT-hash value histogram BEFORE any pairing, "
        "and only band-bucket collisions join — the doc-pair set never "
        "materializes (the simhash aggregate-before-expand shape).",
    ),
    (
        "dedup_bloom_probe_report",
        "Bloom membership probe (round 16): the standing set folds into "
        "<= m/63 bitmap words via ONE bit_or hash aggregate; the batch "
        "probes a BROADCAST word table (left join on word index) and "
        "verdicts collapse per fingerprint — corpus-shaped work is two "
        "scans and two hash aggregates, nothing quadratic anywhere.",
    ),
    (
        "corpus_snapshot_diff",
        "Snapshot diff (round 16): each version collapses to one (doc_id, "
        "MIN fp) row per id — duplicate ids can never fan out — and the "
        "diff is ONE doc_id-keyed full outer join carrying pair keys only; "
        "text never moves past its fingerprint fold.",
    ),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="gen-plans")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical-plan evidence (generated by tools/gen_plans.py)",
        "",
        f"Formatted `.explain` output at `{sf_dir}`; regenerate after plan-affecting",
        "changes.  `tests/test_plans.py` asserts the load-bearing properties in CI.",
        "",
    ]
    for name, why in SHOWCASE:
        df = REGISTRY[name].build(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        # keep the operator tree; drop the verbose per-node detail sections
        tree = plan.split("\n\n(1)")[0].rstrip()
        out += [f"## {name}", "", why, "", "```", tree, "```", ""]
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
