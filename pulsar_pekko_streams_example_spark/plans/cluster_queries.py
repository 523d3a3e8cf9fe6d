"""Clustering, data-mixture, semi-structured, and skew-mitigation queries.

Four capability families a 100 TB training-data curation run needs beyond
dedup/similarity (none exist in the reference — SURVEY §2.7 — it is a
message-pipeline engine; these extend the engine the way its users would):

- **k-means over embeddings** (``kmeans_cluster_profile``,
  ``kmeans_update_components``): Lloyd's assignment and update as pure
  DataFrame ops (operators/clustering.py).  Assignment broadcasts the k
  centroids and never shuffles the corpus; the update shuffles exactly k×d
  aggregated rows.  This is the coarse quantizer that IVF ANN and semantic
  dedup build on.
- **temperature-based mixture weights** (``mixture_temperature_weights``):
  the per-source sampling weights (w ∝ size^0.5) used to rebalance a
  multi-source corpus, computed in one aggregation pass plus a window over
  the handful of post-agg source rows.
- **semi-structured JSON props** (``events_props_json_stats``): JSON-path
  extraction pushed into the scan projection — the typed-payload pattern for
  event streams carrying ad-hoc JSON.
- **skew-safe aggregation** (``salted_segment_event_agg``): the
  operators/partitioning.py ``salted_join`` under a real fact/dim shape —
  150 hot user keys over 10k+ events — proving the salt never changes the
  result (the oracle is the *plain* join).

Cross-engine posture: cosines use the shared left-fold DOT (bit-identical to
DuckDB's list_reduce), every double sum accumulates as DECIMAL(38,6)
(functions/numeric.py), and sqrt is IEEE-correctly-rounded in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_pekko_streams_example_spark.functions.numeric import DEC, davg, dcast, dsum, sql_davg, sql_dsum
from pulsar_pekko_streams_example_spark.operators import clustering, similarity
from pulsar_pekko_streams_example_spark.operators.partitioning import salted_join
from pulsar_pekko_streams_example_spark.plans.data_queries import _duck_dot
from pulsar_pekko_streams_example_spark.plans.registry import register
from pulsar_pekko_streams_example_spark.sources.tables import load_table

KM_K = 8  # clusters; centroids = the k lowest vec_ids (deterministic seed)
KM_DIM = 64  # embedding dimensionality of the test corpus


def _duck_assigned_cte(k: int) -> str:
    """DuckDB twin of clustering.assign(): nearest-centroid by cosine,
    tie-break on lower cluster_id."""
    # Degenerate-vector guard mirrors clustering.assign(): cosine := -1 for
    # zero-norm AND NaN (similarity.safe_cos — NaN would rank first in this
    # DESC window but last in assign()'s negated array_sort) AND NULL (a
    # NULL embedding or NULL element on either side: this DESC window ranks
    # NULL LAST while assign()'s array_sort ranks a NULL struct field FIRST,
    # so a NULL-element seed centroid would otherwise win every vector on
    # the Spark side only).
    norms = (
        f"sqrt({_duck_dot('e.embedding', 'e.embedding')}) * "
        f"sqrt({_duck_dot('c.centroid', 'c.centroid')})"
    )
    cos = similarity.safe_cos(
        _duck_dot("e.embedding", "c.centroid"), norms, "duckdb"
    )
    return f"""
        cent AS (
          SELECT vec_id AS cluster_id, embedding AS centroid
          FROM embeddings WHERE vec_id < {k}
        ),
        scored AS (
          SELECT e.vec_id, e.label, c.cluster_id,
                 COALESCE({cos}, CAST(-1 AS DOUBLE)) AS cosine
          FROM embeddings e CROSS JOIN cent c
        ),
        assigned AS (
          SELECT vec_id, label, cluster_id, cosine FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY cosine DESC, cluster_id) AS rn
            FROM scored
          ) t WHERE rn = 1
        )
    """


@register(
    "kmeans_cluster_profile",
    oracle=f"""
        WITH {_duck_assigned_cte(KM_K).strip()},
        prof AS (
          SELECT cluster_id, COUNT(*) AS n_members,
                 {sql_davg('cosine')} AS avg_cosine
          FROM assigned GROUP BY cluster_id
        ),
        lab AS (
          SELECT cluster_id, label, COUNT(*) AS n
          FROM assigned GROUP BY cluster_id, label
        ),
        top AS (
          SELECT cluster_id, label AS top_label, n AS top_label_n,
                 ROW_NUMBER() OVER (PARTITION BY cluster_id
                                    ORDER BY n DESC, label) AS rn
          FROM lab
        )
        SELECT p.cluster_id, p.n_members, p.avg_cosine, t.top_label, t.top_label_n
        FROM prof p JOIN top t ON p.cluster_id = t.cluster_id AND t.rn = 1
        """,
    doc="Lloyd's assignment step + cluster quality profile: per-cluster size, "
    "mean cosine cohesion, and dominant ground-truth label (purity).  The "
    "corpus never shuffles — centroids broadcast, argmax is windowless.",
    tags=("clustering", "embeddings"),
)
def kmeans_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    # SINGLE aggregate tree over the assignment — the oracle's prof ⋈ top
    # self-join restated as a two-level rollup.  The join form planned the
    # fold-heavy assign subtree TWICE (plan-audited: two
    # BroadcastNestedLoopJoin scoring passes, zero ReusedExchange — an
    # Exchange barrier does NOT help, because each branch's pushed
    # filters/prunes land below it and the subtrees stop being identical).
    # Level 1 groups by (cluster, label); level 2 rolls up to the cluster:
    # decimal cosine sums are associative so avg_cosine is davg exactly
    # (divisor = count of non-NULL cosines, carried up as nc), and the top
    # label is max(struct(n, -label, label)) — ties to the SMALLER label,
    # the same (n DESC, label ASC) order the oracle's ROW_NUMBER pins; the
    # third field just carries the original label out.
    assigned = clustering.assign(emb, clustering.seed_centroids(emb, KM_K))
    lab = assigned.groupBy("cluster_id", "label").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.col("cosine")).alias("nc"),
        F.sum(dcast(F.col("cosine"))).alias("csum"),
    )
    return lab.groupBy("cluster_id").agg(
        F.sum("n").alias("n_members"),
        (F.sum("csum").cast("double") / F.sum("nc")).alias("avg_cosine"),
        F.max(
            F.struct(
                F.col("n").alias("n"),
                (-F.col("label")).alias("negl"),
                F.col("label").alias("label"),
            )
        ).alias("t"),
    ).select(
        "cluster_id",
        "n_members",
        "avg_cosine",
        F.col("t.label").alias("top_label"),
        F.col("t.n").alias("top_label_n"),
    )


@register(
    "kmeans_update_components",
    oracle=f"""
        WITH {_duck_assigned_cte(KM_K).strip()}
        SELECT a.cluster_id, CAST(r.range AS BIGINT) AS dim,
               {sql_dsum('CAST(e.embedding[r.range] AS DOUBLE)')} AS comp_sum,
               COUNT(*) AS n_members
        FROM assigned a
        JOIN embeddings e ON a.vec_id = e.vec_id
        CROSS JOIN LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS range) r
        WHERE e.embedding IS NOT NULL
        GROUP BY a.cluster_id, dim
        """,
    doc="Lloyd's update step in mergeable form: exact per-(cluster, dim) "
    "component sums (DECIMAL-accumulated) + member counts.  Shuffle volume "
    "is k*d aggregated rows regardless of corpus size; the caller divides "
    "once to materialize new centroids.",
    tags=("clustering", "embeddings"),
)
def kmeans_update_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    assigned = clustering.assign(emb, clustering.seed_centroids(emb, KM_K))
    return clustering.update_sums(assigned)


# round-2 assignment shares assign()'s guarded-cosine contract (safe_cos):
# centroid means can be degenerate too (all members NaN in one dimension)
_DUCK_COS2 = similarity.safe_cos(
    _duck_dot("e.embedding", "c.centroid"),
    f"sqrt({_duck_dot('e.embedding', 'e.embedding')}) * "
    f"sqrt({_duck_dot('c.centroid', 'c.centroid')})",
    "duckdb",
)


@register(
    "kmeans_round2_movement",
    oracle=f"""
        WITH {_duck_assigned_cte(KM_K).strip()},
        sums AS (
          SELECT a.cluster_id, CAST(r.range AS BIGINT) AS dim,
                 {sql_dsum('CAST(e.embedding[r.range] AS DOUBLE)')} AS comp_sum,
                 COUNT(*) AS n_members
          FROM assigned a
          JOIN embeddings e ON a.vec_id = e.vec_id
          CROSS JOIN LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS range) r
          WHERE e.embedding IS NOT NULL
          GROUP BY a.cluster_id, dim
        ),
        cent2 AS (
          SELECT cluster_id,
                 list(comp_sum / n_members ORDER BY dim) AS centroid
          FROM sums GROUP BY cluster_id
        ),
        scored2 AS (
          SELECT e.vec_id, c.cluster_id,
                 COALESCE({_DUCK_COS2}, CAST(-1 AS DOUBLE)) AS cosine
          FROM embeddings e CROSS JOIN cent2 c
        ),
        assigned2 AS (
          SELECT vec_id, cluster_id FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY cosine DESC, cluster_id) AS rn
            FROM scored2
          ) t WHERE rn = 1
        )
        SELECT a1.cluster_id AS cluster_r1, a2.cluster_id AS cluster_r2,
               COUNT(*) AS n_docs
        FROM assigned a1 JOIN assigned2 a2 ON a1.vec_id = a2.vec_id
        GROUP BY cluster_r1, cluster_r2
        """,
    doc="A full Lloyd's iteration, oracle-checked end-to-end: seed assign -> "
    "mergeable update -> mean centroids -> re-assign, reported as the "
    "cluster movement matrix.  Each round is broadcast-assign + one k*d "
    "shuffle; the iteration pattern extends to N rounds with a driver loop "
    "plus localCheckpoint lineage truncation (operators/graph.py style).",
    tags=("clustering", "embeddings", "iterative"),
)
def kmeans_round2_movement(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    a1 = clustering.assign(emb, clustering.seed_centroids(emb, KM_K))
    cent2 = clustering.centroids_from_sums(clustering.update_sums(a1))
    a2 = clustering.assign(emb, cent2)
    return (
        a1.select("vec_id", F.col("cluster_id").alias("cluster_r1"))
        .join(a2.select("vec_id", F.col("cluster_id").alias("cluster_r2")), "vec_id")
        .groupBy("cluster_r1", "cluster_r2")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "mixture_temperature_weights",
    oracle="""
        WITH s AS (
          SELECT source, COUNT(*) AS n_docs,
                 CAST(SUM(n_chars) AS BIGINT) AS chars
          FROM documents GROUP BY source
        ),
        w AS (
          -- total sqrt: a poisoned negative n_chars can drive a source's
          -- char sum below zero, where DuckDB's sqrt ERRORS and Spark's
          -- returns NaN — clamp to 0 (a non-positive corpus weighs nothing);
          -- COALESCE first because GREATEST's NULL handling also differs
          -- per engine (round-7 sweep finding)
          SELECT source, n_docs, chars,
                 sqrt(CAST(GREATEST(COALESCE(chars, 0), 0) AS DOUBLE)) AS weight
          FROM s
        )
        SELECT source, n_docs, chars, weight,
               -- an all-degenerate corpus (every weight clamps to 0) has no
               -- defined mixture: share is NULL, never 0/0 (Spark ANSI
               -- raises DIVIDE_BY_ZERO even on doubles)
               CASE WHEN CAST(SUM(TRY_CAST(CASE WHEN isfinite(CAST((weight) AS DOUBLE)) THEN (CASE WHEN abs(CAST((weight) AS DOUBLE)) < 9000000000.0 THEN floor(CAST((weight) AS DOUBLE) * 1e6 + 0.5) / 1e6 ELSE CAST((weight) AS DOUBLE) END) END AS DECIMAL(38,6))) OVER ()
                          AS DOUBLE) > 0
                    THEN weight / CAST(SUM(TRY_CAST(CASE WHEN isfinite(CAST((weight) AS DOUBLE)) THEN (CASE WHEN abs(CAST((weight) AS DOUBLE)) < 9000000000.0 THEN floor(CAST((weight) AS DOUBLE) * 1e6 + 0.5) / 1e6 ELSE CAST((weight) AS DOUBLE) END) END AS DECIMAL(38,6))) OVER ()
                                       AS DOUBLE) END AS share
        FROM w
        """,
    doc="Temperature-based source mixture (alpha=0.5): per-source sampling "
    "share proportional to sqrt(corpus chars) — the standard rebalancing "
    "between over- and under-represented sources.  One agg pass; the global "
    "window runs over the handful of post-agg source rows, not the corpus.",
    tags=("curation", "mixture"),
)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chars"),
    )
    per_src = per_src.withColumn(
        "weight",
        F.expr("sqrt(CAST(GREATEST(COALESCE(chars, 0), 0) AS DOUBLE))"),
    )
    # dcast, not a plain cast (round-16): the shared 6-decimal tie
    # pre-quantization keeps the window sum bit-identical to the oracle's
    total = F.sum(dcast(F.col("weight"))).over(
        Window.partitionBy().rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return per_src.withColumn(
        "share",
        F.when(total.cast("double") > 0, F.col("weight") / total.cast("double")),
    )


@register(
    "events_props_json_stats",
    oracle="""
        SELECT event_type, COUNT(*) AS n_events,
               MIN(k) AS k_min, MAX(k) AS k_max,
               CAST(SUM(k) AS BIGINT) AS k_sum,
               CAST(SUM(k) AS DOUBLE) / COUNT(*) AS avg_k
        FROM (
          SELECT event_type,
                 CASE WHEN json_valid(props)
                      THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                      END AS k
          FROM events
        ) t
        GROUP BY event_type
        """,
    doc="Semi-structured payload stats: JSON-path extraction of the ad-hoc "
    "props field into a typed column inside the scan projection (JVM-side "
    "get_json_object, no UDF), then one hash aggregation by event_type.  "
    "External payloads are hostile by default: malformed JSON, a missing "
    "key, and a non-numeric k all extract to NULL (Spark's get_json_object "
    "+ try_cast are natively total; the oracle needs json_valid + TRY_CAST "
    "because DuckDB's json_extract ERRORS on malformed input).",
    tags=("events", "json"),
)
def events_props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").try_cast("long").alias("k")
    return (
        ev.select("event_type", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.sum("k").alias("k_sum"),
            (F.sum("k").cast("double") / F.count(F.lit(1))).alias("avg_k"),
        )
    )


@register(
    "salted_segment_event_agg",
    oracle=f"""
        SELECT c.c_mktsegment, COUNT(*) AS n_events,
               {sql_dsum('e.value')} AS value_sum
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY c.c_mktsegment
        """,
    doc="Skew-safe fact/dim join: operators/partitioning.salted_join spreads "
    "the 150 hot user keys across 8 salted shuffle buckets (dim side "
    "replicated per salt), then aggregates by segment.  The oracle is the "
    "PLAIN join — the salt must never change the result.",
    tags=("skew", "join"),
)
def salted_segment_event_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .select(F.col("user_id").alias("cust"), "value")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("cust"), "c_mktsegment")
    )
    joined = salted_join(ev, cust, "cust", n_salts=8)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("value_sum"),
    )


# ---------------------------------------------------------------------------
# Semantic dedup (SemDeDup shape): cluster-scoped best-match probe
# ---------------------------------------------------------------------------
SEMDEDUP_THRESHOLD = 0.4   # probe is a semantic dup if best in-cluster cosine >= this
SEMDEDUP_PROBE_MOD = 20    # vec_id % 20 == 0 => probe batch (5%); rest = corpus


@register(
    "semantic_dedup_probe",
    oracle=f"""
        WITH {{assigned}},
        emb2 AS (SELECT vec_id, embedding FROM embeddings),
        probes AS (
          SELECT a.vec_id, a.cluster_id, e.embedding, {{nrm}} AS nrm
          FROM assigned a JOIN emb2 e ON a.vec_id = e.vec_id
          WHERE a.vec_id % {SEMDEDUP_PROBE_MOD} = 0
        ),
        members AS (
          SELECT a.vec_id, a.cluster_id, e.embedding, {{nrm}} AS nrm
          FROM assigned a JOIN emb2 e ON a.vec_id = e.vec_id
          WHERE a.vec_id % {SEMDEDUP_PROBE_MOD} <> 0
        ),
        pm_scored AS (
          SELECT p.vec_id AS probe_id, m.vec_id AS match_id,
                 COALESCE({{cos}}, CAST(-1 AS DOUBLE)) AS cosine
          FROM probes p JOIN members m ON p.cluster_id = m.cluster_id
        ),
        best AS (
          SELECT probe_id, match_id, cosine FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                                         ORDER BY cosine DESC, match_id) AS rn
            FROM pm_scored
          ) t WHERE rn = 1
        )
        SELECT probe_id, match_id, cosine FROM best
        WHERE cosine >= {SEMDEDUP_THRESHOLD}
        """.format(
        assigned=_duck_assigned_cte(KM_K).strip(),
        nrm=f"sqrt({_duck_dot('e.embedding', 'e.embedding')})",
        cos=similarity.safe_cos(
            _duck_dot("p.embedding", "m.embedding"), "p.nrm * m.nrm", "duckdb"
        ),
    ),
    doc="Semantic dedup, cluster-scoped (the SemDeDup recipe): a probe batch "
    "(5% of vectors, the 'new data') is compared ONLY against corpus members "
    "of its own k-means cluster — cost is sum over clusters of "
    "|probes_c| x |members_c|, never probes x corpus.  Per probe the single "
    "best match is an argmin over struct(-cosine, match_id) — one hash "
    "aggregate, windowless, deterministic under ties — and probes whose best "
    "in-cluster cosine clears the threshold are flagged as semantic dups.  "
    "At 100 TB: k scales with corpus size (n / target cluster size), "
    "centroids stay broadcastable, and the per-cluster join is an equi-join "
    "on cluster_id.  Cites SemDeDup (Abbas et al. 2023) as the public "
    "algorithm shape.",
    tags=("clustering", "embeddings", "dedup", "similarity", "added-r3"),
)
def semantic_dedup_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pulsar_pekko_streams_example_spark.operators.similarity import _norm

    emb = load_table(spark, sf_dir, "embeddings")
    # The probe and member branches each plan their own assign subtree —
    # a DELIBERATE recompute (round-12 correction: an Exchange barrier here
    # never yields a ReusedExchange, because each branch's pushed filter
    # lands below it and the two exchange subtrees stop being identical —
    # plan-audited; the old repartition("vec_id") was a full corpus shuffle
    # buying nothing).  Assignment is a map-side broadcast scoring pass
    # (measured 0.27 s of this query's ~1.2 s at sf0.1), so scanning twice
    # beats shuffling or caching the corpus; a pipeline that reuses
    # assignments across MANY consumers materializes them once instead
    # (cache.shared_df / a staging table — the operators/cache.py posture).
    assigned = clustering.assign(emb, clustering.seed_centroids(emb, KM_K)).select(
        "vec_id", "cluster_id", "embedding"
    )
    # norms precomputed PER SIDE (one fold per vector) — the pair projection
    # then does a single fold (the dot) plus one division; recomputing both
    # norms inside the pair expression would triple the fold work on the
    # |probes_c| x |members_c| pair volume (measured 6.8s -> ~2s at sf0.1)
    # TOTAL cluster ids with BRANCH-SPECIFIC sentinels (-1 probes, -2
    # members): the equi-join on cluster_id is null-rejecting, and with a
    # nullable id Spark pushed isnotnull(<the whole k-cosine assign
    # expression>) into each branch's scoring pass as a join residual —
    # doubling the corpus scoring (plan-audited; tools/audit_plans.py now
    # pins this).  cluster_id is NULL only when the seed-centroid set is
    # EMPTY (degenerate corpus); distinct sentinels keep that case producing
    # ZERO pairs — exactly the NULL-join semantics — where one shared
    # sentinel would cross-join the whole corpus with itself.
    probes = assigned.filter(F.col("vec_id") % SEMDEDUP_PROBE_MOD == 0).select(
        F.col("vec_id").alias("probe_id"),
        F.coalesce(F.col("cluster_id"), F.lit(-1).cast("long")).alias("cluster_id"),
        F.col("embedding").alias("p_emb"),
        F.expr(_norm("embedding")).alias("p_nrm"),
    )
    members = assigned.filter(F.col("vec_id") % SEMDEDUP_PROBE_MOD != 0).select(
        F.col("vec_id").alias("match_id"),
        F.coalesce(F.col("cluster_id"), F.lit(-2).cast("long")).alias("cluster_id"),
        F.col("embedding").alias("m_emb"),
        F.expr(_norm("embedding")).alias("m_nrm"),
    )
    # salted join: cluster_id has only k distinct values, so a plain shuffle
    # join caps the pair-scoring parallelism at k reducers.  Salting the
    # (large) member side and replicating the (5%) probe side re-buckets the
    # same pairs across k x n_salts partitions — the salt never changes the
    # result, only the layout.
    # Round-17 (guide §4.2, VERDICT r16 ask #5): the per-PAIR cosine is the
    # Arrow-batched numpy fold (similarity.total_pair_cosines) instead of
    # the interpreted 64-dim higher-order aggregate — the fold was this
    # query's dominant per-pair cost (|probes_c| x |members_c| pairs), and
    # HOF lambdas run interpreted with no codegen.  Values bit-identical:
    # dimension-ordered fold, JVM-computed norms ride in, and the TOTAL
    # contract (NULL embedding / NULL element / ragged / zero norm / NaN
    # := -1, the worst score) is what the old coalesce(safe_cos, -1)
    # computed — in BOTH engines: the min(struct) argmin below ranks a NULL
    # first field FIRST (best) while the oracle's DESC window ranks it LAST,
    # so totality is still load-bearing (same contract as clustering.assign).
    scored = (
        salted_join(members, probes, "cluster_id", n_salts=16)
        .select(
            F.col("probe_id").alias("id_a"),
            F.col("match_id").alias("id_b"),
            F.col("p_emb").alias("ea"),
            F.col("p_nrm").alias("na"),
            F.col("m_emb").alias("eb"),
            F.col("m_nrm").alias("nb"),
        )
        .mapInPandas(similarity.total_pair_cosines, similarity.TOTAL_COS_SCHEMA)
        .select(
            F.col("id_a").alias("probe_id"),
            F.col("id_b").alias("match_id"),
            "cosine",
        )
    )
    best = (
        scored.groupBy("probe_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("cosine")).alias("neg_cos"),
                    F.col("match_id").alias("match_id"),
                )
            ).alias("b")
        )
        .select(
            "probe_id",
            F.col("b.match_id").alias("match_id"),
            (-F.col("b.neg_cos")).alias("cosine"),
        )
    )
    return best.filter(F.col("cosine") >= SEMDEDUP_THRESHOLD)


# ---------------------------------------------------------------------------
# Product quantization: per-subspace codebook assignment + distortion ledger
# ---------------------------------------------------------------------------
PQ_M = 4  # subspaces
PQ_DSUB = KM_DIM // PQ_M  # dims per subspace
PQ_K = 8  # codes per subspace; codebook = subvectors of the PQ_K lowest vec_ids


def _l2sq_spark(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, "
        "(x, y) -> (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * "
        "(CAST(x AS DOUBLE) - CAST(y AS DOUBLE))), "
        "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def _l2sq_duck(a: str, b: str) -> str:
    # greatest-length iteration + NULL-array CASE (round-16 ragged-pair
    # totality, see similarity.sqdist): matches Spark's zip_with NULL-pad
    # on mismatched lengths instead of folding a real partial distance
    # over len(a), and a NULL array folds to NULL, not 0.0 (DuckDB's
    # greatest ignores NULL args; list_prepend(0.0, NULL) is [0.0])
    return (
        f"(CASE WHEN {a} IS NULL OR {b} IS NULL THEN NULL ELSE "
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, greatest(len({a}), len({b})) + 1), "
        f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
        f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))), (acc, x) -> acc + x) END)"
    )


@register(
    "pq_code_histogram",
    oracle=f"""
        WITH sub AS (
          SELECT vec_id, CAST(m.range AS BIGINT) AS m,
                 embedding[m.range * {PQ_DSUB} + 1 : (m.range + 1) * {PQ_DSUB}] AS subv
          FROM embeddings, range(0, {PQ_M}) m
        ),
        cb AS (
          SELECT m, vec_id AS code_id, subv AS codev FROM sub WHERE vec_id < {PQ_K}
        ),
        scored AS (
          SELECT s.vec_id, s.m, c.code_id,
                 COALESCE({_l2sq_duck('s.subv', 'c.codev')},
                          CAST('Infinity' AS DOUBLE)) AS d,
                 ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                                    ORDER BY COALESCE({_l2sq_duck('s.subv', 'c.codev')},
                                                      CAST('Infinity' AS DOUBLE)), c.code_id)
                   AS rk
          FROM sub s JOIN cb c ON s.m = c.m
        )
        SELECT m, CAST(code_id AS BIGINT) AS code_id,
               COUNT(*) AS n_assigned,
               {sql_dsum('d')} AS sse
        FROM scored WHERE rk = 1 GROUP BY m, code_id
        """,
    doc=f"Product quantization (the IVF-PQ memory path of billion-scale "
    f"ANN): each {KM_DIM}-dim embedding splits into {PQ_M} subvectors of "
    f"{PQ_DSUB} dims; each subvector is assigned its nearest of {PQ_K} "
    "codebook entries by exact L2 (deterministic seed codebook: the "
    f"lowest-{PQ_K} vec_ids' subvectors), compressing each vector to "
    f"{PQ_M} byte-sized codes.  Reported per (subspace, code): members "
    "and the summed squared reconstruction distortion — the "
    "codebook-health report that decides retrain-vs-reuse.  Engine shape "
    "mirrors the k-means assign: the codebook broadcasts as ONE "
    f"collected row of {PQ_M}x{PQ_K} subvectors, the corpus fans out "
    f"x{PQ_M} INSIDE its scan partitions (posexplode of slices, no "
    "shuffle), argmin is a windowless array_sort pick, and the single "
    f"exchange carries {PQ_M}x{PQ_K} aggregate rows.  The oracle takes "
    "the same distances through a rank window — implementation-"
    "independent cross-check.",
    tags=("similarity", "quantization", "clustering", "added-r3b"),
)
def pq_code_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    slices = F.array(
        *[F.slice("embedding", m * PQ_DSUB + 1, PQ_DSUB) for m in range(PQ_M)]
    )
    sub = emb.select(
        "vec_id", F.posexplode(slices).alias("m", "subv")
    ).withColumn("m", F.col("m").cast("long"))
    cb = F.broadcast(
        sub.filter(F.col("vec_id") < PQ_K)
        .select(F.col("m"), F.col("vec_id").alias("code_id"), F.col("subv").alias("codev"))
        .groupBy("m")
        .agg(
            F.sort_array(F.collect_list(F.struct("code_id", "codev"))).alias("codes")
        )
    )
    # NULL distance (NULL subvector / NULL element on either side — the L2
    # fold propagates NULL) := +Infinity, the worst score, in BOTH engines:
    # this array_sort argmin ranks a NULL struct field FIRST (best) while
    # the oracle's ASC window ranks NULL LAST, so one NULL-element codebook
    # entry would otherwise capture every subvector on the Spark side only.
    # NaN distances rank beyond Infinity identically in both engines, and
    # the Infinity sentinel is excluded from sse by the total dsum.
    best = (
        sub.join(cb, "m")
        .select(
            "vec_id",
            "m",
            F.expr(
                "array_sort(transform(codes, c -> struct("
                f"coalesce({_l2sq_spark('subv', 'c.codev')}, "
                "CAST('Infinity' AS DOUBLE)) AS d, "
                "c.code_id AS code_id)))[0]"
            ).alias("best"),
        )
    )
    return best.groupBy("m", F.col("best.code_id").cast("long").alias("code_id")).agg(
        F.count(F.lit(1)).alias("n_assigned"),
        dsum(F.col("best.d")).alias("sse"),
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss projection distortion: does 16-dim preserve distance?
# ---------------------------------------------------------------------------
# Before swapping 64-dim embeddings for a cheaper projection in dedup / ANN
# candidate generation, measure what the projection does to pairwise
# distances.  Signed-random-projection JL: p_k = sum_d sign(k,d) * e_d with
# a DETERMINISTIC +-1 matrix derived from a multiplicative hash of
# (k*64 + d) — a pure function of the data layout, so the DuckDB oracle
# replays the projection bit-for-bit (production would use a seeded
# Gaussian; the +-1 variant is the Achlioptas-style database-friendly
# form).  Each projected coordinate is a full signed dot product, so
# E||p_a - p_b||^2 = k * ||a - b||^2 and the unbiased distance estimator
# is ||p_a - p_b||^2 / k; the query reports the ratio histogram over a systematic
# O(n) pair sample (vec_id joined to vec_id + RP_PAIR_STRIDE — an
# equi-join, never an all-pairs product).
RP_K = 16  # projected dims
RP_DIM = 64  # source dims
RP_PAIR_STRIDE = 17  # systematic pair sample: (v, v + stride)
_RP_SIGN = (
    "CASE WHEN ((({idx}) * 2654435761) % 1048573) % 2 = 0 "
    "THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END"
)


def _rp_project(arr: str, dialect: str) -> str:
    """16-dim signed projection of 64-dim array ``arr`` — nested
    higher-order fold, dimension order fixed in both engines."""
    if dialect == "spark":
        sign = _RP_SIGN.format(idx=f"k * {RP_DIM} + d")
        return (
            f"transform(sequence(0, {RP_K - 1}), k -> "
            f"aggregate(sequence(0, {RP_DIM - 1}), CAST(0.0 AS DOUBLE), "
            f"(acc, d) -> acc + ({sign}) * CAST(element_at({arr}, d + 1) AS DOUBLE)))"
        )
    sign = _RP_SIGN.format(idx=f"(k - 1) * {RP_DIM} + (d - 1)")
    return (
        f"list_transform(range(1, {RP_K} + 1), k -> "
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {RP_DIM} + 1), d -> "
        f"({sign}) * CAST({arr}[d] AS DOUBLE))), (acc, x) -> acc + x))"
    )


@register(
    "rp_projection_distortion",
    oracle=f"""
        WITH proj AS (
          SELECT vec_id, embedding,
                 {_rp_project('embedding', 'duckdb')} AS p
          FROM embeddings
          WHERE embedding IS NOT NULL AND len(embedding) = {RP_DIM}
        ),
        pairs AS (
          SELECT {similarity.sqdist('a.embedding', 'b.embedding', 'duckdb')} AS d_orig,
                 {similarity.sqdist('a.p', 'b.p', 'duckdb')} AS d_proj
          FROM proj a JOIN proj b ON b.vec_id = a.vec_id + {RP_PAIR_STRIDE}
        )
        SELECT CASE WHEN d_orig > 0 AND NOT isnan(d_orig) AND NOT isnan(d_proj)
                    THEN CASE WHEN NOT isnan(d_proj / ({RP_K}.0 * d_orig))
                              AND (d_proj / ({RP_K}.0 * d_orig)) * 10.0
                                  < CAST('9e18' AS DOUBLE)
                         THEN CAST(FLOOR((d_proj / ({RP_K}.0 * d_orig)) * 10.0)
                                   AS BIGINT)
                         END
               END AS ratio_band,
               COUNT(*) AS pairs
        FROM pairs
        GROUP BY 1
        """,
    doc="JL random-projection distortion report: a deterministic signed "
    "(+-1) projection of the 64-dim embeddings to 16 dims, then the "
    "histogram of (scaled projected distance / true distance) over a "
    "systematic O(n) pair sample (vec_id equi-joined to vec_id + 17 — "
    "never an all-pairs product).  The decision query before moving "
    "dedup/ANN candidate generation onto a cheaper projection: mass near "
    "ratio 1.0 means 4x cheaper distance math at measured recall risk.  "
    "The projection is a nested higher-order fold in fixed dimension "
    "order, and the sign matrix is a multiplicative hash of the (k, d) "
    "index — both engines replay every double bit-for-bit.  At 100 TB "
    "the projection is one scan-stage map; the pair sample shuffles "
    "(vec_id, 16 floats) once for the self-join.",
    tags=("similarity", "statistics", "added-r13"),
)
def rp_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    proj = (
        similarity.spread(emb)
        .filter(F.col("embedding").isNotNull() & (F.size("embedding") == RP_DIM))
        .select(
            "vec_id",
            "embedding",
            F.expr(_rp_project("embedding", "spark")).alias("p"),
        )
    )
    a = proj.select(
        F.col("vec_id").alias("aid"),
        F.col("embedding").alias("ea"),
        F.col("p").alias("pa"),
    )
    b = proj.select(
        (F.col("vec_id") - F.lit(RP_PAIR_STRIDE)).alias("aid"),
        F.col("embedding").alias("eb"),
        F.col("p").alias("pb"),
    )
    pairs = a.join(b, "aid").select(
        F.expr(similarity.sqdist("ea", "eb", "spark")).alias("d_orig"),
        F.expr(similarity.sqdist("pa", "pb", "spark")).alias("d_proj"),
    )
    # TOTAL band expression, NO filter: a deterministic predicate on the
    # fold-derived columns would push into the join residual and re-evaluate
    # both 64-dim folds per pair (the semdedup_threshold_curve lesson, and
    # exactly what tools/audit_plans.py flags).  Unscorable pairs (zero or
    # NaN true distance, NaN projection) land in a NULL band row instead —
    # both engines group NULLs together.
    # ratio-level guards (hostile-sweep finding, round 14): float32-max
    # garbage makes d_proj/d_orig = Inf/Inf = NaN, and a finite d_orig with
    # Inf d_proj makes the ratio +Inf — both must land in the NULL band,
    # not error the int64 floor cast
    # ratio guards NESTED under the d_orig > 0 branch: the division must not
    # evaluate for d_orig = 0 rows (Spark ANSI raises DIVIDE_BY_ZERO inside a
    # WHEN predicate — AND does not short-circuit it); the inner CASE rejects
    # NaN ratios (Inf/Inf from float32-max garbage) and ratios too large for
    # the int64 floor (Inf, or a finite ratio past 9e17)
    band = (
        "CASE WHEN d_orig > 0 AND NOT isnan(d_orig) AND NOT isnan(d_proj) "
        f"THEN CASE WHEN NOT isnan(d_proj / ({RP_K}.0 * d_orig)) "
        f"AND (d_proj / ({RP_K}.0 * d_orig)) * 10.0 < CAST('9e18' AS DOUBLE) "
        f"THEN CAST(FLOOR((d_proj / ({RP_K}.0 * d_orig)) * 10.0) AS BIGINT) "
        "END END"
    )
    return (
        pairs.select(F.expr(band).alias("ratio_band"))
        .groupBy("ratio_band")
        .agg(F.count(F.lit(1)).alias("pairs"))
    )


# ---------------------------------------------------------------------------
# Embedding per-dimension profile: the whitening / encoder-drift audit
# ---------------------------------------------------------------------------
# Per-dimension mean/variance/extrema over the embedding matrix — what a
# pipeline inspects before whitening or PCA, and the cheapest detector of a
# broken encoder (a dead dimension has var ~ 0; a saturated one pins the
# extrema).  One posexplode pass, one (dim)-keyed aggregation of exact
# DECIMAL(38,6) sums; the derived mean/var doubles come from ONE shared
# expression string per dialect so both engines round identically.  Rows
# with non-finite components contribute NULL to the sums (the davg/dsum
# total-cast contract) and are excluded from the extrema symmetrically.


@register(
    "embedding_dim_profile",
    oracle=f"""
        WITH comp AS (
          -- CAST before any arithmetic: embedding[i] is FLOAT32 and DuckDB
          -- would square/round in single precision while Spark works in
          -- DOUBLE; float32->double is exact, so casting first makes every
          -- downstream op see identical values
          SELECT i.i AS dim, CAST(e.embedding[i.i] AS DOUBLE) AS x
          FROM embeddings e,
               LATERAL (SELECT unnest(range(1, len(e.embedding) + 1)) AS i) i
          WHERE e.embedding IS NOT NULL
        ),
        agg AS (
          -- n counts FINITE components only, symmetric with the sums and
          -- extrema (ADVICE r14: COUNT(x) counted NaN/Inf components the
          -- decimal-guarded sums exclude, silently diluting mean/var on
          -- hostile rows)
          SELECT dim,
                 CAST(COUNT(CASE WHEN isfinite(x) THEN x END) AS BIGINT) AS n,
                 {sql_dsum('x')} AS sum_x,
                 {sql_dsum('x * x')} AS sum_x2,
                 MIN(CASE WHEN isfinite(x) THEN x END) AS min_x,
                 MAX(CASE WHEN isfinite(x) THEN x END) AS max_x
          FROM comp GROUP BY dim
        )
        -- n = 0 (every component of a dimension non-finite) must yield NULL
        -- moments, not a zero-division: Spark ANSI would abort where DuckDB
        -- yields NULL, so both dialects guard explicitly
        SELECT CAST(dim AS BIGINT) AS dim, n, sum_x, sum_x2,
               CASE WHEN n > 0 THEN sum_x / n END AS mean,
               CASE WHEN n > 0 THEN sum_x2 / n - (sum_x / n) * (sum_x / n) END
                 AS var,
               min_x, max_x
        FROM agg
        """,
    doc="Per-dimension embedding profile (mean / variance / extrema / exact "
    "sums): the pre-whitening and encoder-drift audit over the embedding "
    "matrix.  ONE posexplode pass (components never leave their scan "
    "partition until the |dims|-keyed aggregate), exact DECIMAL(38,6) "
    "accumulation for both moments (double sum order never enters), and "
    "the derived mean/var doubles share one expression string across "
    "dialects so rounding is bit-identical.  Non-finite components (real "
    "at 100 TB: float32-max garbage, NaN from failed encoders) are "
    "NULL-excluded from n, sums, and extrema symmetrically in both "
    "engines — the moments describe exactly the finite mass, and an "
    "all-non-finite dimension reports NULL moments (n = 0 guard) rather "
    "than an ANSI zero-division.  At scale: shuffle carries |dims| x 4 "
    "scalars per partition, nothing else.",
    tags=("similarity", "statistics", "added-r14"),
)
def embedding_dim_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _embedding_dim_profile(load_table(spark, sf_dir, "embeddings"))


def _embedding_dim_profile(emb: DataFrame) -> DataFrame:
    """Core over an explicit embeddings frame (property-tested)."""
    comp = (
        emb.filter(F.col("embedding").isNotNull())
        .select(F.posexplode("embedding").alias("pos", "xf"))
        .select((F.col("pos") + 1).cast("long").alias("dim"),
                F.col("xf").cast("double").alias("x"))
    )
    finite = (
        "CASE WHEN isnan(x) OR abs(x) = CAST('Infinity' AS DOUBLE) "
        "THEN NULL ELSE x END"
    )
    agg = comp.groupBy("dim").agg(
        # finite components only — symmetric with the decimal-guarded sums
        # and the extrema (ADVICE r14)
        F.count(F.expr(finite)).cast("long").alias("n"),
        dsum(F.col("x")).alias("sum_x"),
        dsum(F.expr("x * x")).alias("sum_x2"),
        F.min(F.expr(finite)).alias("min_x"),
        F.max(F.expr(finite)).alias("max_x"),
    )
    # n = 0 guard: an all-non-finite dimension must report NULL moments, not
    # an ANSI DIVIDE_BY_ZERO (shared expression shape with the oracle)
    return agg.select(
        "dim",
        "n",
        "sum_x",
        "sum_x2",
        F.expr("CASE WHEN n > 0 THEN sum_x / n END").alias("mean"),
        F.expr(
            "CASE WHEN n > 0 THEN sum_x2 / n - (sum_x / n) * (sum_x / n) END"
        ).alias("var"),
        "min_x",
        "max_x",
    )
