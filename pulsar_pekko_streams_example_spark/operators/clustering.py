"""Embedding clustering: Lloyd's k-means assignment + update as DataFrame ops.

The reference engine has no clustering operator (SURVEY §2.7 — it is a
message-pipeline engine), but a 100 TB training-data curation run needs
embedding clustering for semantic dedup, topic balancing, and IVF coarse
quantizers (the `ann_ivf_topk` path in operators/similarity.py uses exactly
this assignment step).  Both steps here are pure DataFrame compositions — no
UDFs — so they stay inside whole-stage codegen and scale by partitioning:

- ``assign``: broadcast the k centroids (k is small by construction) against
  the corpus; one projection computes all k cosines per row; argmax via a
  deterministic ``array_sort`` on (negative cosine, centroid_id) — NO window,
  NO shuffle: the corpus never leaves its scan partitioning.
- ``update``: posexplode the assigned vectors and hash-aggregate per
  (cluster, dim) with exact DECIMAL accumulation — one shuffle of
  (cluster, dim) pairs, i.e. k×d rows, regardless of corpus size.

Determinism: cosines use the shared left-fold DOT (bit-identical to the
DuckDB oracle's list_reduce); component sums accumulate as DECIMAL(38,6) so
partial-aggregation order cannot change the result (functions/numeric.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pulsar_pekko_streams_example_spark.functions.numeric import dsum
from pulsar_pekko_streams_example_spark.operators.partitioning import spread
from pulsar_pekko_streams_example_spark.operators.similarity import DOT, _norm


def seed_centroids(emb: DataFrame, k: int) -> DataFrame:
    """Deterministic seeding: the k lowest vec_ids become the centroids.

    (Real k-means++ would sample; for cross-engine verification every
    pseudo-random choice must be replicable in plain SQL, and fixed-id
    seeding is the standard deterministic-test variant.)
    """
    return emb.filter(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cluster_id"),
        F.col("embedding").alias("centroid"),
    )


def assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment by cosine, tie-break on lower cluster_id.

    Returns (vec_id, embedding, label, cluster_id, cosine).  The centroid
    side is broadcast; the corpus side keeps its scan partitioning — at
    100 TB this is one map-side pass, zero shuffles.
    """
    # Centroid norms are precomputed INTO the broadcast struct (k values,
    # once) and the row's own norm once per row — the per-(row, centroid)
    # lambda then does a single fold (the dot product).  The folds are
    # interpreted higher-order functions, so trimming redundant folds is the
    # dominant constant-factor win for the whole assign family.
    cent = F.broadcast(
        centroids.select(
            "cluster_id", "centroid", F.expr(_norm("centroid")).alias("cnrm")
        )
        .groupBy()
        .agg(
            F.sort_array(
                F.collect_list(F.struct("cluster_id", "centroid", "cnrm"))
            ).alias("cents")
        )
    )
    # Degenerate-vector guard (the negated twin of similarity.safe_cos):
    # a zero norm product would raise DIVIDE_BY_ZERO under ANSI, and a NaN
    # cosine (NaN/Inf components — real at corpus scale) RANKS DIFFERENTLY
    # across formulations: this array_sort on the NEGATED value puts NaN
    # last (best never), while the oracle's DESC window puts NaN first, so
    # assignments would silently diverge.  NULL cosines (NULL embedding or a
    # NULL *element* on either side — the dot fold propagates NULL) are the
    # same trap with the opposite sign: array_sort ranks a NULL first field
    # FIRST (best!) while the oracle's DESC window ranks NULL LAST, so one
    # NULL-element seed centroid would silently capture every vector.
    # Contract, identical in the DuckDB oracle (_duck_assigned_cte): cosine
    # := -1 (neg_cos 1, the worst possible score) for zero-norm, NaN, and
    # NULL alike — degenerate vectors are similar to nothing; ties break on
    # cluster_id, so assignment stays deterministic and total.
    neg_cos = (
        "coalesce(nanvl(CASE WHEN _norm_a * c.cnrm = CAST(0 AS DOUBLE) "
        "THEN CAST(1 AS DOUBLE) "
        f"ELSE -({DOT.format(a='embedding', b='c.centroid')}"
        " / (_norm_a * c.cnrm)) END, CAST(1 AS DOUBLE)), CAST(1 AS DOUBLE))"
    )
    scored = (
        spread(emb)
        .crossJoin(cent)
        .withColumn("_norm_a", F.expr(_norm("embedding")))
        .select(
            "vec_id",
            "embedding",
            "label",
            # one struct per centroid: (cosine, cluster_id); pick the best by
            # sorting on (-cosine, cluster_id) — deterministic, windowless.
            # get(), not [0]: an all-null/empty embedding table yields ZERO
            # centroids and [0] on the empty array is an ANSI error — get()
            # degrades to a NULL assignment instead of failing the job
            F.expr(
                "get(array_sort(transform(cents, c -> struct("
                f"{neg_cos} AS neg_cos, "
                "c.cluster_id AS cluster_id))), 0)"
            ).alias("best"),
        )
    )
    return scored.select(
        "vec_id",
        "embedding",
        "label",
        F.col("best.cluster_id").alias("cluster_id"),
        (-F.col("best.neg_cos")).alias("cosine"),
    )


def update_sums(assigned: DataFrame) -> DataFrame:
    """Lloyd's update step in mergeable form: per (cluster_id, dim) the exact
    member-component sum (DECIMAL-accumulated → DOUBLE) and member count.

    Emitting sums rather than means keeps every value exact and
    order-independent; the caller divides (one deterministic double division)
    when it materializes new centroids.  Shuffle volume is k×d rows total.
    """
    comp = assigned.select(
        "cluster_id",
        F.posexplode("embedding").alias("dim0", "comp"),
    )
    # dsum (try_cast accumulation): a NaN/Inf/float32-max component must not
    # abort the whole update job — it contributes NULL (excluded), identical
    # to the oracle's isfinite+TRY_CAST twin (functions/numeric.py)
    return (
        comp.groupBy("cluster_id", (F.col("dim0") + 1).cast("long").alias("dim"))
        .agg(
            dsum(F.col("comp").cast("double")).alias("comp_sum"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


def centroids_from_sums(sums: DataFrame) -> DataFrame:
    """Materialize new centroids from ``update_sums`` output: per cluster,
    the dim-ordered array of component means (one deterministic double
    division per component).  k rows total — broadcastable by construction,
    so the next ``assign`` round is again a map-side pass.
    """
    return sums.groupBy("cluster_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("dim").alias("dim"),
                        (F.col("comp_sum") / F.col("n_members")).alias("c"),
                    )
                )
            ),
            lambda s: s["c"],
        ).alias("centroid")
    )
