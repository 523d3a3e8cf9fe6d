"""Connected components over near-duplicate pair graphs — the clustering
step of large-scale dedup (pairs → clusters → one canonical doc per cluster).

Algorithm: iterative min-label propagation (a.k.a. hash-to-min).  Every node
starts labeled with itself; each round every node adopts the minimum label in
its neighborhood; fixpoint = components.  Rounds needed = graph diameter
(near-dup clusters are shallow — a handful of rounds), each round is one
shuffle-join on node id.  This is the standard Spark formulation of an
inherently iterative algorithm: the DRIVER controls the loop (cheap — one
count per round to test convergence), the DATA never leaves the cluster.

At 100 TB: edges ≪ corpus (only near-dup pairs), labels are (long, long)
pairs, and each round's join is AQE-optimizable; checkpoint every few rounds
to truncate lineage for deep graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 20
) -> DataFrame:
    """(node, component): component = min node id reachable via ``edges``.

    ``edges`` must contain undirected pairs (one row per pair, any order).
    Nodes appearing in no edge are not emitted (callers union isolated nodes
    with label=self if needed).
    """
    sym = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    # adjacency including self-loop so a node retains its own label
    adj = sym.unionByName(
        sym.select(F.col("a"), F.col("a").alias("b"))
    ).distinct()
    # materialize ONCE: every round re-reads the edge set, and without this
    # each iteration would recompute the (possibly expensive) upstream plan
    # that produced the pairs — the standard checkpoint for iterative bases
    adj = adj.localCheckpoint(eager=True)

    labels = adj.groupBy("a").agg(F.min("b").alias("label")).withColumnRenamed("a", "node")

    for _ in range(max_iter):
        # propagate: each node takes the min label among its neighbors (and itself)
        neighbor_labels = (
            adj.join(labels.withColumnRenamed("node", "b"), ["b"])
            .groupBy("a")
            .agg(F.min("label").alias("new_label"))
            .withColumnRenamed("a", "node")
            # materialize each round: the convergence count below executes the
            # plan anyway, and without truncation round k's lineage replays
            # rounds 1..k-1 — O(rounds²) work and an ever-deeper DAG
            .localCheckpoint(eager=True)
        )
        changed = (
            labels.join(neighbor_labels, ["node"])
            .filter(F.col("new_label") < F.col("label"))
            .limit(1)
            .count()
        )
        labels = neighbor_labels.withColumnRenamed("new_label", "label")
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))
