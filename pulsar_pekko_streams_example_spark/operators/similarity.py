"""Similarity search over embedding columns (array<float>).

Two execution paths:

- ``cosine_topk`` — declarative brute force: broadcast the (small) query set,
  JVM-side zip_with/aggregate dot products, window top-k.  This is the
  oracle-parity path (deterministic left-fold double accumulation identical
  to DuckDB's list_reduce).
- ``cosine_topk_numpy`` — the throughput path: one Arrow-batched
  mapInPandas doing a numpy matmul per batch against the broadcast query
  matrix.  At 100 TB this is the shape you want: embeddings never shuffle,
  each partition streams through a single GEMM; top-k then reduces
  (k × queries) rows per partition, not the full score matrix.

Both return identical rows (tested) — cosine in float64, rank by (score
desc, vec_id).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
    "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
)


def _norm(col: str) -> str:
    return f"sqrt({DOT.format(a=col, b=col)})"


def cosine_topk(emb: DataFrame, query_filter: str, k: int) -> DataFrame:
    """Brute-force cosine top-k: queries × corpus via broadcast nested-loop,
    declarative dot products, rank window per query."""
    q = emb.filter(F.expr(query_filter)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.expr(DOT.format(a="qe", b="ne"))
            / (F.expr(_norm("qe")) * F.expr(_norm("ne"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


_TOPK_SCHEMA = StructType(
    [
        StructField("query_id", LongType()),
        StructField("neighbor_id", LongType()),
        StructField("cosine", DoubleType()),
    ]
)


def cosine_topk_numpy(emb: DataFrame, query_filter: str, k: int) -> DataFrame:
    """Vectorized brute-force ANN baseline: per-partition numpy GEMM against
    the broadcast query matrix, partial top-k per partition, global top-k
    reduce.  No shuffle of the corpus; only (partitions × queries × k) rows
    move."""
    import numpy as np

    spark = emb.sparkSession
    qrows = emb.filter(F.expr(query_filter)).select("vec_id", "embedding").collect()
    q_ids = np.array([r["vec_id"] for r in qrows], dtype=np.int64)
    q_mat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)
    bq = spark.sparkContext.broadcast((q_ids, q_mat, q_norm))

    def part_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, qm, qn = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            nid = pdf["vec_id"].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf["embedding"]), dtype=np.float64)
            nn = np.linalg.norm(mat, axis=1)
            scores = (qm @ mat.T) / (qn[:, None] * nn[None, :])  # queries × batch
            for qi in range(len(ids)):
                mask = nid != ids[qi]
                srow = scores[qi][mask]
                nrow = nid[mask]
                top = min(k, len(srow))
                idx = np.argpartition(-srow, top - 1)[:top] if top else []
                yield pd.DataFrame(
                    {
                        "query_id": ids[qi],
                        "neighbor_id": nrow[idx],
                        "cosine": srow[idx],
                    }
                )

    partial = emb.select("vec_id", "embedding").mapInPandas(part_topk, _TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        partial.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )
