"""Text analysis operators: token stats, quality scoring, language-ID signals.

All JVM-side (higher-order array functions) — no Python in the hot path; at
100 TB these run inside whole-stage codegen over the parquet scan with only
the final small aggregate shuffling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pulsar_pekko_streams_example_spark.functions import hashing as H

# tiny function-word list present in the synthetic vocabulary
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def _stop_pred(var: str) -> str:
    return " OR ".join(f"{var} = '{w}'" for w in STOPWORDS)


def with_text_features(docs: DataFrame) -> DataFrame:
    """Adds token_count, distinct_ratio, stop_ratio, quality (all deterministic
    double arithmetic, reproducible in the oracle)."""
    d = docs.withColumn("w", F.expr(H.tokens("text", "spark")))
    d = d.withColumn("token_count", F.size("w").cast("long"))
    d = d.withColumn(
        "distinct_ratio",
        F.size(F.array_distinct("w")).cast("double") / F.col("token_count"),
    )
    d = d.withColumn(
        "stop_ratio",
        F.size(F.expr(f"filter(w, t -> {_stop_pred('t')})")).cast("double") / F.col("token_count"),
    )
    return d.withColumn("quality", quality_expr())


def quality_expr() -> Column:
    """Quality score: length saturation + lexical diversity − function-word
    degeneracy.  Mirrors the heuristic quality filters of LLM data pipelines."""
    return (
        F.lit(0.4) * F.least(F.lit(1.0), F.col("token_count") / F.lit(100.0))
        + F.lit(0.3) * F.col("distinct_ratio")
        + F.lit(0.3) * (F.lit(1.0) - F.col("stop_ratio"))
    )


SQL_FEATURES_CTE = f"""
feats AS (
  SELECT *,
         CAST(len(w) AS BIGINT) AS token_count,
         CAST(len(list_distinct(w)) AS DOUBLE) / len(w) AS distinct_ratio,
         CAST(len(list_filter(w, t -> {_stop_pred('t')})) AS DOUBLE) / len(w) AS stop_ratio
  FROM (SELECT *, list_filter(string_split(text, ' '), t -> t <> '') AS w FROM documents)
),
scored AS (
  SELECT *,
         0.4 * least(1.0, token_count / 100.0)
         + 0.3 * distinct_ratio
         + 0.3 * (1.0 - stop_ratio) AS quality
  FROM feats
)
"""
