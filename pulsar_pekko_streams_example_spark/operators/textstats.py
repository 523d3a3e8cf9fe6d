"""Text analysis operators: token stats, quality scoring, language-ID signals.

All JVM-side (higher-order array functions) — no Python in the hot path; at
100 TB these run inside whole-stage codegen over the parquet scan with only
the final small aggregate shuffling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pulsar_pekko_streams_example_spark.functions import hashing as H

# tiny function-word list present in the synthetic vocabulary
STOPWORDS = ("the", "a", "of", "and", "to", "in")


def _stop_pred(var: str) -> str:
    return " OR ".join(f"{var} = '{w}'" for w in STOPWORDS)


def with_text_features(docs: DataFrame) -> DataFrame:
    """Adds token_count, distinct_ratio, stop_ratio, quality_milli, quality.

    ``quality_milli`` is an EXACT integer on a 0–1000 scale (floor division),
    so quality aggregates sum integers — bit-identical across engines and
    partitionings.  A double→decimal cast of the raw score is NOT exact:
    engines round half-way doubles differently (caught at sf0.1).

    Empty/whitespace-only docs (token_count = 0) are a real corpus shape
    and both engines ERROR on the bare division (Spark ANSI, DuckDB
    integer //).  Guards, mirrored verbatim in SQL_FEATURES_CTE below:
    ratios go NULL (nullif divisor), quality_milli scores 0 — the worst
    score, which is the right ranking for an empty document.
    """
    d = docs.withColumn("w", F.expr(H.tokens("text", "spark")))
    d = d.withColumn("token_count", F.size("w").cast("long"))
    d = d.withColumn(
        "distinct_ratio",
        F.size(F.array_distinct("w")).cast("double")
        / F.expr("nullif(token_count, 0L)"),
    )
    d = d.withColumn(
        "stop_ratio",
        F.size(F.expr(f"filter(w, t -> {_stop_pred('t')})")).cast("double")
        / F.expr("nullif(token_count, 0L)"),
    )
    d = d.withColumn(
        "quality_milli",
        F.expr(
            "4 * least(token_count, 100L) "
            "+ (300 * size(array_distinct(w))) div greatest(token_count, 1L) "
            f"+ (300 * (token_count - size(filter(w, t -> {_stop_pred('t')})))) "
            "div greatest(token_count, 1L)"
        ).cast("long"),
    )
    # single integer/1000 division: correctly-rounded IEEE op, engine-identical
    return d.withColumn("quality", F.col("quality_milli") / F.lit(1000.0))


# --- language-ID --------------------------------------------------------
# Heuristic lexicon classifier: score each language by function-word hits,
# argmax with a fixed priority tie-break.  Real language-ID swaps these stub
# lexicons for char-n-gram profiles (the synthetic corpus shares one English
# vocabulary across lang labels, so the lexicons here are calibration stubs);
# the operator shape — per-token scoring folded JVM-side, no UDF — is the
# 100 TB-real part.
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "und", "stream", "row"),
    "fr": ("le", "la", "et", "query", "scan"),
    "es": ("el", "los", "y", "value", "join"),
    "zh": ("de5", "shi4", "table", "group"),
}
_LANG_ORDER = tuple(LANG_LEXICONS)  # priority order for ties


def _lex_pred(var: str, words: tuple[str, ...]) -> str:
    return " OR ".join(f"{var} = '{w}'" for w in words)


def lang_scores_sql(dialect: str) -> list[str]:
    """One ``<filtered token count> AS score_<lang>`` expression per language,
    over a tokens-array column ``w`` (counts with multiplicity — exact in
    both engines, unlike set-intersection)."""
    size_fn, filt = ("size", "filter") if dialect == "spark" else ("len", "list_filter")
    return [
        f"CAST({size_fn}({filt}(w, t -> {_lex_pred('t', ws)})) AS BIGINT) AS score_{lang}"
        for lang, ws in LANG_LEXICONS.items()
    ]


def predicted_lang_sql() -> str:
    """Dialect-neutral argmax CASE chain over the score columns; earlier
    languages in _LANG_ORDER win ties."""
    branches = []
    langs = list(_LANG_ORDER)
    for i, lang in enumerate(langs[:-1]):
        rest = langs[i + 1 :]
        cond = " AND ".join(f"score_{lang} >= score_{r}" for r in rest)
        branches.append(f"WHEN {cond} THEN '{lang}'")
    return "CASE " + " ".join(branches) + f" ELSE '{langs[-1]}' END"


def with_predicted_lang(docs: DataFrame) -> DataFrame:
    """documents + score_<lang> columns + ``predicted_lang``."""
    d = docs.withColumn("w", F.expr(H.tokens("text", "spark")))
    for expr in lang_scores_sql("spark"):
        body, alias = expr.rsplit(" AS ", 1)
        d = d.withColumn(alias, F.expr(body))
    return d.withColumn("predicted_lang", F.expr(predicted_lang_sql()))


SQL_FEATURES_CTE = f"""
feats AS (
  SELECT *,
         CAST(len(w) AS BIGINT) AS token_count,
         CAST(len(list_distinct(w)) AS BIGINT) AS distinct_tokens,
         CAST(len(list_filter(w, t -> {_stop_pred('t')})) AS BIGINT) AS stop_tokens
  FROM (SELECT *, list_filter(string_split(text, ' '), t -> t <> '') AS w FROM documents)
),
scored AS (
  SELECT *,
         CAST(4 * least(token_count, 100)
              + (300 * distinct_tokens) // greatest(token_count, 1)
              + (300 * (token_count - stop_tokens)) // greatest(token_count, 1) AS BIGINT) AS quality_milli,
         CAST(4 * least(token_count, 100)
              + (300 * distinct_tokens) // greatest(token_count, 1)
              + (300 * (token_count - stop_tokens)) // greatest(token_count, 1) AS BIGINT) / 1000.0 AS quality
  FROM feats
)
"""
