"""Engine-vs-oracle parity on DEGENERATE corpora.

tests/test_empty_inputs.py proves queries don't *crash* on empty / 1-row
inputs; this file proves the four divergence risks the round-3 review named
stay CLOSED by checking full DuckDB parity on corpora crafted to fire each
one.  The standard corpora cannot reach these states (all-ASCII text, no
zero-norm embeddings, tf « 3000), so without these rows a regression would
stay parity-green until a corpus change detonated it in the driver.

1. zero-norm embedding  → cosine 0/0 NaN, NaN ORDER differs across engines
   (guarded: cosine := -1 when either norm is 0, operators/clustering.py).
2. non-ASCII text       → byte-vs-codepoint dims in image_resize_stats
   (guarded: oracle uses hex(encode(text)) byte semantics).
3. tf ≳ 3000 rare term  → Σw² int64 overflow in sparse TF-IDF
   (guarded: DECIMAL(38,0) / HUGEINT exact accumulation).
4. single-row input     → percent_rank 0/0
   (guarded: GREATEST(n-1, 1) in both engines).
"""

from __future__ import annotations

import shutil

import pytest

from pulsar_pekko_streams_example_spark.plans.registry import REGISTRY, all_queries

from tests.conftest import SF_SMOKE
from tests.parity import compare

all_queries()  # force registration

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def degenerate_sf(spark, tmp_path_factory):
    """sf0.001 with documents / embeddings / orders replaced by rows that
    fire every degenerate condition at once."""
    base = tmp_path_factory.mktemp("degenerate_sf")
    for t in TABLES:
        if t not in ("documents", "embeddings", "orders"):
            shutil.copyfile(f"{SF_SMOKE}/{t}.parquet", str(base / f"{t}.parquet"))

    docs = [
        # non-ASCII: first code points are multi-byte in UTF-8, so byte- and
        # codepoint-indexed dim derivations disagree unless both sides use bytes
        (1, "héllo wörld éü text corpus", "de", "web", 26),
        (2, "日本語のテキスト sample", "ja", "web", 15),
        (3, "\U0001f600 emoji leads the doc", "en", "web", 21),
        # tf-overflow probe: one rare term repeated 3500x in a single doc;
        # w = tf * idf_milli can reach ~3.5e9 and w*w ~1.2e19 > int64 max
        (4, " ".join(["rareterm"] * 3500), "en", "synthetic", 8 * 3500 + 3499),
        (5, "rareterm appears here too so df is 2 and the idf stays finite", "en", "synthetic", 60),
        (6, "plain ascii control document", "en", "web", 28),
    ]
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(base / "documents.parquet"))

    dim = 16
    embs = [
        (1, [0.0] * dim, 0),                                  # zero-norm vector
        (2, [1.0] + [0.0] * (dim - 1), 0),
        (3, [0.0, 1.0] + [0.0] * (dim - 2), 1),
        (4, [float(i % 3 - 1) for i in range(dim)], 1),
        (5, [0.5] * dim, 2),
        (6, [-1.0] * dim, 2),
    ]
    spark.createDataFrame(
        embs, "vec_id bigint, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(base / "embeddings.parquet"))

    # single-row orders: the percent_rank divisor-degeneracy corner
    spark.createDataFrame(
        [(1, 1, "O", 100.0, "1995-01-01 00:00:00", "1-URGENT")],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate string, o_orderpriority string",
    ).selectExpr(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "CAST(o_orderdate AS TIMESTAMP) AS o_orderdate", "o_orderpriority",
    ).write.mode("overwrite").parquet(str(base / "orders.parquet"))
    return str(base)


@pytest.fixture(scope="module")
def degenerate_duck(degenerate_sf):
    import duckdb

    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{degenerate_sf}/{t}.parquet"
        # Spark writes a DIRECTORY of part files; the copied tables are files
        pattern = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pattern}')")
    yield con
    con.close()


# query → the degenerate condition it pins
PINNED = [
    ("kmeans_cluster_profile", "zero-norm embedding (NaN-cosine guard)"),
    ("semantic_dedup_probe", "zero-norm embedding in the probe path"),
    ("image_resize_stats", "non-ASCII byte-vs-codepoint dims"),
    ("tfidf_cosine_pairs", "tf~3500 rare term (int64 Σw² overflow)"),
    ("priority_price_rank_approx", "single-row percent_rank divisor"),
]


@pytest.mark.parametrize("name,why", PINNED, ids=[n for n, _ in PINNED])
def test_degenerate_parity(name, why, spark, degenerate_sf, degenerate_duck):
    spec = REGISTRY[name]
    assert spec.oracle is not None, f"{name} lost its oracle; this pin needs one"
    df = spec.build(spark, degenerate_sf)
    problems = compare(df, degenerate_duck.sql(spec.oracle))
    assert not problems, f"{name} [{why}]: " + "; ".join(problems)


# ---------------------------------------------------------------------------
# Adversarial TEXT shapes (round-5 sweep findings)
#
# A full-registry probe over a documents table of pathological texts found
# two real defects the standard corpora cannot reach:
#   * token_count = 0 (empty / whitespace-only / punctuation-only docs):
#     the integer quality formula divided by zero — Spark ANSI and DuckDB
#     both ERROR the whole scan (guard: nullif/greatest, textstats.py).
#   * one multi-hundred-KB document: chunk_shared_pairs' fold-with-append
#     chunker re-copied O(doc) state per token — 187 s for ONE 200k-char doc
#     (fix: position-based chunk starts, linear in the doc).
# At 100 TB both shapes are certainties, so they stay pinned here.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def adversarial_text_sf(spark, tmp_path_factory):
    """sf0.001 with documents replaced by pathological text shapes."""
    base = tmp_path_factory.mktemp("adversarial_text_sf")
    for t in TABLES:
        if t != "documents":
            shutil.copyfile(f"{SF_SMOKE}/{t}.parquet", str(base / f"{t}.parquet"))

    big = " ".join(f"w{i}" for i in range(4000))  # ~1/16 tokens are chunk boundaries
    docs = [
        (1, "", "en", "web", 0),                      # empty: token_count = 0
        (2, "   \t\n  ", "en", "web", 7),             # whitespace-only: token_count = 0
        (3, ".,;:!?", "en", "web", 6),                # punctuation-only
        (4, "x", "en", "synthetic", 1),               # single 1-char token
        (5, big, "en", "synthetic", len(big)),        # one huge many-chunk doc
        (6, "a normal control document with stop words the and of", "en", "web", 53),
    ]
    spark.createDataFrame(
        docs, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(str(base / "documents.parquet"))
    return str(base)


@pytest.fixture(scope="module")
def adversarial_text_duck(adversarial_text_sf):
    import os

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        path = f"{adversarial_text_sf}/{t}.parquet"
        pattern = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pattern}')")
    yield con
    con.close()


PINNED_TEXT = [
    ("quality_histogram", "empty-doc quality: div-by-zero guard"),
    ("lang_quality_stats", "empty-doc ratios go NULL, not ERROR"),
    ("corpus_curation_funnel", "empty-doc quality in the funnel"),
    ("quality_weighted_sample_counts", "empty-doc quality as a weight"),
    ("pipeline_funnel_counts", "empty-doc quality, inline formula twin"),
    ("chunk_shared_pairs", "huge doc: linear position-based chunker"),
    ("context_chunking_stats", "huge doc: chunk-count window twin"),
]


@pytest.mark.parametrize("name,why", PINNED_TEXT, ids=[n for n, _ in PINNED_TEXT])
def test_adversarial_text_parity(
    name, why, spark, adversarial_text_sf, adversarial_text_duck
):
    spec = REGISTRY[name]
    assert spec.oracle is not None, f"{name} lost its oracle; this pin needs one"
    df = spec.build(spark, adversarial_text_sf)
    problems = compare(df, adversarial_text_duck.sql(spec.oracle))
    assert not problems, f"{name} [{why}]: " + "; ".join(problems)
