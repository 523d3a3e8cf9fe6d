"""Property-based checks (hypothesis): the temporal operators against
brute-force Python references on adversarial small inputs — tie timestamps,
singleton keys, empty sides, duplicate values — the corners the fixed test
data can't be trusted to contain."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pulsar_pekko_streams_example_spark.operators import temporal

BASE = dt.datetime(2024, 1, 1)

events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # user/key
        st.integers(min_value=0, max_value=40),     # seconds offset
        st.booleans(),                              # is_click (else error)
        st.integers(min_value=0, max_value=99),     # value
    ),
    min_size=1,
    max_size=14,
)


def _df(spark, rows):
    return spark.createDataFrame(
        [
            (i, k, BASE + dt.timedelta(seconds=s), bool(c), float(v))
            for i, (k, s, c, v) in enumerate(rows)
        ],
        "event_id long, user_id long, ts timestamp, is_click boolean, value double",
    )


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=events)
def test_asof_join_matches_bruteforce(spark, rows):
    df = _df(spark, rows)
    err = df.filter("not is_click").select("event_id", "user_id", "ts")
    clk = df.filter("is_click").select("user_id", "ts", "value")
    got = {
        r.event_id: r.asof_value
        for r in temporal.asof_join_last(err, clk, "user_id", "ts", ["value"]).collect()
    }

    clicks = [(k, s, v) for (k, s, c, v) in rows if c]
    for i, (k, s, c, v) in enumerate(rows):
        if c:
            continue
        eligible = [(cs, cv) for (ck, cs, cv) in clicks if ck == k and cs <= s]
        expected = float(max(eligible)[1]) if eligible else None
        # at tied timestamps any of the tied clicks is a valid as-of answer
        tied = {float(cv) for (cs, cv) in eligible if cs == max(eligible)[0]} if eligible else {None}
        assert got[i] in tied, (i, got[i], expected, rows)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=events)
def test_sessionize_matches_bruteforce(spark, rows):
    gap = 10
    df = _df(spark, rows)
    out = temporal.sessionize(df, "user_id", "ts", gap_s=gap).collect()
    got = {}
    for r in out:
        got.setdefault(r.user_id, []).append((r.ts, r.event_id, r.session_id))

    per_key: dict = {}
    for i, (k, s, c, v) in enumerate(rows):
        per_key.setdefault(k, []).append((s, i))
    for k, items in per_key.items():
        items.sort()
        sess, last = 0, None
        expected = {}
        for s, i in items:
            if last is None or s - last > gap:
                sess += 1
            expected[i] = sess
            last = s
        actual = {eid: sid for (_, eid, sid) in got[k]}
        assert actual == expected, (k, actual, expected, rows)


# --- quantile sketch: bin-width error bound ---------------------------------

qsk_values = st.lists(
    st.floats(min_value=0.0, max_value=1000.0, allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=30,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(values=qsk_values)
def test_quantile_sketch_error_bounded_by_bin_width(spark, values):
    """For any in-range input, the sketch's estimate must bracket the true
    quantile from above within one bin width: x_q < est <= x_q + W."""
    import math

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from pulsar_pekko_streams_example_spark.plans.sketch_queries import (
        QSK_BINS,
        QSK_WIDTH,
        _qsk_threshold,
    )

    df = spark.createDataFrame([(v,) for v in values], "value double")
    binned = df.groupBy(
        F.least(F.lit(QSK_BINS - 1), F.floor(F.col("value") / QSK_WIDTH).cast("long")).alias("bin")
    ).agg(F.count(F.lit(1)).alias("c"))
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = binned.select("bin", F.sum("c").over(wc).alias("cum"), F.lit(len(values)).alias("n"))
    for pct in (50, 95, 99):
        est = cum.filter(
            F.col("cum") >= F.expr(_qsk_threshold(pct, "spark"))
        ).agg(F.min((F.col("bin") + 1) * QSK_WIDTH).alias("e")).collect()[0].e
        true_q = sorted(values)[math.ceil(pct * len(values) / 100) - 1]
        assert true_q < est <= true_q + QSK_WIDTH, (pct, true_q, est, sorted(values))


# --- CMS / Bloom: one-sided structural guarantees ---------------------------

# Keys span the FULL int64 domain (round-6 totality fix: the affine hashes
# reduce mod P before multiplying, so boundary/negative ids neither overflow
# nor produce negative buckets), mixed with a dense small range so hash
# collisions still occur within test-sized inputs.
_any_int64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
key_lists = st.lists(
    st.one_of(st.integers(min_value=-5, max_value=5), _any_int64),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(keys=key_lists)
def test_cms_never_underestimates(spark, keys):
    """Count-min is ONE-SIDED by construction: est >= exact for every key,
    on any input (collisions only inflate).  The registry oracle replicates
    the same expressions, so only a property can falsify the structure."""
    from pyspark.sql import functions as F

    from pulsar_pekko_streams_example_spark.functions import sketches as SK

    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    est = SK.cms_estimates(df, "user_id")
    exact = df.groupBy(F.col("user_id").alias("k")).agg(F.count(F.lit(1)).alias("exact"))
    bad = est.join(exact, ["k"]).filter(F.col("est") < F.col("exact")).collect()
    assert not bad, bad


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    members=st.sets(_any_int64, min_size=1, max_size=25),
    extras=st.sets(_any_int64, max_size=25),
)
def test_bloom_has_no_false_negatives(spark, members, extras):
    """Bloom filters may false-positive, never false-negative: every
    inserted key must probe positive on any input — including boundary and
    negative int64 keys (round-6 canonical-hash totality)."""
    from pyspark.sql import functions as F

    from pulsar_pekko_streams_example_spark.functions import sketches as SK

    extras = extras - members
    mdf = spark.createDataFrame([(k,) for k in members], "ck long")
    cand = spark.createDataFrame([(k,) for k in members | extras], "ck long")
    bits = SK.bloom_build_bits(mdf, "ck")
    flags = SK.bloom_probe(cand, "ck", bits)
    missed = flags.filter(F.col("k").isin(list(members)) & ~F.col("in_bloom")).collect()
    assert not missed, missed


# --- MinHash-LSH: exact duplicates are ALWAYS candidates --------------------

words = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
    min_size=3,
    max_size=12,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(text_words=words, other_words=words)
def test_minhash_lsh_always_finds_exact_duplicates(spark, text_words, other_words):
    """LSH recall < 100% is the contract for NEAR-duplicates, but identical
    shingle sets give identical signatures, hence identical bands, hence a
    guaranteed candidate pair with jaccard exactly 1.0 — on any input."""
    from pyspark.sql import functions as F

    from pulsar_pekko_streams_example_spark.operators import dedup

    text = " ".join(text_words)
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, " ".join(other_words))],
        "doc_id long, text string",
    )
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.99).collect()
    dup = [r for r in pairs if r.doc_a == 1 and r.doc_b == 2]
    assert len(dup) == 1 and dup[0].jaccard == 1.0, pairs


# --- RANGE frame: tie-day peers always aggregate together -------------------

orders_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),   # customer
        st.integers(min_value=0, max_value=12),  # day
        st.integers(min_value=1, max_value=50),  # price (integer-valued)
    ),
    min_size=1,
    max_size=16,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=orders_strategy)
def test_range_frame_matches_bruteforce(spark, rows):
    """RANGE BETWEEN 6 PRECEDING AND CURRENT ROW over a non-unique day key:
    every same-day peer row must be included for every row of that day —
    the tie-safety a ROWS frame cannot give.  Checked against a brute-force
    Python reference on adversarial duplicate-day inputs."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [(i, c, d, float(p)) for i, (c, d, p) in enumerate(rows)],
        "okey long, cust long, day long, price double",
    )
    w = Window.partitionBy("cust").orderBy("day").rangeBetween(-6, 0)
    got = {
        r.okey: (r.rev, r.cnt)
        for r in df.select(
            "okey",
            F.sum(F.col("price").cast("decimal(38,6)")).over(w).cast("double").alias("rev"),
            F.count(F.lit(1)).over(w).alias("cnt"),
        ).collect()
    }
    for i, (c, d, p) in enumerate(rows):
        peers = [(cc, dd, pp) for (cc, dd, pp) in rows if cc == c and d - 6 <= dd <= d]
        assert got[i] == (float(sum(pp for _, _, pp in peers)), len(peers)), (i, rows)


# --- Frequent-shingle cap: a hot shingle never drives O(n²) candidates ------


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(fillers=st.lists(words, min_size=4, max_size=8))
def test_jaccard_df_cap_bounds_hot_shingle_fanout(spark, fillers):
    """One shingle shared by EVERY doc (a stop-phrase) must not make every
    doc pair a candidate: with df cap < corpus size, the hot shingles leave
    the universe and pairs arise only from genuinely shared rare shingles.
    Exact duplicates must still be found (their rare shingles also match)."""
    from pulsar_pekko_streams_example_spark.operators import dedup

    stop = "in the of and"  # shingles here appear in EVERY doc => df = n_docs
    rows = [(i, f"{stop} u{i}a u{i}b u{i}c u{i}d") for i in range(len(fillers))]
    # two exact duplicates built from filler words (plus the stop phrase)
    dup_text = f"{stop} {' '.join(fillers[0])}"
    n = len(rows)
    rows += [(n, dup_text), (n + 1, dup_text)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = dedup.jaccard_pairs(docs, threshold=0.05, max_df=2).collect()
    # the hot shingles (df = n+2 > 2) are dropped: the only pairs left share
    # RARE shingles — at minimum the exact-duplicate pair at jaccard 1.0
    dup = [r for r in capped if (r.doc_a, r.doc_b) == (n, n + 1)]
    assert len(dup) == 1 and dup[0].jaccard == 1.0, capped
    # no pair built purely from the stop phrase survives: every surviving
    # pair must share a shingle with df <= 2, i.e. involve the dup pair or
    # coincidentally-equal filler shingles — never ALL C(n,2) pairs
    uncapped = dedup.jaccard_pairs(docs, threshold=0.05, max_df=None).collect()
    assert len(uncapped) == (n + 2) * (n + 1) // 2  # hot shingle => all pairs
    assert len(capped) < len(uncapped)


def test_cap_postings_drops_exactly_hot_shingles(spark):
    from pulsar_pekko_streams_example_spark.operators import dedup

    posting = spark.createDataFrame(
        [(d, "hot") for d in range(10)] + [(d, f"rare{d}") for d in range(10)],
        "doc_id long, s string",
    )
    kept = {(r.doc_id, r.s) for r in dedup.cap_postings(posting, 3).collect()}
    assert kept == {(d, f"rare{d}") for d in range(10)}


def test_kmeans_assign_invariant_under_repartition(spark):
    """Assignment is a map-side pass whose result must not depend on how the
    corpus is partitioned: 1-partition and 13-partition runs agree exactly
    (cosines included) — the bit-stability claim behind the 100 TB posture."""
    from pulsar_pekko_streams_example_spark.operators import clustering
    from pulsar_pekko_streams_example_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cent = clustering.seed_centroids(emb, 8)
    one = clustering.assign(emb.coalesce(1), cent)
    many = clustering.assign(emb.repartition(13), cent)
    rows_one = {(r.vec_id, r.cluster_id, r.cosine) for r in one.collect()}
    rows_many = {(r.vec_id, r.cluster_id, r.cosine) for r in many.collect()}
    assert rows_one == rows_many


def test_pagerank_invariant_under_repartition(spark):
    """Fixed-point PageRank must be bit-identical regardless of edge
    partitioning — integer sums are associative, so any shuffle layout
    produces the same rank_atto values."""
    from pulsar_pekko_streams_example_spark.operators import graph

    edges = spark.createDataFrame(
        [(i, (i * 7 + 3) % 23) for i in range(40) if i != (i * 7 + 3) % 23],
        "src long, dst long",
    )
    a = {(r.node, r.rank_atto) for r in graph.pagerank(edges.coalesce(1), iters=3).collect()}
    b = {(r.node, r.rank_atto) for r in graph.pagerank(edges.repartition(11), iters=3).collect()}
    assert a == b


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # user
            st.integers(min_value=0, max_value=30),  # seconds offset
            st.sampled_from(["view", "click", "purchase"]),
        ),
        min_size=1,
        max_size=16,
    )
)
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_transition_matrix_matches_bruteforce(spark, rows):
    """event_transition_matrix vs a brute-force Python reference on
    adversarial small inputs — tie timestamps resolved by event_id, single
    users, single-event users (no transitions)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [
            (i, BASE + dt.timedelta(seconds=s), u, t)
            for i, (u, s, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = df.select(
        "event_type", F.lag("event_type").over(w).alias("from_type")
    ).filter(F.col("from_type").isNotNull())
    got = {
        (r.from_type, r.to_type): r.n
        for r in seq.groupBy(
            "from_type", F.col("event_type").alias("to_type")
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # brute force
    per_user: dict[int, list] = {}
    for i, (u, s, t) in enumerate(rows):
        per_user.setdefault(u, []).append((BASE + dt.timedelta(seconds=s), i, t))
    want: dict[tuple, int] = {}
    for evs in per_user.values():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want


@given(st.lists(st.text(alphabet="ab ", max_size=6), min_size=2, max_size=6))
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_levenshtein_matches_python_dp(spark, words):
    """F.levenshtein (the fuzzy_name_pairs verify) vs a Python DP reference —
    empty strings, repeated chars, whitespace."""
    from pyspark.sql import functions as F

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[len(b)]

    pairs = [(a, b) for a in words for b in words]
    df = spark.createDataFrame(pairs, "a string, b string").select(
        "a", "b", F.levenshtein("a", "b").alias("d")
    )
    for r in df.collect():
        assert r.d == lev(r.a, r.b), (r.a, r.b)


def test_triangles_by_degree_matches_bruteforce_on_hub_graph(spark):
    """Degree-oriented triangle listing on an adversarial hub graph (one
    node connected to everything — the shape that blows up id-orientation)
    must produce exactly the brute-force triangle set, once each, a<b<c."""
    from itertools import combinations

    from pulsar_pekko_streams_example_spark.operators import graph

    # hub 0 — all spokes; plus a chain among spokes and two cliques
    pairs = {(0, i) for i in range(1, 20)}
    pairs |= {(i, i + 1) for i in range(1, 19)}
    pairs |= set(combinations([3, 7, 11, 15], 2))
    pairs |= set(combinations([2, 4, 6], 2))
    adj = set(pairs) | {(b, a) for a, b in pairs}
    expected = {
        (a, b, c)
        for a, b, c in combinations(sorted({n for p in pairs for n in p}), 3)
        if (a, b) in adj and (b, c) in adj and (a, c) in adj
    }

    edges = spark.createDataFrame(sorted(pairs), "src long, dst long")
    rows = graph.triangles_by_degree(edges.repartition(7)).collect()
    got = [(r.a, r.b, r.c) for r in rows]
    assert len(got) == len(set(got)), "each triangle must be listed exactly once"
    assert set(got) == expected


def test_triangles_by_degree_orientation_bounds_hub_fanout(spark):
    """On the star graph the hub's oriented OUT-degree must be 0 — every
    spoke has lower (degree, id) than the hub, so no wedge forms at the hub
    and the wedge join's fan-out is bounded by spoke degrees."""
    from pulsar_pekko_streams_example_spark.operators import graph

    edges = spark.createDataFrame(
        [(99, i) for i in range(30)], "src long, dst long"
    )
    # star graph has no triangles at all
    assert graph.triangles_by_degree(edges).count() == 0


# ---------------------------------------------------------------------------
# k-core peel vs brute force on adversarial small graphs
# ---------------------------------------------------------------------------
edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=16,
    unique=True,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(raw=edge_lists)
def test_kcore_peel_matches_bruteforce(spark, raw):
    from pulsar_pekko_streams_example_spark.operators.graph import kcore_peel

    # canonicalize to one row per undirected pair (the operator's contract)
    pairs = sorted({(min(a, b), max(a, b)) for a, b in raw})
    k, rounds = 2, 3

    def brute():
        cur = set(pairs)
        prof = []
        for r in range(rounds + 1):
            deg: dict[int, int] = {}
            for a, b in cur:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            prof.append((r, len(deg), len(cur)))
            keep = {n for n, d in deg.items() if d >= k}
            cur = {(a, b) for a, b in cur if a in keep and b in keep}
        return prof

    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = sorted(
        tuple(r) for r in kcore_peel(edges, k=k, rounds=rounds).collect()
    )
    assert got == brute()


# ---------------------------------------------------------------------------
# Context-chunking closed forms vs an actual chunker, over every small n
# ---------------------------------------------------------------------------
def test_chunk_formulas_match_actual_chunking():
    """The registered SQL expressions (evaluated by DuckDB over a range
    table) must agree with literally materializing window/stride chunks,
    for every token count 0..3*W — including the n=0, n=W, and
    exact-multiple boundaries the corpus never hits."""
    import duckdb

    from pulsar_pekko_streams_example_spark.plans.mldata_queries import (
        CHUNK_S,
        CHUNK_W,
        _chunk_exprs,
    )

    ex = _chunk_exprs("//")
    rows = duckdb.sql(
        f"SELECT n, {ex['n_chunks']} AS c, {ex['overlap']} AS o, {ex['pad']} AS p "
        f"FROM (SELECT range AS n FROM range(0, {3 * CHUNK_W + 1}))"
    ).fetchall()
    for n, c, o, p in rows:
        # materialize the chunks: starts at 0, S, 2S, ... until a chunk
        # covers the tail
        starts = []
        s = 0
        if n > 0:
            while True:
                starts.append(s)
                if s + CHUNK_W >= n:
                    break
                s += CHUNK_S
        assert c == len(starts), (n, c, starts)
        covered = sum(min(st_ + CHUNK_W, n) - st_ for st_ in starts)
        overlap = sum(
            max(0, (starts[i] + CHUNK_W) - starts[i + 1])
            for i in range(len(starts) - 1)
        )
        # formula overlap counts full W-S per straddle boundary
        if n > CHUNK_W:
            assert o == (len(starts) - 1) * (CHUNK_W - CHUNK_S), (n, o)
        else:
            assert o == 0
        # pad = unused slots in the final chunk
        if n > 0:
            assert p == CHUNK_W - (n - (len(starts) - 1) * CHUNK_S), (n, p)
        else:
            assert p == 0
        assert overlap == o or n <= CHUNK_W, (n, overlap, o)


# ---------------------------------------------------------------------------
# r7-hardened TOTAL envelope helpers: the oracle blind spot is a shared-
# dialect bug (identical CASE text wrong in both engines), so each helper
# gets a property against a PYTHON reference on hypothesis doubles including
# NaN/±Inf/1e300 — totality (no abort), envelope semantics, and cross-engine
# agreement in one pass.
# ---------------------------------------------------------------------------

_hostile_doubles = st.one_of(
    st.sampled_from(
        [
            float("nan"),
            float("inf"),
            float("-inf"),
            1e300,
            -1e300,
            1e32,
            -1e32,
            1e15,
            1e12,
            -1e12,
            1e9,
            -1e9,
            1e9 + 2.0,
            -(1e9 + 2.0),
            1024.0,
            1023.0,
            -0.0,
            0.0,
            1e-300,
        ]
    ),
    st.floats(allow_nan=True, allow_infinity=True),
)


def _eval_envelope_both(spark, expr: str, colname: str, values: list[float]):
    """Evaluate the SAME expression text per-row in Spark and DuckDB; any
    abort in either engine fails the property (totality)."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], f"i long, {colname} double"
    )
    got_s = {r.i: r.out for r in df.select("i", F.expr(expr).alias("out")).collect()}
    con = duckdb.connect()
    try:
        con.register("t", pd.DataFrame({"i": range(len(values)), colname: values}))
        got_d = dict(con.sql(f"SELECT i, {expr} AS out FROM t").fetchall())
    finally:
        con.close()
    return got_s, got_d


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(values=st.lists(_hostile_doubles, min_size=1, max_size=20))
def test_recon_micros_total_envelope(spark, values):
    """_recon_micros: NaN/NULL -> NULL, |x| > 1e9 clamps to ±1e15 micros,
    else floor(x*1e6) — never aborts, never leaves ±1e15, identical in both
    engines and to the double-arithmetic Python reference."""
    import math

    from pulsar_pekko_streams_example_spark.plans.analytic_queries import (
        _recon_micros,
    )

    got_s, got_d = _eval_envelope_both(spark, _recon_micros("x"), "x", values)
    for i, v in enumerate(values):
        if math.isnan(v):
            want = None
        elif v > 1e9:
            want = 10**15
        elif v < -1e9:
            want = -(10**15)
        else:
            want = math.floor(v * 1e6)
        assert got_s[i] == got_d[i] == want, (i, v, got_s[i], got_d[i], want)
        if want is not None:
            assert -(10**15) <= want <= 10**15


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(values=st.lists(_hostile_doubles, min_size=1, max_size=20))
def test_profile_cents_total_envelope(spark, values):
    """_PROFILE_CENTS: NaN/NULL -> NULL, |x| > 1e12 clamps to ±1e14 cents,
    else floor(x*100) — total on any double, engine-identical."""
    import math

    from pulsar_pekko_streams_example_spark.plans.diagnostic_queries import (
        _PROFILE_CENTS,
    )

    got_s, got_d = _eval_envelope_both(spark, _PROFILE_CENTS, "o_totalprice", values)
    for i, v in enumerate(values):
        if math.isnan(v):
            want = None
        elif v > 1e12:
            want = 10**14
        elif v < -1e12:
            want = -(10**14)
        else:
            want = math.floor(v * 100.0)
        assert got_s[i] == got_d[i] == want, (i, v, got_s[i], got_d[i], want)
        if want is not None:
            assert -(10**14) <= want <= 10**14


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    values=st.lists(
        st.one_of(
            st.sampled_from(
                [float("inf"), float("-inf"), 1e300, -1e300, 1023.0, 1024.0, -5.0, 0.0]
            ),
            st.floats(allow_nan=False, allow_infinity=True),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_qsk_bin_total_envelope(spark, values):
    """_qsk_bin: every non-NaN double (the caller filters NaN/NULL) lands in
    a bin 0..255 — negatives and -Inf clamp to 0, >= 1023 and +Inf saturate
    to 255 — in both dialects, matching the clamp-then-floor reference."""
    import math

    from pulsar_pekko_streams_example_spark.plans.sketch_queries import (
        QSK_BINS,
        QSK_WIDTH,
        _qsk_bin,
    )

    got_s, _ = _eval_envelope_both(spark, _qsk_bin("spark"), "value", values)
    _, got_d = _eval_envelope_both(spark, _qsk_bin("duckdb"), "value", values)
    hi = float(QSK_BINS * QSK_WIDTH - 1)
    for i, v in enumerate(values):
        want = math.floor(min(hi, max(0.0, v)) / QSK_WIDTH)
        assert got_s[i] == got_d[i] == want, (i, v, got_s[i], got_d[i], want)
        assert 0 <= want <= QSK_BINS - 1


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(
                st.sampled_from(
                    [float("nan"), float("inf"), float("-inf"), 1e300, 1e32, -1e32]
                ),
                st.floats(
                    allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
                ),
            ),
            st.one_of(
                st.sampled_from([float("nan"), float("inf"), float("-inf"), 1e300]),
                st.floats(
                    allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
                ),
            ),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_portable_revenue_summand_total_and_engine_identical(spark, rows):
    """The sql_api_monthly_returns summand — the ONE text both engines run —
    must be total (DuckDB's plain CAST aborts on -Inf -> DECIMAL; TRY_CAST
    still errors on NaN/Inf there) and yield NULL exactly when the revenue
    product is NaN/±Inf or |product| >= 1e32, the DECIMAL(38,6) envelope.
    Finite magnitudes here stay <= ~1e12, so the aggregate variant can never
    overflow the decimal sum — the property pins the per-row contract."""
    import math
    from decimal import Decimal

    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from pulsar_pekko_streams_example_spark.plans.tpch_queries import (
        _PORTABLE_REVENUE_SUMMAND,
        _PORTABLE_SQL,
    )

    assert _PORTABLE_REVENUE_SUMMAND in _PORTABLE_SQL  # tested text IS the shipped text

    df = spark.createDataFrame(
        [(i, p, d) for i, (p, d) in enumerate(rows)],
        "i long, l_extendedprice double, l_discount double",
    )
    got_s = {
        r.i: r.out
        for r in df.select(
            "i", F.expr(_PORTABLE_REVENUE_SUMMAND).alias("out")
        ).collect()
    }
    con = duckdb.connect()
    try:
        con.register(
            "t",
            pd.DataFrame(
                {
                    "i": range(len(rows)),
                    "l_extendedprice": [p for p, _ in rows],
                    "l_discount": [d for _, d in rows],
                }
            ),
        )
        got_d = dict(
            con.sql(f"SELECT i, {_PORTABLE_REVENUE_SUMMAND} AS out FROM t").fetchall()
        )
    finally:
        con.close()
    for i, (p, d) in enumerate(rows):
        prod = p * (1.0 - d)
        if math.isnan(prod) or math.isinf(prod) or abs(prod) >= 1e32:
            assert got_s[i] is None and got_d[i] is None, (i, p, d, got_s[i], got_d[i])
        else:
            assert got_s[i] is not None and got_d[i] is not None, (i, p, d)
            # NULL-pattern is strict; values allow one quantum at the 6th
            # decimal PLUS ~1 ULP of value*10^6: Spark converts double ->
            # DECIMAL exactly (BigDecimal), DuckDB multiplies by 10^scale in
            # double precision first, so beyond value*1e6 ~ 2^53 the engines
            # differ by ULP(value*1e6)/1e6 (relative ~1e-16; found by this
            # property on prod = -18014410882.90625 exactly).  Corpus prices
            # are 2-decimal and ~1e4, far inside the exact range.
            tol = max(Decimal("0.000001"), abs(Decimal(repr(prod))) * Decimal("1e-15"))
            assert abs(Decimal(got_s[i]) - Decimal(got_d[i])) <= tol, (
                i, p, d, got_s[i], got_d[i],
            )
            assert abs(float(got_s[i]) - prod) <= max(1e-6, abs(prod) * 1e-12), (
                i, p, d, got_s[i], prod,
            )


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=24),
            st.integers(min_value=0, max_value=24),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_connected_components_matches_union_find(spark, pairs):
    """Pointer-jumping CC must agree with a plain union-find on arbitrary
    random graphs: same partition of nodes AND the min-id canonical label
    per component (self-loops and duplicate/reversed edges included)."""
    from pulsar_pekko_streams_example_spark.operators import graph

    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        (r.node, r.component)
        for r in graph.connected_components(edges.repartition(5)).collect()
    }

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {(n, find(n)) for n in parent}
    assert got == want


# ---------------------------------------------------------------------------
# Control-plane convergence (round-9 sweep): for ANY interleaving of desired
# sets with factory/stop failure injection, reconciliation never raises, the
# registry only ever holds workloads that were desired at their start tick
# (or are awaiting a stop retry), and one clean tick converges exactly.
# ---------------------------------------------------------------------------

tick_plan = st.lists(
    st.tuples(
        st.sets(st.sampled_from(["a", "b", "c", "d"]), max_size=4),  # desired
        st.sets(st.sampled_from(["a", "b", "c", "d"]), max_size=2),  # start fails
        st.sets(st.sampled_from(["a", "b", "c", "d"]), max_size=2),  # stop fails
    ),
    min_size=1,
    max_size=8,
)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(plan=tick_plan, final=st.sets(st.sampled_from(["a", "b", "c", "d"]), max_size=4))
def test_workload_reconciliation_converges(spark, plan, final):
    from pulsar_pekko_streams_example_spark.streaming.workload import (
        Workload,
        WorkloadManager,
    )

    fail_start: set = set()
    fail_stop: set = set()

    class Q:
        def __init__(self, name):
            self.name = name
            self.isActive = True

        def processAllAvailable(self):
            pass

        def stop(self):
            if self.name in fail_stop:
                raise RuntimeError("stop refused")
            self.isActive = False

    def factory(w):
        if w.workload_name in fail_start:
            raise RuntimeError("start refused")
        return Q(w.workload_name)

    mgr = WorkloadManager(spark=spark, stream_factory=factory)
    desired_union: set = set()
    for desired, bad_start, bad_stop in plan:
        fail_start, fail_stop = set(bad_start), set(bad_stop)
        desired_union |= desired
        report = mgr.reconcile({Workload(n, "t") for n in desired})
        # errors are data, never exceptions; the registry never invents names
        assert set(report.start_errors) <= desired
        assert mgr.running() <= desired_union
        # every non-failing desired workload is running after its tick
        assert desired - fail_start <= mgr.running() | set(report.start_errors)

    # failures clear → ONE clean tick converges exactly to the final set
    fail_start, fail_stop = set(), set()
    mgr.reconcile({Workload(n, "t") for n in final})
    assert mgr.running() == final


# ---------------------------------------------------------------------------
# K2 per-key cursor invariants (logic level, no Spark): for ANY micro-batch
# split of a key's backlog — duplicates, gaps, NULL seqs included — the
# processor conserves rows, stays serial, and the cursor lands on the max
# positioned seq.  A contiguous in-order stream split at arbitrary batch
# boundaries must read 100% in-order with zero redeliveries.
# ---------------------------------------------------------------------------


class _FakeGroupState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _run_key_batches(batches):
    """Feed batches (lists of (message_id, seq, attempt)) through
    _process_key with persistent fake state; return (all_out_rows, state)."""
    import pandas as pd

    from pulsar_pekko_streams_example_spark.streaming import ordered_state as OS

    st = _FakeGroupState()
    outs = []
    for rows in batches:
        if not rows:
            continue
        pdf = pd.DataFrame(rows, columns=["message_id", "seq", "attempt"])
        # Arrow fidelity: nullable long arrives as float64 + NaN
        pdf["seq"] = pdf["seq"].astype("float64")
        (out,) = OS._process_key(("k",), iter([pdf]), st)
        outs.append(out)
    return (pd.concat(outs, ignore_index=True) if outs else None), st


seq_batches = st.lists(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=999_999),  # message id
            st.one_of(st.none(), st.integers(min_value=0, max_value=12)),  # seq
            st.one_of(st.none(), st.integers(min_value=1, max_value=3)),  # attempt
        ),
        max_size=8,
    ),
    min_size=1,
    max_size=5,
)


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(batches=seq_batches)
def test_ordered_cursor_invariants_under_arbitrary_batches(batches):
    import pandas as pd

    rows_in = [(f"m-{mid}-{i}-{j}", s, a)
               for i, b in enumerate(batches) for j, (mid, s, a) in enumerate(b)]
    out, state = _run_key_batches(
        [[(f"m-{mid}-{i}-{j}", s, a) for j, (mid, s, a) in enumerate(b)]
         for i, b in enumerate(batches)]
    )
    if not rows_in:
        assert out is None
        return
    # conservation: every message exactly once, serial contiguous indexing
    assert sorted(out["message_id"]) == sorted(m for m, _, _ in rows_in)
    assert sorted(out["processing_index"]) == list(range(len(rows_in)))
    # cursor lands on the max positioned seq ever seen (-1 if none)
    seqs = [s for _, s, _ in rows_in if s is not None]
    assert state.get == (max(seqs) if seqs else -1, len(rows_in))
    # positionless rows never read in-order and never flag redelivery
    nulls = out[out["seq"].isna()]
    assert not nulls["in_order"].any() and not nulls["is_redelivery"].any()
    # a redelivery is exactly a positioned row at-or-below the cursor at its
    # processing time; replay the processing order to check the flag
    cursor = -1
    for r in out.sort_values("processing_index").itertuples(index=False):
        if pd.isna(r.seq):
            continue
        assert r.is_redelivery == (r.seq <= cursor)
        if not r.is_redelivery:
            cursor = int(r.seq)


@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    n=st.integers(min_value=1, max_value=20),
    cuts=st.sets(st.integers(min_value=1, max_value=19), max_size=4),
)
def test_ordered_contiguous_stream_reads_fully_in_order(n, cuts):
    """Gap-free seqs 1..n split at arbitrary micro-batch boundaries: every
    row in-order, zero redeliveries — the exact Key_Shared guarantee the
    reference derives from mapZIOPar(1) per key."""
    bounds = sorted(c for c in cuts if c < n)
    seqs = list(range(1, n + 1))
    batches, prev = [], 0
    for b in bounds + [n]:
        batches.append([(f"m{s}", s, 1) for s in seqs[prev:b]])
        prev = b
    out, state = _run_key_batches(batches)
    assert out["in_order"].all() and not out["is_redelivery"].any()
    assert state.get == (n, n)
    assert list(out.sort_values("processing_index")["seq"]) == seqs


# ---------------------------------------------------------------------------
# S6/S7 delivery conservation (round-9): for ANY batch of verdicts —
# NULL ok, NULL attempt, NULL message_id, attempt at/over the max — every
# row lands in EXACTLY one of sink / retry / DLQ, the DLQ only holds
# exhausted attempts, and retry rows age by exactly one attempt.
# ---------------------------------------------------------------------------

verdict_batch = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(min_value=0, max_value=9)),  # id (None=anon)
        st.one_of(st.none(), st.integers(min_value=1, max_value=6)),  # attempt
        st.one_of(st.none(), st.booleans()),                          # ok
    ),
    min_size=1,
    max_size=10,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=verdict_batch)
def test_retry_router_conserves_every_verdict_batch(spark, rows):
    import os as _os
    import tempfile as _tempfile

    from pulsar_pekko_streams_example_spark.streaming.retry import RetryRouter

    max_attempts = 3
    with _tempfile.TemporaryDirectory() as d:
        router = RetryRouter(
            sink_path=_os.path.join(d, "sink"),
            retry_path=_os.path.join(d, "retry"),
            dlq_path=_os.path.join(d, "dlq"),
            redelivery_delay_s=0,
            max_attempts=max_attempts,
        )
        # unique payload per row so anonymous rows keep their multiplicity
        batch = spark.createDataFrame(
            [
                (None if i0 is None else f"m-{i0}", f"payload-{j}", att, ok)
                for j, (i0, att, ok) in enumerate(rows)
            ],
            "message_id string, body string, attempt long, ok boolean",
        )
        router.route_batch(batch, batch_id=1)

        def load(p):
            from pyspark.errors import AnalysisException

            if not _os.path.exists(p):
                return []
            try:
                return spark.read.parquet(p).collect()
            except AnalysisException:  # dir exists but holds no footers
                return []

        sink, retry, dlq = (
            load(router.sink_path),
            load(router.retry_path),
            load(router.dlq_path),
        )
        # conservation: exactly one destination per row, by unique payload
        assert sorted(r.body for r in sink + retry + dlq) == sorted(
            f"payload-{j}" for j in range(len(rows))
        )
        inputs = {f"payload-{j}": (i0, att, ok) for j, (i0, att, ok) in enumerate(rows)}
        for r in sink:
            assert inputs[r.body][2] is True  # only genuine acks
        for r in dlq:
            att = inputs[r.body][1]
            assert inputs[r.body][2] is not True
            assert (att or 1) >= max_attempts  # only exhausted attempts
        for r in retry:
            att = inputs[r.body][1]
            assert inputs[r.body][2] is not True
            assert (att or 1) < max_attempts
            assert r.attempt == (att or 1) + 1  # aged exactly one attempt
            assert r.message_id is not None  # surrogate or real — never NULL


# ---------------------------------------------------------------------------
# Delivery accounting under maintenance (round-9): for ANY interleaving of
# routing cycles with compact() and requeue_dlq(), every seeded message is
# always accounted for — in the sink, in the live retry frontier, or in the
# DLQ.  Maintenance ops rewrite ledgers; none may lose a message.
#
# Round-10 extension: a maintenance op may CRASH at an arbitrary os.rename —
# inside a ledger swap, between swaps, or inside a previous crash's recovery
# (recovery renames count too, so its own windows are exercised).  The next
# ledger read heals mechanically (recover_swaps via due_retries / the lease),
# and the same accounting must hold — in particular the worst window, a
# mid-swap-missing retry ledger, must never read as a silently empty frontier
# that drops the in-flight messages from the accounting.
# ---------------------------------------------------------------------------

maintenance_ops = st.lists(
    st.one_of(
        st.sampled_from(["fail_cycle", "ack_cycle", "compact", "requeue"]),
        st.tuples(st.sampled_from(["compact", "requeue"]), st.integers(1, 6)),
    ),
    min_size=1,
    max_size=5,
)


class _InjectedCrash(RuntimeError):
    pass


def _run_crashing_at_rename(fn, nth):
    """Run ``fn`` with the ``nth`` os.rename replaced by a crash; if fewer
    renames happen the op simply completes.  The injected error is
    swallowed — the property's accounting then plays the restarted driver."""
    from contextlib import suppress

    import pulsar_pekko_streams_example_spark.streaming.retry as rmod

    real = rmod.os.rename
    count = {"n": 0}

    def boom(src, dst):
        count["n"] += 1
        if count["n"] == nth:
            raise _InjectedCrash(f"injected crash at rename #{nth}")
        return real(src, dst)

    rmod.os.rename = boom
    try:
        with suppress(_InjectedCrash):
            fn()
    finally:
        rmod.os.rename = real


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=maintenance_ops, n_msgs=st.integers(min_value=1, max_value=6))
def test_retry_maintenance_never_loses_a_message(spark, ops, n_msgs):
    import os as _os
    import tempfile as _tempfile

    from pyspark.sql import functions as F

    from pulsar_pekko_streams_example_spark.streaming.retry import RetryRouter

    AS_OF = "2100-01-01 00:00:00"
    with _tempfile.TemporaryDirectory() as d:
        router = RetryRouter(
            sink_path=_os.path.join(d, "sink"),
            retry_path=_os.path.join(d, "retry"),
            dlq_path=_os.path.join(d, "dlq"),
            redelivery_delay_s=0,
            max_attempts=3,
        )
        ids = [f"m-{i}" for i in range(n_msgs)]
        router.route_batch(
            spark.createDataFrame(
                [(m, 1, False) for m in ids],
                "message_id string, attempt long, ok boolean",
            ),
            batch_id=1,
        )
        batch_no = 1

        def read_ids(p):
            from pyspark.errors import AnalysisException

            if not _os.path.exists(p):
                return set()
            try:
                return {r.message_id for r in spark.read.parquet(p).collect()}
            except AnalysisException:  # dir exists but holds no footers
                return set()

        for op in ops:
            batch_no += 1
            crash_at = None
            if isinstance(op, tuple):
                op, crash_at = op
            if op in ("fail_cycle", "ack_cycle"):
                due = router.due_retries(spark, as_of=AS_OF)
                batch = due.drop("available_at", "_batch_id").withColumn(
                    "ok", F.lit(op == "ack_cycle")
                )
                if batch.limit(1).count():
                    router.route_batch(batch, batch_id=batch_no)
            elif op == "compact":
                run = lambda: router.compact(spark)  # noqa: E731
                if crash_at is None:
                    run()
                else:
                    _run_crashing_at_rename(run, crash_at)
            else:
                bno = batch_no
                run = lambda: router.requeue_dlq(spark, batch_id=-bno)  # noqa: E731
                if crash_at is None:
                    run()
                else:
                    _run_crashing_at_rename(run, crash_at)

            delivered = read_ids(router.sink_path)
            frontier = {
                r.message_id
                for r in router.due_retries(spark, as_of=AS_OF).collect()
            }
            accounted = delivered | frontier | read_ids(router.dlq_path)
            assert set(ids) <= accounted, (op, sorted(set(ids) - accounted))
            # TERMINATION (round-10, ADVICE r9): a delivered message never
            # re-enters the redelivery frontier — in particular a requeued
            # message acked on its attempt-1 redelivery, where the
            # attempt>1 resolved trigger alone never fires.  Pre-fix, the
            # sequence fail,fail,fail → requeue → ack_cycle left the
            # delivered id in the frontier forever.
            assert not (delivered & frontier), (op, sorted(delivered & frontier))


# ---------------------------------------------------------------------------
# Partition-scoped sink fold under arbitrary crashes (round-11): compact_sink
# may crash at ANY of its filesystem mutation primitives — the manifest
# commit (os.replace), the staging rename (os.rename), the manifest removal
# (os.remove) — and recovery (recover_swaps / the next mutator's lease) must
# converge on a layout where every delivered row exists EXACTLY once (no
# loss, no duplication), live partitions are byte-untouched, and a re-run of
# the fold completes.  The multiset check matters: the two dangerous windows
# are re-removing the landed archive (loss) and replaying the fold over an
# already-folded layout (duplication).
# ---------------------------------------------------------------------------


def _run_crashing_at_os(fn, attr, nth):
    """Run ``fn`` with the ``nth`` call of ``os.<attr>`` (as seen by the
    retry module) replaced by a crash; fewer calls → the op completes."""
    from contextlib import suppress

    import pulsar_pekko_streams_example_spark.streaming.retry as rmod

    real = getattr(rmod.os, attr)
    count = {"n": 0}

    def boom(*a, **k):
        count["n"] += 1
        if count["n"] == nth:
            raise _InjectedCrash(f"injected crash at {attr} #{nth}")
        return real(*a, **k)

    setattr(rmod.os, attr, boom)
    try:
        with suppress(_InjectedCrash):
            fn()
    finally:
        setattr(rmod.os, attr, real)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    crash=st.one_of(
        st.none(),
        st.tuples(st.sampled_from(["rename", "replace", "remove"]), st.integers(1, 2)),
    ),
    cutoff=st.integers(min_value=0, max_value=5),
)
def test_sink_fold_crash_windows_never_lose_or_duplicate(spark, crash, cutoff):
    import os as _os
    import tempfile as _tempfile

    from pulsar_pekko_streams_example_spark.streaming.retry import RetryRouter

    with _tempfile.TemporaryDirectory() as d:
        router = RetryRouter(
            sink_path=_os.path.join(d, "sink"),
            retry_path=_os.path.join(d, "retry"),
            dlq_path=_os.path.join(d, "dlq"),
        )
        seeded = []
        for b in range(1, 6):
            ids = [f"m-{b}-{i}" for i in range(2)]
            seeded.extend(ids)
            router.route_batch(
                spark.createDataFrame(
                    [(m, 1, True) for m in ids],
                    "message_id string, attempt long, ok boolean",
                ),
                batch_id=b,
            )

        def fingerprint(batch_ids):
            out = {}
            for b in batch_ids:
                p = _os.path.join(router.sink_path, f"_batch_id={b}")
                for name in sorted(_os.listdir(p)):
                    st_ = _os.stat(_os.path.join(p, name))
                    out[(b, name)] = (st_.st_size, st_.st_mtime_ns)
            return out

        live = [b for b in range(1, 6) if b > cutoff]
        live_before = fingerprint(live)

        run = lambda: router.compact_sink(  # noqa: E731
            spark, up_to_batch_id=cutoff, force=True
        )
        if crash is None:
            run()
        else:
            attr, nth = crash
            _run_crashing_at_os(run, attr, nth)
            router.recover_swaps()

        # every seeded row exactly once — loss AND duplication both fail
        rows = sorted(
            r.message_id for r in spark.read.parquet(router.sink_path).collect()
        )
        assert rows == sorted(seeded), (crash, cutoff)
        # live partitions byte-untouched through crash + recovery
        assert fingerprint(live) == live_before, (crash, cutoff)
        assert router._fold_debris() == [], (crash, cutoff)

        # a re-run (the restarted maintenance window) converges on the fold
        stats = run()
        dirs = {
            name
            for name in _os.listdir(router.sink_path)
            if name.startswith("_batch_id=")
        }
        expected = {f"_batch_id={b}" for b in live}
        if cutoff >= 1:
            expected.add("_batch_id=-1")
        assert dirs == expected, (crash, cutoff, stats)
        rows = sorted(
            r.message_id for r in spark.read.parquet(router.sink_path).collect()
        )
        assert rows == sorted(seeded), (crash, cutoff)


# ---------------------------------------------------------------------------
# Partition-scoped sink fold under PARTIAL REMOVAL FAILURES (round-12): any
# subset of the fold's old-partition removals may be refused by the
# filesystem (the silent ignore_errors shape of NFS busy files / EACCES).
# The fold must abort LOUDLY with the manifest kept and the staging NOT
# renamed in — at no point may a reader see a row twice (the duplicated-
# forever layout the loud check exists to prevent); rows whose removal DID
# land are dark-but-recoverable in the staging.  Once the filesystem heals,
# recovery converges to exactly-once with live partitions byte-untouched,
# and a re-run of the fold completes.
# ---------------------------------------------------------------------------


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    stuck_mask=st.lists(st.booleans(), min_size=5, max_size=5),
    cutoff=st.integers(min_value=1, max_value=5),
)
def test_sink_fold_partial_removal_failures_defer_and_converge(
    spark, stuck_mask, cutoff
):
    import os as _os
    import shutil as _shutil
    import tempfile as _tempfile

    import pytest as _pytest

    from pulsar_pekko_streams_example_spark.streaming.retry import RetryRouter

    with _tempfile.TemporaryDirectory() as d:
        router = RetryRouter(
            sink_path=_os.path.join(d, "sink"),
            retry_path=_os.path.join(d, "retry"),
            dlq_path=_os.path.join(d, "dlq"),
        )
        seeded = []
        for b in range(1, 6):
            ids = [f"m-{b}-{i}" for i in range(2)]
            seeded.extend(ids)
            router.route_batch(
                spark.createDataFrame(
                    [(m, 1, True) for m in ids],
                    "message_id string, attempt long, ok boolean",
                ),
                batch_id=b,
            )

        def fingerprint(batch_ids):
            out = {}
            for b in batch_ids:
                p = _os.path.join(router.sink_path, f"_batch_id={b}")
                for name in sorted(_os.listdir(p)):
                    st_ = _os.stat(_os.path.join(p, name))
                    out[(b, name)] = (st_.st_size, st_.st_mtime_ns)
            return out

        live = [b for b in range(1, 6) if b > cutoff]
        live_before = fingerprint(live)
        stuck = {
            _os.path.abspath(_os.path.join(router.sink_path, f"_batch_id={b}"))
            for b, flag in zip(range(1, 6), stuck_mask)
            if flag and b <= cutoff
        }

        real = _shutil.rmtree

        def sticky(path, *a, **kw):
            if _os.path.abspath(str(path)) in stuck:
                return  # the ignore_errors silent-failure shape: dir stays
            return real(path, *a, **kw)

        _shutil.rmtree = sticky
        try:
            if stuck:
                with _pytest.raises(OSError, match="could not remove"):
                    router.compact_sink(spark, up_to_batch_id=cutoff, force=True)
                # NEVER-TWICE: whatever the surviving/removed mix, no row is
                # visible more than once (the staging is dot-prefixed dark)
                visible = sorted(
                    r.message_id
                    for r in spark.read.parquet(router.sink_path).collect()
                )
                assert len(visible) == len(set(visible)), (stuck_mask, cutoff)
                assert set(visible) <= set(seeded)
                # the manifest (retry signal) survives the abort
                assert router._fold_debris() != []
            else:
                router.compact_sink(spark, up_to_batch_id=cutoff, force=True)
        finally:
            _shutil.rmtree = real

        # filesystem healed: recovery converges to exactly-once
        router.recover_swaps()
        rows = sorted(
            r.message_id for r in spark.read.parquet(router.sink_path).collect()
        )
        assert rows == sorted(seeded), (stuck_mask, cutoff)
        assert fingerprint(live) == live_before, (stuck_mask, cutoff)
        assert router._fold_debris() == [], (stuck_mask, cutoff)

        # the restarted maintenance window completes on the healed layout
        router.compact_sink(spark, up_to_batch_id=cutoff, force=True)
        dirs = {
            name
            for name in _os.listdir(router.sink_path)
            if name.startswith("_batch_id=")
        }
        assert dirs == {f"_batch_id={b}" for b in live} | {"_batch_id=-1"}
        rows = sorted(
            r.message_id for r in spark.read.parquet(router.sink_path).collect()
        )
        assert rows == sorted(seeded), (stuck_mask, cutoff)


# ---------------------------------------------------------------------------
# Round-14 pins for the round-13 oracle-only operators (VERDICT r13 task 1).
#
# The DuckDB oracle mirrors the engine's own construction (same prefix
# formula, same estimator), so a shared off-by-one would be parity-green —
# the blind spot that historically bit the quantile sketch and the retry
# frontier.  These pins check against INDEPENDENT references instead:
# brute-force Python, the prefix-filter theorem, and the estimator's own
# exact-branch/monotonicity contracts.
# ---------------------------------------------------------------------------


def _brute_jaccard_pairs(texts: dict[int, str], tn: int, td: int, n: int = 3):
    """Exact Jaccard over full (uncapped) shingle universes — independent
    Python reference mirroring hashing.tokens/shingles semantics."""
    def shingle_set(t: str) -> set[str]:
        w = [x for x in t.split(" ") if x]
        return {"_".join(w[i : i + n]) for i in range(len(w) - n + 1)} if len(w) >= n else set()

    sets = {d: shingle_set(t) for d, t in texts.items()}
    out = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            # same IEEE ops as the engine's double filter: inter/union >= tn/td
            if union and inter / union >= tn / td:
                out[(a, b)] = inter / union
    return out


jdocs = st.lists(
    st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"]),
        min_size=3,
        max_size=10,
    ),
    min_size=2,
    max_size=5,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(docs_words=jdocs, tail=st.sampled_from(["alpha", "zeta"]))
def test_jaccard_prefix_pairs_complete_vs_bruteforce(spark, docs_words, tail):
    """The prefix-filter theorem, end to end: every pair the exact uncapped
    brute force finds at J >= 7/10 MUST appear in jaccard_prefix_pairs(7, 10)
    with the identical jaccard — completeness is the whole point of PPJoin
    (a too-short prefix silently LOSES pairs and stays oracle-green, because
    the oracle runs the same prefix formula).  Near-dup pairs are forced by
    duplicating doc 0 verbatim and once with one appended token."""
    texts = {i: " ".join(ws) for i, ws in enumerate(docs_words)}
    n0 = len(texts)
    texts[n0] = texts[0]                     # exact duplicate: J = 1
    texts[n0 + 1] = texts[0] + " " + tail    # near-dup: usually J >= 0.7
    docs = spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string"
    )
    from pulsar_pekko_streams_example_spark.operators import dedup

    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.jaccard_prefix_pairs(docs, 7, 10).collect()
    }
    want = _brute_jaccard_pairs(texts, 7, 10)
    missing = {p: j for p, j in want.items() if p not in got}
    assert not missing, f"prefix filter LOST pairs: {missing}; got {got}"
    # and nothing below threshold leaks through (exactness, both directions)
    assert got == want, (got, want)


def _write_kmv_events(spark, base, user_ids_by_type):
    rows = []
    eid = 0
    for etype, uids in user_ids_by_type.items():
        for u in uids:
            rows.append((eid, "2024-01-01 00:00:00", u, etype, 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, ts string, user_id bigint, event_type string, "
        "value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts AS TIMESTAMP) AS ts", "user_id", "event_type",
        "value", "props",
    ).write.mode("overwrite").parquet(f"{base}/events.parquet")
    return str(base)


def test_kmv_exact_branch_and_union_monotonicity(spark, tmp_path):
    """KMV estimator contracts the oracle cannot check (it runs the same
    estimator): (a) |S| < K  =>  the sample IS the set and the estimate
    EQUALS the exact count — both sets and their union; (b) est_union >=
    max(est_a, est_b) in ALL branch combinations (union sample's K-th
    smallest <= either input's, and in the mixed case (K-1)*MOD DIV theta
    >= K-1 >= the exact small side)."""
    from pulsar_pekko_streams_example_spark.plans.sketch_queries import (
        KMV_K,
        kmv_sketch_setops,
    )

    # (a) exact branch: 5 click users, 4 purchase users, 2 shared — all < K
    small = _write_kmv_events(
        spark,
        tmp_path / "small",
        {"click": [1, 2, 3, 4, 5], "purchase": [4, 5, 6, 7], "view": [9]},
    )
    r = kmv_sketch_setops(spark, small).collect()[0]
    assert r.est_a == r.exact_a == 5
    assert r.est_b == r.exact_b == 4
    assert r.est_union == r.exact_union == 7
    assert r.est_intersection == r.exact_intersection == 2
    assert r.est_union >= max(r.est_a, r.est_b)

    # (b) estimator branch: both sets far above K distinct users
    big = _write_kmv_events(
        spark,
        tmp_path / "big",
        {
            "click": list(range(1, 4 * KMV_K + 1)),
            "purchase": list(range(2 * KMV_K, 7 * KMV_K)),
        },
    )
    r = kmv_sketch_setops(spark, big).collect()[0]
    assert r.exact_a >= KMV_K and r.exact_b >= KMV_K  # the branch we mean to hit
    assert r.est_a > 0 and r.est_b > 0
    assert r.est_union >= max(r.est_a, r.est_b), r

    # (c) mixed branches: A tiny (exact), B large (estimated)
    mixed = _write_kmv_events(
        spark,
        tmp_path / "mixed",
        {"click": [1, 2, 3], "purchase": list(range(100, 100 + 5 * KMV_K))},
    )
    r = kmv_sketch_setops(spark, mixed).collect()[0]
    assert r.est_a == r.exact_a == 3
    assert r.est_union >= max(r.est_a, r.est_b), r


def test_bm25_rank_order_and_term_membership(spark):
    """BM25 sanity contracts promoted from examples/corpus_search.py into
    the suite (VERDICT r13): output is rank-ordered by score (ties by
    doc_id), every returned doc really CONTAINS >= 1 query term as a
    whitespace token (OR semantics — a scoring bug that surfaced docs with
    zero matching terms would be oracle-green), matched_terms is a sane
    1..|terms| count, and scores are positive."""
    from pulsar_pekko_streams_example_spark.plans import REGISTRY, all_queries
    from pulsar_pekko_streams_example_spark.plans.data_queries import SEARCH_TERMS

    all_queries()
    sf = "/root/testdata/sf0.001"
    rows = REGISTRY["bm25_search_topk"].build(spark, sf).collect()
    assert rows, "BM25 must rank at least one document on the smoke corpus"
    scores = [(r.score_pico, -r.doc_id) for r in rows]
    assert scores == sorted(scores, key=lambda t: (-t[0], -t[1])), rows
    for r in rows:
        assert 1 <= r.matched_terms <= len(SEARCH_TERMS), r
        assert r.score_pico > 0, r
    texts = {
        d.doc_id: d.text
        for d in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .collect()
        if d.doc_id in {r.doc_id for r in rows}
    }
    for r in rows:
        toks = set(texts[r.doc_id].split(" "))
        hit = toks & set(SEARCH_TERMS)
        assert hit, f"doc {r.doc_id} returned by BM25 but contains no query term"
        assert len(hit) == r.matched_terms, (r, sorted(hit))


# ---------------------------------------------------------------------------
# Round-14 queries, pinned from day one (VERDICT r13 task 5's "done" bar).
# ---------------------------------------------------------------------------


def _bpe_reference(texts: list[str], k: int):
    """Independent Python BPE: weighted pair counts over the word vocab,
    ties lexicographic on (s1, s2), greedy left-to-right apply — the
    de-facto algorithm (Sennrich et al. 2016), written without looking at
    either engine dialect."""
    from collections import Counter

    words = Counter(w for t in texts for w in t.split(" ") if w)
    syms = {w: list(w) for w in words}
    before = sum(c * len(w) for w, c in words.items())
    merges = []
    for _ in range(k):
        pc = Counter()
        for w, c in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            continue  # engine's sentinel round: no merge recorded
        s1, s2 = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((len(merges) + 1, s1, s2))
        for w in syms:
            out = []
            for x in syms[w]:
                if out and out[-1] == s1 and x == s2:
                    out[-1] = s1 + s2
                else:
                    out.append(x)
            syms[w] = out
    after = sum(c * len(syms[w]) for w, c in words.items())
    rows = []
    for rank, s1, s2 in merges:
        tok = s1 + s2
        rows.append(
            (
                rank,
                f"{s1}+{s2}",
                tok,
                sum(1 for w in words if tok in syms[w]),
                sum(c * syms[w].count(tok) for w, c in words.items()),
                before,
                after,
            )
        )
    return sorted(rows)


bpe_texts = st.lists(
    st.lists(
        st.sampled_from(["aa", "ab", "abab", "banana", "bandana", "cab", "a"]),
        min_size=1,
        max_size=8,
    ).map(" ".join),
    min_size=1,
    max_size=4,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=bpe_texts)
def test_bpe_encode_stats_matches_python_reference(spark, texts):
    """The full train->apply->count arc vs an independent Python BPE on
    merge-overlap-heavy corpora ('aaa', 'banana': the shapes where a wrong
    greedy fold — e.g. string replace() skipping boundary-sharing
    occurrences — diverges).  The oracle replays the engine's own fold, so
    only an OUTSIDE reference can catch a shared apply bug."""
    from pulsar_pekko_streams_example_spark.plans.mldata_queries import (
        BPE_ENCODE_MERGES,
        _bpe_encode_stats,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = sorted(
        (
            r.merge_rank, r.pair, r.token, r.vocab_words, r.occurrences,
            r.syms_before, r.syms_after,
        )
        for r in _bpe_encode_stats(docs).collect()
    )
    assert got == _bpe_reference(texts, BPE_ENCODE_MERGES), texts


def test_search_rerank_is_a_permutation_with_self_query_on_top(spark):
    """Rerank contracts an oracle that mirrors the construction cannot
    check: stage 2 reorders WITHOUT changing the candidate set (ids are
    exactly the BM25 top-k), both rank columns are dense permutations of
    1..n, every cosine is a valid [-1, 1] score, and the query doc (BM25
    rank 1) scores cosine ~1 against itself — the maximum — so it
    rounds-trips to rerank rank 1."""
    from pulsar_pekko_streams_example_spark.plans import REGISTRY, all_queries

    all_queries()
    sf = "/root/testdata/sf0.001"
    rr = REGISTRY["search_rerank_stage"].build(spark, sf).collect()
    bm = REGISTRY["bm25_search_topk"].build(spark, sf).collect()
    assert {r.doc_id for r in rr} == {r.doc_id for r in bm}
    n = len(rr)
    assert sorted(r.rerank_rank for r in rr) == list(range(1, n + 1))
    assert sorted(r.bm25_rank for r in rr) == list(range(1, n + 1))
    for r in rr:
        assert -1.0 <= r.cosine <= 1.0 + 1e-9, r
    top = next(r for r in rr if r.bm25_rank == 1)
    assert top.cosine >= 1.0 - 1e-9, top
    assert top.cosine == max(r.cosine for r in rr)


def _py_tokens(t: str) -> list[str]:
    return [w for w in t.split(" ") if w]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(
    st.lists(
        st.sampled_from(["a", "bb", "ccc", "bb ccc", "a a a", "zz"]),
        min_size=1, max_size=6,
    ).map(" ".join),
    min_size=1, max_size=5,
))
def test_vocab_coverage_matches_python_reference(spark, texts):
    """Coverage curve vs an independent Python reference: exact covered
    mass at every depth with the (count DESC, token ASC) boundary
    tie-break, plus monotonicity (coverage non-decreasing in depth,
    saturating at total once depth >= |vocab|)."""
    from collections import Counter

    from pulsar_pekko_streams_example_spark.plans.data_queries import (
        VOCAB_COVERAGE_DEPTHS,
        _vocab_coverage_curve,
    )

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.depth: r
        for r in _vocab_coverage_curve(docs).collect()
    }
    cnt = Counter(w for t in texts for w in _py_tokens(t))
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())
    prev = -1
    for d in VOCAB_COVERAGE_DEPTHS:
        r = got[d]
        want = sum(c for _, c in ordered[:d])
        assert (r.covered_tokens, r.total_tokens, r.vocab_types) == (
            want, total, len(cnt)
        ), (d, texts)
        assert r.coverage_permille == want * 1000 // total
        assert r.covered_tokens >= prev
        prev = r.covered_tokens
        if d >= len(cnt):
            assert r.covered_tokens == total


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(lens=st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=8))
def test_truncation_loss_matches_python_reference(spark, lens):
    """Truncation loss vs brute force on arbitrary doc lengths (docs built
    with exactly n one-char tokens), plus monotonicity: loss and cut-doc
    count are non-increasing in L."""
    from pulsar_pekko_streams_example_spark.plans.data_queries import (
        TRUNCATION_LENGTHS,
        _truncation_loss_curve,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(["x"] * n)) for i, n in enumerate(lens)],
        "doc_id long, text string",
    )
    got = {r.max_len: r for r in _truncation_loss_curve(docs).collect()}
    total = sum(lens)
    prev_lost, prev_cut = None, None
    for L in TRUNCATION_LENGTHS:
        r = got[L]
        lost = sum(max(0, n - L) for n in lens)
        cut = sum(1 for n in lens if n > L)
        assert (r.docs_truncated, r.tokens_lost, r.tokens_kept) == (
            cut, lost, total - lost
        ), (L, lens)
        assert r.loss_permille == lost * 1000 // max(total, 1)
        if prev_lost is not None:
            assert r.tokens_lost <= prev_lost and r.docs_truncated <= prev_cut
        prev_lost, prev_cut = r.tokens_lost, r.docs_truncated


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(srcs=st.lists(
    st.tuples(
        st.sampled_from(["web", "syn"]),
        st.lists(
            st.sampled_from(["aa", "ab", "abab", "banana", "cab"]),
            min_size=1, max_size=6,
        ).map(" ".join),
    ),
    min_size=1, max_size=4,
))
def test_tokenizer_fertility_matches_python_reference(spark, srcs):
    """Fertility per source vs the independent Python BPE: train on the
    pooled corpus, apply, then per-source words/chars/tokens must match
    the reference's encode exactly (the apply-by-vocab-join shape is the
    part the oracle shares with the engine)."""
    from collections import Counter

    from pulsar_pekko_streams_example_spark.plans.mldata_queries import (
        BPE_ENCODE_MERGES,
        _tokenizer_fertility_by_source,
    )

    texts = [t for _, t in srcs]
    # independent reference: train (reusing _bpe_reference's algorithm body)
    words = Counter(w for t in texts for w in _py_tokens(t))
    syms = {w: list(w) for w in words}
    for _ in range(BPE_ENCODE_MERGES):
        pc = Counter()
        for w, c in words.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += c
        if not pc:
            continue
        s1, s2 = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        for w in syms:
            out = []
            for x in syms[w]:
                if out and out[-1] == s1 and x == s2:
                    out[-1] = s1 + s2
                else:
                    out.append(x)
            syms[w] = out
    want = {}
    for src, t in srcs:
        toks = _py_tokens(t)
        ws, ch, tk = want.get(src, (0, 0, 0))
        want[src] = (
            ws + len(toks),
            ch + sum(len(w) for w in toks),
            tk + sum(len(syms[w]) for w in toks),
        )

    docs = spark.createDataFrame(
        [(i, t, s) for i, (s, t) in enumerate(srcs)],
        "doc_id long, text string, source string",
    )
    got = {
        r.source: (r.words, r.chars, r.tokens, r.fertility_milli)
        for r in _tokenizer_fertility_by_source(docs).collect()
    }
    assert set(got) == set(want), srcs
    for src, (ws, ch, tk) in want.items():
        assert got[src] == (ws, ch, tk, tk * 1000 // ws), (src, srcs)


def _py_lpa(pairs: list[tuple[int, int]], iters: int) -> dict[int, int]:
    """Independent synchronous LPA with (count DESC, label ASC) ties."""
    from collections import Counter, defaultdict

    adj = defaultdict(list)
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
    labels = {n: n for n in adj}
    for _ in range(iters):
        new = {}
        for n, nbrs in adj.items():
            cnt = Counter(labels[m] for m in nbrs)
            new[n] = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        labels = new
    return labels


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(pairs=st.lists(
    st.tuples(st.integers(min_value=0, max_value=9), st.integers(min_value=0, max_value=9))
    .filter(lambda p: p[0] != p[1]),
    min_size=1, max_size=16, unique=True,
))
def test_label_propagation_matches_python_reference(spark, pairs):
    """graph.label_propagation vs an independent Python LPA on arbitrary
    small graphs — exact per-node label equality after 2 synchronous
    rounds.  Edge multiplicity matters (a doubled edge is a doubled vote):
    the mirrored-pair construction must count each undirected edge once
    per endpoint, which the reference reproduces from the raw pair list."""
    from pulsar_pekko_streams_example_spark.operators import graph

    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {
        r.node: r.label
        for r in graph.label_propagation(edges, iters=2).collect()
    }
    assert got == _py_lpa(pairs, 2), pairs


def test_kendall_tau_matches_python_reference_on_smoke_corpus(spark):
    """ranking_kendall_tau vs an independent Python pipeline on sf0.001:
    tokenize, integer BM25 term scores (the published formula re-derived
    from the constants, not the engine's SQL), both rankings, common set,
    pair counting — catching dialect/rank-window bugs the shared-construction
    oracle cannot.  Also pins the range contract |tau_milli| <= 1000."""
    from collections import Counter

    from pulsar_pekko_streams_example_spark.plans import REGISTRY, all_queries
    from pulsar_pekko_streams_example_spark.plans.data_queries import (
        BM25_TOPK,
        SEARCH_TERMS,
    )

    all_queries()
    sf = "/root/testdata/sf0.001"
    row = REGISTRY["ranking_kendall_tau"].build(spark, sf).collect()[0]
    assert -1000 <= row.tau_milli <= 1000

    docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text").collect()
    toks = {d.doc_id: _py_tokens(d.text) for d in docs}
    n_docs, x = len(toks), sum(len(t) for t in toks.values())
    tf = {
        d: {t: c for t, c in Counter(w for w in ws if w in SEARCH_TERMS).items()}
        for d, ws in toks.items()
    }
    tf = {d: m for d, m in tf.items() if m}
    df = Counter(t for m in tf.values() for t in m)
    def score(d):
        s = 0
        for t, f in tf[d].items():
            idf = ((2 * n_docs - 2 * df[t] + 1) * 1000000) // (2 * df[t] + 1)
            tfn = (22 * f * x * 1000000) // (10 * x * f + 3 * x + 9 * len(toks[d]) * n_docs)
            s += idf * tfn
        return s
    top_a = sorted(tf, key=lambda d: (-score(d), d))[:BM25_TOPK]
    top_b = sorted(tf, key=lambda d: (-sum(tf[d].values()), d))[:BM25_TOPK]
    ra = {d: i + 1 for i, d in enumerate(top_a)}
    rb = {d: i + 1 for i, d in enumerate(top_b)}
    common = sorted(set(ra) & set(rb))
    C = D = 0
    for i, di in enumerate(common):
        for dj in common[i + 1 :]:
            prod = (ra[di] - ra[dj]) * (rb[di] - rb[dj])
            C += prod > 0
            D += prod < 0
    m = len(common)
    pairs_n = m * (m - 1) // 2
    want_tau = (
        0 if m < 2
        else (C - D) * 1000 // pairs_n if C >= D
        else -((D - C) * 1000 // pairs_n)
    )
    assert (row.m, row.concordant, row.discordant, row.tau_milli) == (
        m, C, D, want_tau
    )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(
    st.lists(
        st.sampled_from(["the cat", "a dog ran", "the dog", "cat ran far", "zz qq"]),
        min_size=1, max_size=3,
    ).map(" ".join),
    min_size=10, max_size=12,  # ids 0..n-1: %10>=8 guarantees held docs
))
def test_crosslm_perplexity_matches_python_reference(spark, texts):
    """CCNet-style filter vs an independent Python bigram LM: train on
    ids%10<8, add-one-smoothed scoring of the held slice, per-source
    rollup with OOV accounting.  Unseen transitions must score exactly the
    (N+V) ceiling — the smoothing branch the within-corpus surprisal query
    never exercises."""
    from collections import Counter, defaultdict

    from pulsar_pekko_streams_example_spark.plans.mldata_queries import (
        _crosslm_perplexity_filter,
    )

    def bigrams(t):
        w = _py_tokens(t)
        return [f"{w[i]}_{w[i+1]}" for i in range(len(w) - 1)]

    srcs = ["s0" if i % 2 == 0 else "s1" for i in range(len(texts))]
    train = Counter(
        b for i, t in enumerate(texts) if i % 10 < 8 for b in bigrams(t)
    )
    n, v = sum(train.values()), len(train)
    perdoc = {}
    for i, t in enumerate(texts):
        if i % 10 < 8:
            continue
        bs = bigrams(t)
        if not bs:
            continue
        scores = [(n + v) // (train.get(b, 0) + 1) for b in bs]
        oov = sum(1 for b in bs if b not in train)
        for b in bs:
            if b not in train:
                assert (n + v) // 1 == n + v  # the ceiling, by construction
        perdoc[i] = (srcs[i], sum(scores) // len(bs), oov, len(bs))
    want = {}
    agg = defaultdict(lambda: [0, 0, 0, 0])  # docs, score_sum, oov, bigrams
    maxs = {}
    for i, (s, score, oov, nb) in perdoc.items():
        a = agg[s]
        a[0] += 1; a[1] += score; a[2] += oov; a[3] += nb
        maxs[s] = max(maxs.get(s, 0), score)
    for s, (d, ssum, oov, nb) in agg.items():
        want[s] = (d, ssum / d, maxs[s], oov * 1000 // nb)

    docs = spark.createDataFrame(
        [(i, t, srcs[i]) for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    got = {
        r.source: (r.held_docs, r.avg_surprisal, r.max_surprisal, r.oov_permille)
        for r in _crosslm_perplexity_filter(docs).collect()
    }
    assert got == want, (texts, got, want)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(vecs=st.lists(
    st.one_of(
        st.none(),
        st.lists(
            st.sampled_from([-1.0, -0.5, -0.25, 0.0, 0.25, 0.5, 1.0]),
            min_size=3, max_size=3,
        ),
    ),
    min_size=1, max_size=8,
).filter(lambda vs: any(v is not None for v in vs)))
def test_embedding_dim_profile_matches_exact_fractions(spark, vecs):
    """Per-dim profile vs exact arithmetic on quarter-grid components
    (losslessly representable in DECIMAL(38,6) and float32, so the
    engine's exact-decimal sums must EQUAL the Python fractions — any
    float-order or rounding leak shows as a hard mismatch).  NULL vectors
    are excluded; extrema and counts come from the surviving rows."""
    from fractions import Fraction

    from pulsar_pekko_streams_example_spark.plans.cluster_queries import (
        _embedding_dim_profile,
    )

    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    rows = {r.dim: r for r in _embedding_dim_profile(emb).collect()}
    live = [v for v in vecs if v is not None]
    assert set(rows) == {1, 2, 3}
    for d in (1, 2, 3):
        xs = [Fraction(v[d - 1]) for v in live]
        r = rows[d]
        n = len(xs)
        s1, s2 = sum(xs), sum(x * x for x in xs)
        assert r.n == n
        assert Fraction(r.sum_x) == s1 and Fraction(r.sum_x2) == s2, (d, vecs)
        assert r.mean == float(r.sum_x) / n
        assert r.var == float(r.sum_x2) / n - (float(r.sum_x) / n) ** 2
        assert r.min_x == min(float(x) for x in xs)
        assert r.max_x == max(float(x) for x in xs)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # extra repeated tokens (ties!)
        st.integers(min_value=0, max_value=40),  # n_chars
    ),
    min_size=2, max_size=10,
))
def test_spearman_matrix_matches_python_reference(spark, rows):
    """signal_spearman_matrix vs an independent Python Spearman: average
    ranks from explicit sorting (not the engine's histogram-cumulative
    construction), Pearson over the doubled integer ranks, identical
    IEEE op order for the final division — exact equality, heavy ties
    included (every doc shares the 'tok' token)."""
    import math

    from pulsar_pekko_streams_example_spark.plans.mldata_queries import (
        _signal_spearman_matrix,
        _SPEAR_PAIRS,
    )

    docs = spark.createDataFrame(
        [
            (i, " ".join(["tok"] * (k + 1) + [f"u{j}" for j in range(i % 3)]), nc)
            for i, (k, nc) in enumerate(rows)
        ],
        "doc_id long, text string, n_chars long",
    )
    feats = []
    for i, (k, nc) in enumerate(rows):
        toks = ["tok"] * (k + 1) + [f"u{j}" for j in range(i % 3)]
        feats.append((len(toks), len(set(toks)), nc))

    def doubled_ranks(xs):
        order = sorted(range(len(xs)), key=lambda i: xs[i])
        r2 = [0] * len(xs)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and xs[order[j]] == xs[order[i]]:
                j += 1
            # doubled average rank of the tie group [i, j)
            val = (i + 1) + (j)  # 2 * (min_rank + max_rank) / 2
            for t in order[i:j]:
                r2[t] = val
            i = j
        return r2

    cols = list(zip(*feats))
    ranks = {s: doubled_ranks(list(cols[si])) for si, s in enumerate(("dl", "u", "nc"))}
    n = len(rows)
    got = {
        (r.feat_a, r.feat_b): (r.n_used, r.rho)
        for r in _signal_spearman_matrix(docs).collect()
    }
    for a, b in _SPEAR_PAIRS:
        rx, ry = ranks[a], ranks[b]
        sx, sy = sum(rx), sum(ry)
        sxx = sum(x * x for x in rx)
        syy = sum(y * y for y in ry)
        sxy = sum(x * y for x, y in zip(rx, ry))
        denx = math.sqrt(float(n) * float(sxx) - float(sx) * float(sx))
        deny = math.sqrt(float(n) * float(syy) - float(sy) * float(sy))
        if denx * deny == 0.0:
            want = None
        else:
            want = (float(n) * float(sxy) - float(sx) * float(sy)) / (denx * deny)
        assert got[(a, b)] == (n, want), (a, b, rows, got[(a, b)], want)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=st.lists(
    st.tuples(
        st.sampled_from(["s0", "s1"]),
        st.lists(
            st.sampled_from(["the", "a", "cat", "dog", "ran", "far", "zz", "qq"]),
            min_size=0, max_size=8,
        ).map(" ".join),
    ),
    min_size=1, max_size=10,
))
def test_token_budget_selection_matches_greedy_prefix(spark, rows):
    """token_budget_selection vs the spec it implements, stated directly:
    sort docs by (quality DESC, doc_id), include while the running token
    total fits 50% of the corpus, stop at the first violation.  The engine
    derives the same set from the quality HISTOGRAM (full levels +
    boundary prefix) — this pin is the equivalence proof on adversarial
    tie-heavy corpora, including empty docs (quality 0, zero tokens)."""
    from pulsar_pekko_streams_example_spark.operators.textstats import STOPWORDS
    from pulsar_pekko_streams_example_spark.plans.data_queries import (
        BUDGET_PERMILLE,
        _token_budget_selection,
    )

    def feats(t):
        w = _py_tokens(t)
        tc = len(w)
        stops = sum(1 for x in w if x in STOPWORDS)
        qm = (
            4 * min(tc, 100)
            + (300 * len(set(w))) // max(tc, 1)
            + (300 * (tc - stops)) // max(tc, 1)
        )
        return tc, qm

    per_doc = [(i, s, *feats(t)) for i, (s, t) in enumerate(rows)]
    total = sum(tc for _, _, tc, _ in per_doc)
    budget = total * BUDGET_PERMILLE // 1000
    run, selected = 0, set()
    for i, s, tc, qm in sorted(per_doc, key=lambda r: (-r[3], r[0])):
        if run + tc > budget:
            break
        run += tc
        selected.add(i)
    want = {}
    for i, s, tc, qm in per_doc:
        d = want.setdefault(s, [0, 0, 0, 0])
        d[0] += 1; d[1] += tc
        if i in selected:
            d[2] += 1; d[3] += tc

    docs = spark.createDataFrame(
        [(i, t, s) for i, (s, t) in enumerate(rows)],
        "doc_id long, text string, source string",
    )
    got = {
        r.source: [r.docs_total, r.tokens_total, r.docs_selected, r.tokens_selected]
        for r in _token_budget_selection(docs).collect()
    }
    assert got == want, (rows, got, want)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(rows=st.lists(
    st.tuples(
        st.sampled_from(["s0", "s1", "s2"]),
        st.lists(
            st.sampled_from(["the", "a", "cat", "dog", "ran", "far", "zz", "qq"]),
            min_size=1, max_size=8,
        ).map(" ".join),
    ),
    min_size=2, max_size=12,
))
def test_quantile_normalization_matches_python_reference(spark, rows):
    """quality_quantile_normalization vs an independent Python empirical-CDF
    reference (midpoint positions, min-global-level inverse CDF), plus the
    identity invariant: a single-source corpus must normalize to ITSELF
    (mean_norm == mean_raw, zero shift) — the fixed point any correct
    distribution alignment has."""
    from pulsar_pekko_streams_example_spark.operators.textstats import STOPWORDS
    from pulsar_pekko_streams_example_spark.plans.data_queries import (
        _quality_quantile_normalization,
    )

    def qm_of(t):
        w = _py_tokens(t)
        tc = len(w)
        stops = sum(1 for x in w if x in STOPWORDS)
        return (
            4 * min(tc, 100)
            + (300 * len(set(w))) // max(tc, 1)
            + (300 * (tc - stops)) // max(tc, 1)
        )

    docs_py = [(s, qm_of(t)) for s, t in rows]
    all_q = sorted(q for _, q in docs_py)
    N = len(all_q)

    def norm_of(src, q):
        grp = sorted(x for s2, x in docs_py if s2 == src)
        below = sum(1 for x in grp if x < q)
        cnt = sum(1 for x in grp if x == q)
        n_src = len(grp)
        for v in sorted(set(all_q)):
            gcum = sum(1 for x in all_q if x <= v)
            if gcum * 2 * n_src >= (2 * below + cnt) * N:
                return v
        raise AssertionError("inverse CDF must resolve")

    want = {}
    for src in {s for s, _ in docs_py}:
        grp = [(q, norm_of(src, q)) for s2, q in docs_py if s2 == src]
        n = len(grp)
        want[src] = (
            n,
            sum(q for q, _ in grp) // n,
            sum(v for _, v in grp) // n,
            max(abs(v - q) for q, v in grp),
        )

    docs = spark.createDataFrame(
        [(i, t, s) for i, (s, t) in enumerate(rows)],
        "doc_id long, text string, source string",
    )
    got = {
        r.source: (r.docs, r.mean_raw_milli, r.mean_norm_milli, r.max_shift_milli)
        for r in _quality_quantile_normalization(docs).collect()
    }
    assert got == want, (rows, got, want)

    # identity fixed point: one source == the pool
    single = spark.createDataFrame(
        [(i, t, "only") for i, (_, t) in enumerate(rows)],
        "doc_id long, text string, source string",
    )
    r = _quality_quantile_normalization(single).collect()[0]
    assert r.mean_norm_milli == r.mean_raw_milli and r.max_shift_milli == 0, r


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(order=st.lists(st.sampled_from(["s0", "s1", "s2"]), min_size=2, max_size=14),
       gap_at=st.integers(min_value=0, max_value=13))
def test_order_mixing_audit_matches_python_walk(spark, order, gap_at):
    """order_mixing_audit vs a direct Python adjacency walk on orders with
    REAL clumping (the standard corpus is round-robin, so same_next is all
    zeros there — this pin covers the non-zero paths: long runs, id gaps
    dropping an adjacency, single-doc sources yielding NULL clump)."""
    # inject one id gap: ids are 0..n-1 except `gap_at` shifts by +1 after it
    ids = []
    nxt = 0
    for i, _ in enumerate(order):
        if i == gap_at:
            nxt += 1  # hole: doc_id jumps, dropping one adjacency
        ids.append(nxt)
        nxt += 1
    docs = spark.createDataFrame(
        [(ids[i], f"text {i}", s) for i, s in enumerate(order)],
        "doc_id long, text string, source string",
    )
    from pulsar_pekko_streams_example_spark.plans.data_queries import (
        _order_mixing_audit,
    )

    idset = dict(zip(ids, order))
    n = len(order)
    want = {}
    for s in set(order):
        n_s = sum(1 for x in order if x == s)
        pairs = [(i, idset[i + 1]) for i in ids if (i + 1) in idset and idset[i] == s]
        same = sum(1 for _, nsrc in pairs if nsrc == s)
        np = len(pairs)
        if np == 0:
            continue  # no adjacency rows -> no output row for this source
        obs = same * 1000 // np
        exp = (n_s - 1) * 1000 // max(n - 1, 1)
        clump = (
            None if (n_s - 1) * np == 0
            else same * 1000 * max(n - 1, 1) // ((n_s - 1) * np)
        )
        want[s] = (n_s, np, same, obs, exp, clump)
    got = {
        r.source: (r.docs, r.next_pairs, r.same_next_pairs,
                   r.observed_same_permille, r.expected_same_permille,
                   r.clump_milli)
        for r in _order_mixing_audit(docs).collect()
    }
    assert got == want, (order, gap_at, got, want)


def test_embedding_dim_profile_finite_count_symmetry(spark):
    """ADVICE r14: n counts FINITE components only, symmetric with the
    decimal-guarded sums — a NaN/Inf component dilutes neither mean nor
    var — and an ALL-non-finite dimension reports n=0 with NULL moments
    (not an ANSI zero-division)."""
    import math

    from pulsar_pekko_streams_example_spark.plans.cluster_queries import (
        _embedding_dim_profile,
    )

    nan, inf = float("nan"), float("inf")
    emb = spark.createDataFrame(
        [
            (0, [1.0, nan, nan]),
            (1, [3.0, inf, nan]),
            (2, [5.0, 7.0, nan]),
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {r.dim: r for r in _embedding_dim_profile(emb).collect()}
    assert rows[1].n == 3 and rows[1].mean == 3.0 and rows[1].var == 35.0 / 3 - 9.0
    # dim 2: one Inf component must not dilute the finite mean (7.0, n=1)
    assert rows[2].n == 1 and rows[2].mean == 7.0 and rows[2].var == 0.0
    # dim 3: all components non-finite -> n=0, NULL moments, NULL extrema
    r3 = rows[3]
    assert r3.n == 0
    assert r3.mean is None and r3.var is None
    assert r3.min_x is None and r3.max_x is None
    assert r3.sum_x is None or math.isnan(r3.sum_x) is False


def test_ann_ivf_recall_report_cross_validates_the_ivf_path(spark):
    """The IVF recall ledger vs the independent ann_ivf_topk dataflow: at
    every nprobe p, found@p must EQUAL the exact-pair mass reachable
    through ann_ivf_topk's own candidate generation at that nprobe (k
    large enough to keep every candidate), the curve must be monotone
    non-decreasing in nprobe, and found+missed must tile exact_pairs."""
    from pulsar_pekko_streams_example_spark.operators import similarity
    from pulsar_pekko_streams_example_spark.plans import REGISTRY, all_queries
    from pulsar_pekko_streams_example_spark.plans.data_queries import (
        ANN_K,
        ANN_QUERY_FILTER,
        IVF_RECALL_MAX_PROBES,
    )
    from pulsar_pekko_streams_example_spark.plans.registry import REGISTRY

    all_queries()
    sf = "/root/testdata/sf0.001"
    rows = sorted(
        REGISTRY["ann_ivf_recall_report"].build(spark, sf).collect(),
        key=lambda r: r.nprobe,
    )
    assert [r.nprobe for r in rows] == list(range(1, IVF_RECALL_MAX_PROBES + 1))
    assert all(r.found + r.missed == r.exact_pairs for r in rows)
    assert all(a.found <= b.found for a, b in zip(rows, rows[1:]))
    assert rows[0].exact_pairs > 0, "fixture must produce ground-truth pairs"
    assert rows[-1].found > 0, "recall must be nonzero by max nprobe"

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, ANN_QUERY_FILTER, ANN_K).collect()
    }
    for p in (1, similarity.IVF_NPROBE, IVF_RECALL_MAX_PROBES):
        cand = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ann_ivf_topk(
                emb, ANN_QUERY_FILTER, k=10**6, nprobe=p
            ).collect()
        }
        want = len(exact & cand)
        got = next(r.found for r in rows if r.nprobe == p)
        assert got == want, (p, got, want)


def test_ann_pq_recall_report_matches_set_intersection(spark):
    """The PQ recall ledger vs a Python set intersection of the two
    registry top-k queries it claims to compare."""
    from pulsar_pekko_streams_example_spark.plans import REGISTRY, all_queries

    all_queries()
    sf = "/root/testdata/sf0.001"
    row = REGISTRY["ann_pq_recall_report"].build(spark, sf).collect()[0]
    exact = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_cosine_topk"].build(spark, sf).collect()
    }
    pq = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_pq_adc_topk"].build(spark, sf).collect()
    }
    assert row.exact_pairs == len(exact) > 0
    assert row.pq_found == len(exact & pq)
    assert row.pq_missed == len(exact - pq)
    assert row.recall_micro == 1000000 * len(exact & pq) // len(exact)


def test_training_order_generate_passes_its_own_audit_on_clumped_corpus(spark):
    """The audit->remediate arc, closed: a fully source-SORTED corpus
    (worst-case clumping, clump_milli >> 1000 for every source) run
    through training_order_generate yields an order whose own audit shows
    clump_milli <= ~1000 everywhere — the stride interleave paces each
    source evenly, which is at least as well-mixed as uniform random.
    Also pins the output contract: intra_rank is a dense permutation of
    1..n_s per source and ord_key lies in (0, 1)."""
    from pulsar_pekko_streams_example_spark.plans.data_queries import (
        _order_mixing_audit,
        _training_order_generate,
    )

    rows = (
        [(i, "t", "en", "A", 1) for i in range(600)]
        + [(600 + i, "t", "en", "B", 1) for i in range(300)]
        + [(900 + i, "t", "en", "C", 1) for i in range(100)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    raw_audit = {r.source: r for r in _order_mixing_audit(docs).collect()}
    assert all(r.clump_milli > 1400 for r in raw_audit.values()), {
        s: r.clump_milli for s, r in raw_audit.items()
    }

    gen = _training_order_generate(docs).collect()
    n_s = {"A": 600, "B": 300, "C": 100}
    per = {}
    for r in gen:
        per.setdefault(r.source, []).append(r)
        assert 0.0 < r.ord_key < 1.0, r
    for s, rs in per.items():
        assert sorted(x.intra_rank for x in rs) == list(range(1, n_s[s] + 1))

    # renumber densely in the generated order and re-audit
    ordered = sorted(gen, key=lambda r: (r.ord_key, r.source, r.doc_id))
    redocs = spark.createDataFrame(
        [(i, "t", "en", r.source, 1) for i, r in enumerate(ordered)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    gen_audit = {r.source: r for r in _order_mixing_audit(redocs).collect()}
    for s, r in gen_audit.items():
        assert r.clump_milli <= 1100, (s, r.clump_milli)
        assert r.clump_milli < raw_audit[s].clump_milli, s


def test_cross_corpus_leak_report_matches_crafted_provenance(spark, tmp_path):
    """Leak attribution on a corpus with KNOWN cross-source duplicate
    structure: a batch doc leaking from two standing sources counts
    against each; distinct-fp and permille accounting are exact; clean
    sources emit no row."""
    import shutil as _sh

    from pulsar_pekko_streams_example_spark.plans import REGISTRY, all_queries
    from tests.conftest import SF_SMOKE

    all_queries()
    base = tmp_path / "leak_sf"
    base.mkdir()
    for t in "region nation customer supplier part orders lineitem events embeddings".split():
        _sh.copyfile(f"{SF_SMOKE}/{t}.parquet", str(base / f"{t}.parquet"))
    docs = [
        (1, "x", "en", "A", 1),
        (2, "y", "en", "A", 1),
        (3, "x", "en", "B", 1),
        (4, "z", "en", "B", 1),
        (5, "w", "en", None, 1),   # standing corpus with NULL source name
        (6, "q", "en", "C", 1),    # standing source with no leaks
        (9, "x", "en", "new", 1),  # leaks from A AND B
        (19, "z", "en", "new", 1),  # leaks from B
        (29, "w", "en", "new", 1),  # leaks from the NULL-named source
        (39, "fresh", "en", "new", 1),  # unique
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(base / "documents.parquet"))

    out = {
        r.standing_source: r
        for r in REGISTRY["cross_corpus_leak_report"].build(spark, str(base)).collect()
    }
    assert set(out) == {"A", "B", "C", None}
    assert (out["A"].docs_leaked, out["A"].fps_leaked) == (1, 1)
    assert (out["B"].docs_leaked, out["B"].fps_leaked) == (2, 2)
    assert (out[None].docs_leaked, out[None].fps_leaked) == (1, 1)
    # a clean standing source still reports — zero-leak, not absent
    assert (out["C"].docs_leaked, out["C"].fps_leaked) == (0, 0)
    for r in out.values():
        assert r.batch_docs == 4
        assert r.leak_permille == r.docs_leaked * 1000 // 4


def test_ann_pq_refine_dominates_adc_recall(spark):
    """IVFADC+R contract: the refined top-k is a subset of the ADC
    shortlist; any exact top-k neighbor surviving the shortlist lands in
    the refined top-k (at most k-1 vectors beat it globally), so refined
    recall@k >= plain-ADC recall@k; and the refined ranking equals the
    exact-cosine ranking restricted to the shortlist."""
    from pulsar_pekko_streams_example_spark.operators import similarity
    from pulsar_pekko_streams_example_spark.plans import REGISTRY, all_queries
    from pulsar_pekko_streams_example_spark.plans.data_queries import (
        ANN_K,
        ANN_QUERY_FILTER,
        PQ_REFINE_R,
    )

    all_queries()
    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    refined = REGISTRY["ann_pq_refine_topk"].build(spark, sf).collect()
    short = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_pq_adc_topk(
            emb, ANN_QUERY_FILTER, PQ_REFINE_R
        ).collect()
    }
    assert {(r.query_id, r.neighbor_id) for r in refined} <= short
    exact = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_cosine_topk"].build(spark, sf).collect()
    }
    adc = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_pq_adc_topk"].build(spark, sf).collect()
    }
    ref = {(r.query_id, r.neighbor_id) for r in refined}
    assert len(exact & ref) >= len(exact & adc)
    # every surviving exact neighbor is in the refined set
    assert (exact & short) <= ref
    # per query: dense ranks 1..k, descending cosine
    per = {}
    for r in refined:
        per.setdefault(r.query_id, []).append(r)
    for q, rs in per.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        cos = [r.cosine for r in rs]
        assert cos == sorted(cos, reverse=True)


def test_ann_ivfadc_equals_full_adc_restricted_to_probed_lists(spark):
    """The composed index vs its two parents, stated directly: per query,
    ann_ivfadc_topk must equal the FULL-corpus ADC ranking (ADC distance
    and tie-break identical to ann_pq_adc_topk) restricted to the IVF
    probed-list candidate set (identical to ann_ivf_topk's candidate
    generation at the same nprobe)."""
    from pulsar_pekko_streams_example_spark.operators import similarity
    from pulsar_pekko_streams_example_spark.plans import REGISTRY, all_queries
    from pulsar_pekko_streams_example_spark.plans.data_queries import (
        ANN_K,
        ANN_QUERY_FILTER,
    )

    all_queries()
    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    got = {}
    for r in REGISTRY["ann_ivfadc_topk"].build(spark, sf).collect():
        got.setdefault(r.query_id, []).append(r)
    # full ADC ranking over the whole corpus (k = corpus size)
    adc_all = {}
    for r in similarity.ann_pq_adc_topk(emb, ANN_QUERY_FILTER, 10**6).collect():
        adc_all[(r.query_id, r.neighbor_id)] = r.adc_dist
    # IVF candidate set at the same nprobe (k = corpus size keeps them all)
    cand = {}
    for r in similarity.ann_ivf_topk(emb, ANN_QUERY_FILTER, 10**6).collect():
        cand.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert got, "composed index must return rows on the standard corpus"
    for q, rows in got.items():
        rows.sort(key=lambda r: r.rnk)
        want = sorted(
            cand.get(q, set()),
            key=lambda n: (
                adc_all[(q, n)] is None,
                adc_all[(q, n)] if adc_all[(q, n)] is not None else 0.0,
                n,
            ),
        )[: ANN_K]
        assert [r.neighbor_id for r in rows] == want, (q, rows, want)
        for r in rows:
            assert r.adc_dist == adc_all[(q, r.neighbor_id)], r


def test_mixture_resample_manifest_matches_python_reference(spark):
    """The resample manifest vs an independent Python replay of its spec
    on a deliberately imbalanced corpus (9:1 char mass, so sqrt-temperature
    targets force REAL downsampling of the big source and a shortfall on
    the small one): per-source targets, the exact hash-threshold survivor
    set, chars, shortfall and keep rate all equal the reference."""
    import math

    from pulsar_pekko_streams_example_spark.plans.data_queries import (
        ORDER_SALT_A,
        ORDER_SALT_P,
        _mixture_resample_manifest,
    )

    rows = [(i, "t", "en", "big", 100) for i in range(900)] + [
        (1000 + i, "t", "en", "small", 100) for i in range(100)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )

    def salt(doc_id):
        return ((doc_id % ORDER_SALT_P) * ORDER_SALT_A + 17) % ORDER_SALT_P

    srcs = {"big": [r for r in rows if r[3] == "big"],
            "small": [r for r in rows if r[3] == "small"]}
    weights = {s: math.sqrt(sum(r[4] for r in rs)) for s, rs in srcs.items()}
    total_w = sum(weights.values())
    n_total = len(rows)
    want = {}
    for s, rs in srcs.items():
        share = weights[s] / total_w
        target = math.floor(share * n_total)
        sel = [r for r in rs if salt(r[0]) * len(rs) < target * ORDER_SALT_P]
        want[s] = (
            len(rs),
            target,
            len(sel),
            sum(r[4] for r in sel),
            max(target - len(rs), 0),
            len(sel) * 1000 // len(rs),
        )
    got = {
        r.source: (
            r.n_docs,
            r.target_docs,
            r.selected_docs,
            r.selected_chars,
            r.shortfall_docs,
            r.keep_permille,
        )
        for r in _mixture_resample_manifest(docs).collect()
    }
    assert got == want, (got, want)
    # the imbalance actually exercised both branches
    assert got["big"][2] < got["big"][0], "big source must be downsampled"
    assert got["small"][4] > 0, "small source must report a shortfall"


def test_ann_method_recall_matrix_is_consistent_with_per_method_reports(spark):
    """The matrix must agree with the standalone ledgers and contracts it
    summarizes: the pq_adc row equals ann_pq_recall_report, every row
    tiles exact_pairs, refine dominates plain ADC, and each row's found
    equals a Python set intersection of the two standing top-k queries."""
    from pulsar_pekko_streams_example_spark.plans import REGISTRY, all_queries

    all_queries()
    sf = "/root/testdata/sf0.001"
    rows = {
        r.method: r
        for r in REGISTRY["ann_method_recall_matrix"].build(spark, sf).collect()
    }
    assert set(rows) == {
        "lsh", "ivf", "pq_adc", "ivfadc", "pq_refine", "ivf_trained",
        "ivfadc_residual", "ivfadc_trained", "pq_trained",
        "ivfadc_residual_refine",
    }
    exact = {
        (r.query_id, r.neighbor_id)
        for r in REGISTRY["ann_cosine_topk"].build(spark, sf).collect()
    }
    for m, qname in (
        ("lsh", "ann_lsh_topk"),
        ("ivf", "ann_ivf_topk"),
        ("pq_adc", "ann_pq_adc_topk"),
        ("ivfadc", "ann_ivfadc_topk"),
        ("pq_refine", "ann_pq_refine_topk"),
        ("ivf_trained", "ann_ivf_trained_topk"),
        ("ivfadc_residual", "ann_ivfadc_residual_topk"),
        ("ivfadc_trained", "ann_ivfadc_trained_topk"),
        ("pq_trained", "ann_pq_trained_topk"),
        ("ivfadc_residual_refine", "ann_ivfadc_residual_refine_topk"),
    ):
        r = rows[m]
        assert r.exact_pairs == len(exact)
        assert r.found + r.missed == r.exact_pairs
        topk = REGISTRY[qname].build(spark, sf).collect()
        got = {(x.query_id, x.neighbor_id) for x in topk}
        # ADVICE r16 invariant pin: the round-16 single-pass matrix rewrite
        # (ONE inner join + groupBy(method) count replacing ten per-method
        # LEFT JOIN global aggregates) is equivalent ONLY while every
        # method's top-k is DISTINCT on (query_id, neighbor_id) — each path
        # ends in a row_number <= k filter today, but that is convention; a
        # future method added without dedup would inflate `found`
        # differently than the old shape.  Assert it on the same frames the
        # matrix unions.
        assert len(got) == len(topk), (
            f"{qname} top-k has duplicate (query_id, neighbor_id) pairs — "
            "the ann_method_recall_matrix single-pass rewrite requires "
            "per-method distinctness"
        )
        assert r.found == len(exact & got), (m, r.found, len(exact & got))
    pq_row = REGISTRY["ann_pq_recall_report"].build(spark, sf).collect()[0]
    assert (rows["pq_adc"].found, rows["pq_adc"].missed) == (
        pq_row.pq_found,
        pq_row.pq_missed,
    )
    assert rows["pq_refine"].found >= rows["pq_adc"].found


def test_shard_plan_manifest_matches_global_prefix_sum(spark):
    """The two-pass (bucket totals + within-bucket window) prefix sum must
    EQUAL a naive Python global cumulative sum over the same total order —
    on a corpus with duplicate ids, a NULL text (coalesced tie-break), and
    empty docs.  Shard accounting: every doc lands in exactly one shard,
    token totals tile the corpus, and no shard except possibly the last
    ends more than one doc past the budget boundary."""
    from pulsar_pekko_streams_example_spark.plans.data_queries import (
        ORDER_SALT_A,
        ORDER_SALT_P,
        SHARD_TOKENS,
        _shard_plan_manifest,
    )

    rows = (
        [(i, " ".join(["w"] * (7 + i % 90)), "en", "web", 1) for i in range(400)]
        + [(1000 + i, " ".join(["v"] * 50), "en", "books", 1) for i in range(200)]
        + [(5, None, "en", "web", 1), (5, "dup id text", "en", "web", 1),
           (7, "", "en", "books", 1)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )

    def salt(i):
        return ((i % ORDER_SALT_P) * ORDER_SALT_A + 17) % ORDER_SALT_P

    def toks(t):
        return 0 if t is None else len([w for w in t.split(" ") if w])

    per_src = {}
    for r in rows:
        per_src.setdefault(r[3], []).append(r)
    keyed = []
    for s, rs in per_src.items():
        rs = sorted(rs, key=lambda r: (salt(r[0]), r[0], toks(r[1])))
        n = len(rs)
        for i, r in enumerate(rs):
            keyed.append(((2 * i + 1) / (2 * n), s, r[0], toks(r[1])))
    keyed.sort(key=lambda k: (k[0], k[1], k[2], k[3]))
    want = {}
    cum = 0
    for ord_key, s, doc_id, tc in keyed:
        shard = cum // SHARD_TOKENS
        cum += tc
        d, t, srcs = want.get(shard, (0, 0, set()))
        srcs = set(srcs) | {s}
        want[shard] = (d + 1, t + tc, srcs)
    got = {
        r.shard_id: (r.docs, r.tokens, r.sources)
        for r in _shard_plan_manifest(docs).collect()
    }
    assert got == {k: (d, t, len(s)) for k, (d, t, s) in want.items()}, (got, want)
    assert sum(t for _, t, _ in got.values()) == sum(tc for *_, tc in keyed)
    assert sum(d for d, _, _ in got.values()) == len(rows)


def _clustered_hostile_embeddings(spark):
    """The clustered corpus hostile to the STRIDED quantizer (VERDICT r15
    task 1's pin corpus): 16 tight clusters of 32 members each, but every
    strided seed (vec_id % 64 == 7 -> vec_id % 16 == 7) falls in the SAME
    cluster, so the untrained quantizer starts from eight near-identical
    centroids and partitions the other 15 clusters by jitter noise.  Jitter
    is a multiplicative-hash lattice (deterministic, engine-replicable)."""
    DIM, N, NC, SIG, JIT = 64, 512, 16, 3.0, 0.06

    def vec(i):
        c = i % NC
        base = [0.0] * DIM
        base[2 * c] = SIG
        base[2 * c + 1] = SIG * 0.7
        for d in range(DIM):
            h = ((i * 2654435761 + d * 40503 + 17) % 1000003) % 23
            base[d] += (h - 11) * JIT
        return base

    return spark.createDataFrame(
        [(i, vec(i), i % NC) for i in range(N)],
        "vec_id bigint, embedding array<float>, label int",
    )


def test_trained_ivf_recall_dominates_strided_on_clustered_corpus(spark):
    """VERDICT r15 task 1's done-bar: on a clustered corpus whose strided
    seeds all collapse into one cluster, the Lloyd's-TRAINED quantizer's
    recall@k must strictly beat the strided quantizer's at the same nprobe
    (measured 218 vs 204 of 260 exact pairs on this fixed corpus).  51
    queries so the mean effect, not per-query variance, decides."""
    from pulsar_pekko_streams_example_spark.operators import similarity

    emb = _clustered_hostile_embeddings(spark)
    qf, k = "vec_id % 10 = 0", 5
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk(emb, qf, k).collect()
    }
    strided = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_ivf_topk(emb, qf, k).collect()
    }
    trained = {
        (r.query_id, r.neighbor_id)
        for r in similarity.ann_ivf_trained_topk(emb, qf, k).collect()
    }
    assert len(exact) == 260  # 51 queries x 5, the non-degenerate baseline
    s_found, t_found = len(exact & strided), len(exact & trained)
    # the corpus is genuinely hostile (strided loses real recall) and
    # training genuinely recovers some of it
    assert s_found < len(exact), (s_found, len(exact))
    assert t_found > s_found, (t_found, s_found)


def test_trained_ivf_beats_strided_in_standard_recall_matrix(spark):
    """The shipped matrix's ivf_trained row must dominate-or-equal the ivf
    row on the standard corpus at the same nprobe — the published number a
    deployment reads to justify paying for quantizer training."""
    from pulsar_pekko_streams_example_spark.plans import REGISTRY, all_queries

    all_queries()
    rows = {
        r.method: r
        for r in REGISTRY["ann_method_recall_matrix"]
        .build(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert rows["ivf_trained"].recall_micro >= rows["ivf"].recall_micro, rows
    # the PQ half of quantizer training: the trained per-subspace codebook
    # must dominate-or-equal the strided one under the same ADC search
    assert rows["pq_trained"].recall_micro >= rows["pq_adc"].recall_micro, rows


def test_recall_matrix_query_gate_stays_in_binomial_envelope(spark):
    """The query_permille hash gate (scheduled-run pricing, VERDICT r15
    task 4): recall is a per-pair mean, so the gated estimate must sit
    within the 4-sigma binomial envelope of the full number, per method,
    while actually shrinking the exact ground-truth arm."""
    import math

    from pulsar_pekko_streams_example_spark.plans import all_queries
    from pulsar_pekko_streams_example_spark.plans.data_queries import (
        ann_method_recall_matrix,
    )

    all_queries()
    sf = "/root/testdata/sf0.001"
    full = {r.method: r for r in ann_method_recall_matrix(spark, sf).collect()}
    gated = {
        r.method: r
        for r in ann_method_recall_matrix(spark, sf, query_permille=500).collect()
    }
    assert set(gated) == set(full)
    for m, g in gated.items():
        f = full[m]
        assert 0 < g.exact_pairs < f.exact_pairs, (m, g.exact_pairs)
        p_f = f.recall_micro / 1e6
        p_g = g.recall_micro / 1e6
        envelope = 4 * math.sqrt(max(p_f * (1 - p_f), 0.25 / 2) / g.exact_pairs)
        assert abs(p_g - p_f) <= envelope, (m, p_g, p_f, envelope)


def test_residual_ivfadc_recall_dominates_raw_on_standard_corpus(spark):
    """VERDICT r15 task 2's done-bar: residual encoding (PQ over x - c(x),
    Jégou §VI complete) must recall at least as much as the raw-vector
    IVFADC under the same coarse quantizer, codebook budget, and nprobe on
    the standard corpus — residuals concentrate near the origin, so the
    same 16-entry codebook quantizes them with strictly less error.  Also
    pins the structural invariant that both paths search the SAME probed
    lists: every residual-path neighbor lives in a list the query probes."""
    from pulsar_pekko_streams_example_spark.operators import similarity
    from pulsar_pekko_streams_example_spark.plans import REGISTRY, all_queries

    all_queries()
    sf = "/root/testdata/sf0.001"
    rows = {
        r.method: r
        for r in REGISTRY["ann_method_recall_matrix"].build(spark, sf).collect()
    }
    assert (
        rows["ivfadc_residual"].recall_micro >= rows["ivfadc"].recall_micro
    ), rows
    # the refine stage can only help (shortlist-survivor guarantee)
    assert (
        rows["ivfadc_residual_refine"].recall_micro
        >= rows["ivfadc_residual"].recall_micro
    ), rows
    # structural: residual-path neighbors come only from probed lists
    from pulsar_pekko_streams_example_spark.sources.tables import load_table

    emb = load_table(spark, sf, "embeddings")
    assign = {
        (r.vec_id): r.cent_id
        for r in similarity.ivf_assignments(emb).collect()
    }
    probed = {}
    for r in (
        similarity.ivf_probe_ranks(emb, "vec_id % 100 = 0")
        .filter("pr <= 2")
        .collect()
    ):
        probed.setdefault(r.query_id, set()).add(r.cent_id)
    got = REGISTRY["ann_ivfadc_residual_topk"].build(spark, sf).collect()
    assert got, "residual IVFADC returned no rows on the standard corpus"
    for r in got:
        assert assign[r.neighbor_id] in probed[r.query_id], r


def test_corpus_snapshot_diff_on_crafted_two_version_corpus(spark):
    """VERDICT r15 task 7's done-bar: a crafted corpus covering every diff
    class — added (pm 8), removed (pm 9), changed (pm 7), unchanged, a
    DUPLICATED id (must collapse, never fan the full outer join out), a
    NULL-text doc in the changed class (sentinel fp in both versions =>
    reports unchanged), and a NULL source — checked against hand-computed
    per-source counts AND the DuckDB oracle."""
    import duckdb

    from pulsar_pekko_streams_example_spark.plans import REGISTRY, all_queries
    from pulsar_pekko_streams_example_spark.plans.data_queries import (
        _corpus_snapshot_diff,
    )

    all_queries()
    rows = [
        (1, "stays the same", "web", "en", 14),      # unchanged
        (7, "will be edited", "web", "en", 14),      # changed (pm 7)
        (17, None, "web", "en", 0),                  # pm 7 but NULL text -> unchanged
        (8, "new arrival", "books", "en", 11),       # added (pm 8)
        (9, "will be dropped", "books", "en", 15),   # removed (pm 9)
        (11, "dup id doc", "web", "en", 10),         # duplicated id:
        (11, "dup id doc prime", "web", "en", 16),   #   collapses via MIN fp
        (21, "null source doc", None, "en", 15),     # NULL-source unchanged
    ]
    docs = spark.createDataFrame(
        [(d, t, s, lang, n) for d, t, s, lang, n in rows],
        "doc_id long, text string, source string, lang string, n_chars long",
    ).select("doc_id", "text", "lang", "source", "n_chars")
    got = {
        r.source: (r.docs_v1, r.docs_v2, r.added, r.removed, r.changed,
                   r.unchanged, r.churn_permille)
        for r in _corpus_snapshot_diff(docs).collect()
    }
    want = {
        # web: ids 1 (unch), 7 (changed), 17 (NULL-text 'changed' -> unch),
        #      11 (dup, collapses, unch) => v1=4, v2=4, churn = 1000*1//4
        "web": (4, 4, 0, 0, 1, 3, 250),
        # books: 8 added, 9 removed => v1=1, v2=1, churn = 2000*... (1+1)*1000//1
        "books": (1, 1, 1, 1, 0, 0, 2000),
        None: (1, 1, 0, 0, 0, 1, 0),
    }
    assert got == want, (got, want)
    # and full oracle parity on the same crafted table
    import tempfile

    from pulsar_pekko_streams_example_spark.verify import compare

    with tempfile.TemporaryDirectory() as base:
        docs.coalesce(1).write.mode("overwrite").parquet(f"{base}/documents.parquet")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{base}/documents.parquet/*.parquet')"
        )
        spec = REGISTRY["corpus_snapshot_diff"]
        df = spec.build(spark, base)
        problems = compare(df, con.sql(spec.oracle))
        con.close()
        assert not problems, "; ".join(problems)


def test_decimal_cast_ties_resolve_identically_across_engines(spark):
    """Round-16 finding: Spark converts double -> DECIMAL(38,6) through the
    SHORTEST decimal repr (HALF_UP), DuckDB through the EXACT binary
    expansion — 182.7653145 rounded to 182.765315 vs 182.765314 and broke
    the trained-PQ ADC sums.  The _q6 pure-double pre-quantization must
    make dcast and sql_dcast agree bit-for-bit on tie-prone values, stay
    total on NaN/Inf/out-of-envelope, and leave large magnitudes to the
    final double cast."""
    import duckdb

    from pulsar_pekko_streams_example_spark.functions.numeric import (
        dcast,
        sql_dcast,
    )
    from pyspark.sql import functions as F

    vals = [
        182.7653145,   # THE tie that diverged pre-fix
        2.0000005, 0.1234565, 25.3814715, 1.0000015,
        -182.7653145, -2.0000005,            # negative ties: toward +inf both
        0.0, 1.0, 123.456789, 1e-7, -1e-7,
        8.9e9, 1e12, 1e30,                   # beyond the quantization bound
        float("nan"), float("inf"), float("-inf"), 1e35,  # totality
    ]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got_spark = [
        r.q for r in df.select(dcast(F.col("x")).alias("q")).collect()
    ]
    con = duckdb.connect()
    def lit(v):
        import math

        if math.isnan(v):
            return "CAST('NaN' AS DOUBLE)"
        if math.isinf(v):
            return f"CAST('{'-' if v < 0 else ''}Infinity' AS DOUBLE)"
        return f"CAST({v!r} AS DOUBLE)"

    got_duck = [
        con.sql(
            f"SELECT {sql_dcast('x')} FROM (SELECT {lit(v)} AS x)"
        ).fetchone()[0]
        for v in vals
    ]
    con.close()
    for v, s, d in zip(vals, got_spark, got_duck):
        if s is not None and abs(v) >= 9.0e9:
            # beyond the quantization bound the CONTRACT is absorption:
            # the decimals may differ in low digits (shortest-repr vs
            # exact-binary) but the final double cast erases it
            assert float(s) == float(d), (v, s, d)
        else:
            assert str(s) == str(d), (v, s, d)
    # the tie really lands where the contract says (toward +inf)
    import decimal as dec

    assert str(got_spark[0]) == "182.765315", got_spark[0]
    assert str(got_spark[5]) == "-182.765314", got_spark[5]
    # totality: NaN/Inf/1e35 are NULL, not errors
    assert got_spark[-4:] == [None, None, None, None]


def test_bloom_probe_never_false_negative_and_finds_real_dups(spark):
    """Bloom structural contract on a corpus with REAL cross-split
    duplicates: every standing-set member probing the filter must come
    back positive (a Bloom filter only over-approximates), so true_dups
    rows are all bloom-positive and false_negatives == 0; ledger columns
    must tile (positives = true dups found + false positives)."""
    from pulsar_pekko_streams_example_spark.plans import REGISTRY, all_queries

    all_queries()
    rows = [(i, f"standing doc number {i}", "en", "web", 20) for i in range(120)]
    # batch docs (pm 9): half duplicate a standing doc, half are fresh
    rows += [(9 + 10 * i, f"standing doc number {i}", "en", "web", 20) for i in range(6)]
    rows += [(69 + 10 * i, f"fresh arrival {i}", "en", "web", 15) for i in range(6)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as base:
        docs.coalesce(1).write.mode("overwrite").parquet(f"{base}/documents.parquet")
        r = REGISTRY["dedup_bloom_probe_report"].build(spark, base).collect()[0]
    assert r.false_negatives == 0, r
    assert r.true_dups >= 6, r   # the crafted dups flow standing -> batch
    assert r.bloom_positives == r.true_dups + r.false_positives, r
    assert 0 < r.bits_set <= 4096, r


def test_trained_recall_curve_cross_validates_matrix_and_dominates_late(spark):
    """ann_ivf_trained_recall_report must agree with the independently
    computed matrix at the default nprobe (one construction validates the
    other), be monotone in nprobe, and show the trained curve >= the
    strided curve at the maximum probe depth (probing every trained list
    reaches at least as many exact neighbors as probing every strided
    list reaches on this corpus)."""
    from pulsar_pekko_streams_example_spark.operators import similarity
    from pulsar_pekko_streams_example_spark.plans import REGISTRY, all_queries

    all_queries()
    sf = "/root/testdata/sf0.001"
    curve = sorted(
        REGISTRY["ann_ivf_trained_recall_report"].build(spark, sf).collect(),
        key=lambda r: r.nprobe,
    )
    assert all(a.found <= b.found for a, b in zip(curve, curve[1:])), curve
    matrix = {
        r.method: r
        for r in REGISTRY["ann_method_recall_matrix"].build(spark, sf).collect()
    }
    at_default = next(r for r in curve if r.nprobe == similarity.IVF_NPROBE)
    assert at_default.found == matrix["ivf_trained"].found, (
        at_default,
        matrix["ivf_trained"],
    )
    strided = sorted(
        REGISTRY["ann_ivf_recall_report"].build(spark, sf).collect(),
        key=lambda r: r.nprobe,
    )
    assert curve[-1].found >= strided[-1].found, (curve[-1], strided[-1])
