"""Sketch queries: count-min heavy hitters, Bloom-filter membership.

Both sketches are rebuilt identically by the DuckDB oracle (engine-portable
integer hashing), so estimates/false-positives match exactly — the sketch
behavior itself is under test, not just the happy path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_pekko_streams_example_spark.functions import sketches as SK
from pulsar_pekko_streams_example_spark.plans.registry import register
from pulsar_pekko_streams_example_spark.sources.tables import load_table

HH_THRESHOLD = 80
BLOOM_SEGMENT = "BUILDING"


def _duck_cms_sql() -> str:
    probe_union = " UNION ALL ".join(
        f"SELECT user_id AS k, CAST({j} AS BIGINT) AS j, "
        f"CAST({SK.cms_bucket(j, 'user_id')} AS BIGINT) AS bucket FROM events"
        for j in range(SK.CMS_DEPTH)
    )
    return f"""
        WITH probes AS ({probe_union}),
        grid AS (SELECT j, bucket, COUNT(*) AS cnt FROM probes GROUP BY j, bucket),
        keyprobes AS (SELECT DISTINCT k, j, bucket FROM probes),
        est AS (
          SELECT k, MIN(cnt) AS est
          FROM keyprobes JOIN grid USING (j, bucket) GROUP BY k
        ),
        exact AS (SELECT user_id AS k, COUNT(*) AS exact FROM events GROUP BY user_id)
        SELECT e.k AS user_id, e.est, x.exact
        FROM est e JOIN exact x ON e.k = x.k
        WHERE e.est >= {HH_THRESHOLD}
        """


@register(
    "cms_heavy_hitters",
    oracle=_duck_cms_sql(),
    doc="Count-min sketch (4×256 integer-hash grid) heavy hitters over "
    "events.user_id, with the exact count alongside to expose the "
    "one-sided overestimate.  Build is one map-combinable groupBy of "
    "fixed size — the sketch never grows with the data.",
    tags=("sketch", "agg"),
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    est = SK.cms_estimates(ev, "user_id")
    exact = ev.groupBy(F.col("user_id").alias("k")).agg(
        F.count(F.lit(1)).alias("exact")
    )
    return (
        est.join(exact, ["k"], "inner")
        .filter(F.col("est") >= HH_THRESHOLD)
        .select(F.col("k").alias("user_id"), "est", "exact")
    )


def _duck_bloom_sql() -> str:
    member_bits = " UNION ALL ".join(
        f"SELECT CAST({SK.bloom_bit(j, 'c_custkey')} AS BIGINT) AS bit "
        f"FROM customer WHERE c_mktsegment = '{BLOOM_SEGMENT}'"
        for j in range(SK.BLOOM_K)
    )
    cand_probes = " UNION ALL ".join(
        f"SELECT k, CAST({SK.bloom_bit(j, 'k')} AS BIGINT) AS bit FROM cand"
        for j in range(SK.BLOOM_K)
    )
    return f"""
        WITH bits AS (SELECT DISTINCT bit FROM ({member_bits})),
        cand AS (SELECT DISTINCT o_custkey AS k FROM orders),
        probes AS ({cand_probes}),
        hits AS (
          SELECT k, COUNT(*) AS bits_set
          FROM probes WHERE bit IN (SELECT bit FROM bits) GROUP BY k
        ),
        flags AS (
          SELECT c.k,
                 COALESCE(h.bits_set, 0) = {SK.BLOOM_K} AS in_bloom,
                 EXISTS (
                   SELECT 1 FROM customer m
                   WHERE m.c_custkey = c.k AND m.c_mktsegment = '{BLOOM_SEGMENT}'
                 ) AS actual_member
          FROM cand c LEFT JOIN hits h ON c.k = h.k
        )
        SELECT in_bloom, actual_member, COUNT(*) AS custkeys
        FROM flags GROUP BY 1, 2
        """


@register(
    "bloom_membership",
    oracle=_duck_bloom_sql(),
    doc="Bloom filter (k=5, m=8192) over one market segment's custkeys, "
    "probed by every ordering custkey — in_bloom × actual_member contingency "
    "exposes the false-positive mass.  At scale the filter replaces a "
    "broadcast semi-join of raw keys with an m/8-byte bitset.",
    tags=("sketch", "join"),
)
def bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    members = cust.filter(F.col("c_mktsegment") == BLOOM_SEGMENT)
    bits = SK.bloom_build_bits(members, "c_custkey")
    cand = orders.select(F.col("o_custkey").alias("o_custkey")).distinct()
    flags = SK.bloom_probe(cand, "o_custkey", bits)
    actual = members.select(F.col("c_custkey").alias("k")).withColumn(
        "actual_member", F.lit(True)
    )
    return (
        flags.join(actual, ["k"], "left")
        .withColumn("actual_member", F.coalesce("actual_member", F.lit(False)))
        .groupBy("in_bloom", "actual_member")
        .agg(F.count(F.lit(1)).alias("custkeys"))
    )


# ---------------------------------------------------------------------------
# Fixed-bin quantile sketch: deterministic p50/p95/p99 per event_type
# ---------------------------------------------------------------------------
QSK_BINS = 256
QSK_WIDTH = 4  # covers [0, 1024); higher values saturate into the top bin


def _qsk_bin(dialect: str) -> str:
    """Total bin expression: clamp the DOUBLE into [0, {BINS*WIDTH - 1}]
    BEFORE the int64 cast — a raw ``CAST(FLOOR(value / 4) AS BIGINT)``
    ANSI-errors on 1e300 / ±Inf in Spark and errors in DuckDB too.
    Negative values (and -Inf) clamp to bin 0, values >= 1024 (and +Inf)
    saturate into the top bin — the documented histogram envelope; NaN and
    NULL carry no magnitude and are excluded by the caller's filter (the
    clamp itself must not see NaN: GREATEST/LEAST NaN ordering is an
    engine-semantics trap).  The expression is dialect-neutral today; the
    assert keeps call sites honest if a divergence ever needs one."""
    assert dialect in ("spark", "duckdb"), dialect
    hi = float(QSK_BINS * QSK_WIDTH - 1)  # 1023.0 -> floor(/4) <= 255
    clamped = (
        f"LEAST(CAST({hi} AS DOUBLE), GREATEST(CAST(0.0 AS DOUBLE), value))"
    )
    return f"CAST(FLOOR({clamped} / {QSK_WIDTH}) AS BIGINT)"


def _qsk_threshold(pct: int, dialect: str) -> str:
    """Rank of the pct-quantile: ceil(n * pct / 100) in pure int64.

    Integer-divide FIRST, then compare cum >= rank.  (An earlier scaled
    compare ``cum*100 >= n*pct+99`` was off by one whenever n*pct was a
    multiple of 100 — found by the hypothesis bound-property test, invisible
    to the oracle because both dialects shared the same expression.)"""
    div = "div" if dialect == "spark" else "//"
    return f"((n * {pct} + 99) {div} 100)"


@register(
    "quantile_sketch_value",
    oracle=f"""
        WITH binned AS (
          SELECT event_type,
                 {_qsk_bin('duckdb')} AS bin,
                 COUNT(*) AS c
          FROM events
          WHERE value IS NOT NULL AND NOT isnan(value)
          GROUP BY 1, 2
        ),
        cum AS (
          SELECT event_type, bin, c,
                 SUM(c) OVER (PARTITION BY event_type ORDER BY bin
                              ROWS UNBOUNDED PRECEDING) AS cum,
                 SUM(c) OVER (PARTITION BY event_type) AS n
          FROM binned
        )
        SELECT event_type,
               CAST(MAX(n) AS BIGINT) AS n,
               CAST(MIN(CASE WHEN cum >= {_qsk_threshold(50, 'duckdb')} THEN (bin + 1) * {QSK_WIDTH} END) AS BIGINT) AS est_p50,
               CAST(MIN(CASE WHEN cum >= {_qsk_threshold(95, 'duckdb')} THEN (bin + 1) * {QSK_WIDTH} END) AS BIGINT) AS est_p95,
               CAST(MIN(CASE WHEN cum >= {_qsk_threshold(99, 'duckdb')} THEN (bin + 1) * {QSK_WIDTH} END) AS BIGINT) AS est_p99
        FROM cum GROUP BY event_type
        """,
    doc="Mergeable fixed-bin quantile sketch (the equi-width-histogram cousin "
    "of t-digest): 256 bins of width 4 per group, map-side combinable like "
    "CMS/HLL/Bloom — state is a constant-size int vector regardless of "
    "corpus size, vs value_percentiles' exact global sort.  Estimates are "
    "bin upper edges; error is bounded by the bin width and the top bin "
    "saturates (documented).  The quantile pick (smallest bin whose "
    "cumulative count reaches ceil(q·n)) is pure int64 arithmetic — "
    "engine-exact, no floating-point thresholds.  Hostile-value envelope: "
    "negative values and -Inf clamp to bin 0, >= 1024 and +Inf saturate "
    "the top bin, NaN/NULL carry no magnitude and are excluded (from n "
    "too) — the double clamps BEFORE the int64 cast, so 1e300 cannot "
    "ANSI-abort the job.",
    tags=("sketch", "quantile", "scale-default"),
)
def quantile_sketch_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    binned = (
        ev.filter(F.col("value").isNotNull() & ~F.isnan("value"))
        .groupBy("event_type", F.expr(_qsk_bin("spark")).alias("bin"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("event_type")
    cum = binned.select(
        "event_type",
        "bin",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(wn).alias("n"),
    )
    est = lambda pct: F.min(  # noqa: E731
        F.when(
            F.col("cum") >= F.expr(_qsk_threshold(pct, "spark")),
            (F.col("bin") + 1) * QSK_WIDTH,
        )
    ).cast("bigint")
    return cum.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n"),
        est(50).alias("est_p50"),
        est(95).alias("est_p95"),
        est(99).alias("est_p99"),
    )


# ---------------------------------------------------------------------------
# Join-cardinality estimation from per-bucket count sketches
# ---------------------------------------------------------------------------
JCE_BUCKETS = 1024


@register(
    "join_cardinality_estimate",
    oracle=f"""
        WITH a AS (
          -- canonical (pmod) bucket, the twin of Spark's F.pmod: C-style %
          -- hands negative ids negative buckets and the sides would bucket
          -- the SAME hostile id differently
          SELECT ((user_id % {JCE_BUCKETS}) + {JCE_BUCKETS}) % {JCE_BUCKETS} AS b,
                 COUNT(*) AS ca
          FROM events GROUP BY 1
        ),
        c AS (
          SELECT ((c_custkey % {JCE_BUCKETS}) + {JCE_BUCKETS}) % {JCE_BUCKETS} AS b,
                 COUNT(*) AS cc
          FROM customer GROUP BY 1
        ),
        est AS (
          SELECT CAST(SUM(ca * cc) AS BIGINT) AS estimated_rows
          FROM a JOIN c USING (b)
        ),
        ex AS (
          SELECT COUNT(*) AS exact_rows
          FROM events e JOIN customer cu ON e.user_id = cu.c_custkey
        )
        SELECT estimated_rows, exact_rows,
               CAST(((estimated_rows - exact_rows) * 1000)
                    // NULLIF(exact_rows, 0) AS BIGINT)
                 AS overestimate_permille
        FROM est CROSS JOIN ex
        """,
    doc="Sketch-based join-size estimation — what a cost-based optimizer "
    "does before committing to a join strategy: each side collapses to a "
    "bucketed key-count table (bounded {JCE_BUCKETS} rows regardless of "
    "input size), and the inner product of the two count vectors upper-"
    "bounds the true join cardinality (within-bucket cross terms only "
    "overcount).  The exact join runs alongside to publish the "
    "overestimate; at 100 TB only the estimate side is affordable and the "
    "sketches are map-side-combinable partial aggregates.  All arithmetic "
    "is exact integers.",
    tags=("sketch", "join", "cardinality", "added-r3"),
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    a = ev.groupBy(F.pmod("user_id", F.lit(JCE_BUCKETS)).alias("b")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    c = cust.groupBy(F.pmod("c_custkey", F.lit(JCE_BUCKETS)).alias("b")).agg(
        F.count(F.lit(1)).alias("cc")
    )
    est = (
        a.join(c, "b")
        .agg(F.sum(F.col("ca") * F.col("cc")).cast("long").alias("estimated_rows"))
    )
    exact = (
        ev.join(cust, ev["user_id"] == cust["c_custkey"])
        .agg(F.count(F.lit(1)).alias("exact_rows"))
    )
    return (
        est.crossJoin(F.broadcast(exact))
        .select(
            "estimated_rows",
            "exact_rows",
            # NULLIF: a corpus whose sides share no key (exact_rows = 0)
            # reports NULL instead of ANSI-dividing by zero
            F.expr(
                "CAST(((estimated_rows - exact_rows) * 1000) "
                "div NULLIF(exact_rows, 0) AS BIGINT)"
            ).alias("overestimate_permille"),
        )
    )


# ---------------------------------------------------------------------------
# Bitmap index — EXACT distinct counts via bit_or/bit_count words
# ---------------------------------------------------------------------------
DAY_US = 86_400_000_000
BITMAP_WORD = 63  # bits per word: shifts stay < 63, no signed-overflow UB


def _bm_word(dialect: str) -> str:
    """FLOOR-division word index, total and bijective with ``_bm_bit`` on
    the whole int64 id domain.  A plain truncating ``id div 63`` pairs a
    NEGATIVE id with the pmod bit of a DIFFERENT word (trunc and floor
    disagree exactly when the C-style remainder is negative), silently
    merging two users into one bit — and a raw ``id % 63`` shift count is
    negative for negative ids, which DuckDB's ``<<`` rejects outright.
    floor = trunc - 1 when the remainder is negative; computed WITHOUT
    ``id - bit`` subtraction, which would underflow at int64 min."""
    div = "div" if dialect == "spark" else "//"
    return (
        f"((user_id {div} {BITMAP_WORD}) + "
        f"(CASE WHEN user_id % {BITMAP_WORD} < 0 THEN -1 ELSE 0 END))"
    )


def _bm_bit() -> str:
    """Canonical (pmod) bit position in [0, {BITMAP_WORD}) — dialect-neutral."""
    return f"(((user_id % {BITMAP_WORD}) + {BITMAP_WORD}) % {BITMAP_WORD})"


@register(
    "bitmap_daily_retention",
    oracle=f"""
        WITH act AS (
          SELECT DISTINCT epoch_us(ts) // {DAY_US} AS day, user_id FROM events
        ),
        bm AS (
          SELECT day, {_bm_word('duckdb')} AS word,
                 bit_or(1::BIGINT << CAST({_bm_bit()} AS INTEGER)) AS bits
          FROM act GROUP BY 1, 2
        ),
        daily AS (
          SELECT day, CAST(SUM(bit_count(bits)) AS BIGINT) AS active_users
          FROM bm GROUP BY day
        ),
        ret AS (
          SELECT a.day, CAST(SUM(bit_count(a.bits & b.bits)) AS BIGINT) AS returning
          FROM bm a JOIN bm b ON b.day = a.day + 1 AND a.word = b.word
          GROUP BY a.day
        )
        SELECT d.day, d.active_users,
               COALESCE(r.returning, CAST(0 AS BIGINT)) AS returning_next_day
        FROM daily d LEFT JOIN ret r ON d.day = r.day
        """,
    doc="Roaring-style bitmap index for EXACT daily active users and "
    "next-day retention: users pack into 63-bit words (word = id div 63, "
    "bit_or of single-bit masks), per-day actives = popcount sum, "
    "retention = popcount of the word-aligned AND of consecutive days — "
    "the exact counterpart of the HLL family (hll_daily_rollup) when the "
    "id space is dense enough to afford it.  The shuffle carries one "
    "word per 63 users instead of raw ids (63x compression), the "
    "retention join is equi on (day+1, word) touching only co-present "
    "words, and every aggregate is map-side combinable.  Pure integer "
    "bit arithmetic — identical in both engines.",
    tags=("sketch", "bitmap", "retention", "added-r3"),
)
def bitmap_daily_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        F.expr(f"unix_micros(ts) div {DAY_US}").alias("day"), "user_id"
    ).distinct()
    bm = act.groupBy(
        "day", F.expr(_bm_word("spark")).alias("word")
    ).agg(
        F.expr(
            f"bit_or(shiftleft(1L, CAST({_bm_bit()} AS INT)))"
        ).alias("bits")
    )
    daily = bm.groupBy("day").agg(
        F.sum(F.expr("bit_count(bits)")).alias("active_users")
    )
    a, b = bm.alias("a"), bm.alias("b")
    ret = (
        a.join(
            b,
            (F.col("b.day") == F.col("a.day") + 1) & (F.col("a.word") == F.col("b.word")),
        )
        .groupBy(F.col("a.day").alias("day"))
        .agg(F.sum(F.expr("bit_count(a.bits & b.bits)")).alias("returning"))
    )
    return daily.join(ret, "day", "left").select(
        "day",
        "active_users",
        F.coalesce(F.col("returning"), F.lit(0).cast("long")).alias(
            "returning_next_day"
        ),
    )


@register(
    "bitmap_weekly_rollup",
    oracle=f"""
        WITH act AS (
          SELECT DISTINCT epoch_us(ts) // {DAY_US} AS day, user_id FROM events
        ),
        bm AS (
          SELECT day, {_bm_word('duckdb')} AS word,
                 bit_or(1::BIGINT << CAST({_bm_bit()} AS INTEGER)) AS bits
          FROM act GROUP BY 1, 2
        ),
        weekly AS (
          SELECT day // 7 AS week, word, bit_or(bits) AS wbits
          FROM bm GROUP BY 1, 2
        ),
        daily_sum AS (
          SELECT day // 7 AS week, CAST(SUM(bit_count(bits)) AS BIGINT) AS sum_daily_actives
          FROM bm GROUP BY 1
        )
        SELECT w.week, CAST(SUM(bit_count(w.wbits)) AS BIGINT) AS weekly_actives,
               MAX(d.sum_daily_actives) AS sum_daily_actives
        FROM weekly w JOIN daily_sum d ON w.week = d.week
        GROUP BY w.week
        """,
    doc="Bitmap OR-rollup: daily bitmap words merge into weekly words with "
    "bit_or (the exact analog of the HLL register-MAX rollup in "
    "hll_daily_rollup), so weekly distinct actives are EXACT and computed "
    "from the compact word table, never by re-scanning events at week "
    "granularity.  sum_daily_actives rides along to expose the "
    "within-week repeat factor.  Bitmaps are mergeable state: the same "
    "word table serves day, week, month rollups without touching the "
    "fact table again.",
    tags=("sketch", "bitmap", "rollup", "added-r3"),
)
def bitmap_weekly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(
        F.expr(f"unix_micros(ts) div {DAY_US}").alias("day"), "user_id"
    ).distinct()
    bm = act.groupBy(
        "day", F.expr(_bm_word("spark")).alias("word")
    ).agg(
        F.expr(
            f"bit_or(shiftleft(1L, CAST({_bm_bit()} AS INT)))"
        ).alias("bits")
    )
    weekly = bm.groupBy(
        F.expr("day div 7").alias("week"), "word"
    ).agg(F.expr("bit_or(bits)").alias("wbits"))
    daily_sum = bm.groupBy(F.expr("day div 7").alias("week")).agg(
        F.sum(F.expr("bit_count(bits)")).alias("sum_daily_actives")
    )
    return (
        weekly.join(daily_sum, "week")
        .groupBy("week")
        .agg(
            F.sum(F.expr("bit_count(wbits)")).alias("weekly_actives"),
            F.max("sum_daily_actives").alias("sum_daily_actives"),
        )
    )


# ---------------------------------------------------------------------------
# HLL set algebra: pairwise source-vocabulary overlap via register merges
# ---------------------------------------------------------------------------
def _hll_est(used: str, weight: str) -> str:
    """Raw HLL estimate from (#registers used, exact integer present-weight)
    — dialect-neutral: one double division over exact int64 sums (same
    estimator text as hll_distinct_users in mldata_queries)."""
    from pulsar_pekko_streams_example_spark.plans.mldata_queries import HLL_M

    return (
        f"(CAST(0.709 AS DOUBLE) * {HLL_M} * {HLL_M} * 1073741824.0)"
        f" / CAST(({weight}) + ({HLL_M} - ({used})) * 1073741824 AS DOUBLE)"
    )


def _duck_hll_overlap_sql() -> str:
    from pulsar_pekko_streams_example_spark.functions import hashing as H
    from pulsar_pekko_streams_example_spark.plans.mldata_queries import (
        _hll_exprs,
        SHINGLE_N_FOR_OVERLAP,
    )

    reg, rho = _hll_exprs("duckdb")
    est = _hll_est("used", "w")
    return f"""
        WITH el AS (
          SELECT DISTINCT source, unnest(sh) AS uid FROM (
            SELECT source, {H.shingles(SHINGLE_N_FOR_OVERLAP, 'duckdb')} AS sh
            FROM (SELECT source, {H.tokens('text', 'duckdb')} AS w FROM documents)
          )
        ),
        regs AS (
          SELECT source, {reg} AS reg, MAX({rho}) AS m FROM el GROUP BY 1, 2
        ),
        per_src AS (
          SELECT source, COUNT(*) AS used,
                 CAST(SUM(CAST(2 AS BIGINT) ** (30 - m)) AS BIGINT) AS w
          FROM regs GROUP BY source
        ),
        pairs AS (
          SELECT a.source AS source_a, b.source AS source_b
          FROM per_src a JOIN per_src b ON a.source < b.source
        ),
        pair_regs AS (
          SELECT p.source_a, p.source_b, r.reg, MAX(r.m) AS m
          FROM (
            SELECT source_a, source_b, source_a AS src FROM pairs
            UNION ALL
            SELECT source_a, source_b, source_b AS src FROM pairs
          ) p JOIN regs r ON r.source = p.src
          GROUP BY 1, 2, 3
        ),
        pair_union AS (
          SELECT source_a, source_b, COUNT(*) AS used,
                 CAST(SUM(CAST(2 AS BIGINT) ** (30 - m)) AS BIGINT) AS w
          FROM pair_regs GROUP BY 1, 2
        ),
        exact_inter AS (
          SELECT a.source AS source_a, b.source AS source_b,
                 COUNT(*) AS exact_intersection
          FROM el a JOIN el b ON a.uid = b.uid AND a.source < b.source
          GROUP BY 1, 2
        )
        SELECT u.source_a, u.source_b,
               (SELECT {est.replace('used', 'sa.used').replace('(w)', '(sa.w)')}
                FROM per_src sa WHERE sa.source = u.source_a) AS est_a,
               (SELECT {est.replace('used', 'sb.used').replace('(w)', '(sb.w)')}
                FROM per_src sb WHERE sb.source = u.source_b) AS est_b,
               {est.replace('used', 'u.used').replace('(w)', '(u.w)')} AS est_union,
               COALESCE(x.exact_intersection, 0) AS exact_intersection
        FROM pair_union u
        LEFT JOIN exact_inter x
          ON u.source_a = x.source_a AND u.source_b = x.source_b
        """


@register(
    "hll_vocab_overlap",
    oracle=_duck_hll_overlap_sql(),
    doc="Sketch SET ALGEBRA: pairwise shingle-vocabulary overlap between "
    "sources from per-source HyperLogLog registers.  The corpus is scanned "
    "ONCE into sources x 64 registers; every pairwise union is then a "
    "register-wise MAX over that tiny table (the mergeability that makes "
    "HLL the 100 TB tool — cross-source overlap needs no second corpus "
    "pass, and new data folds in by MAX).  Intersection follows by "
    "inclusion-exclusion downstream of the returned estimates; the exact "
    "intersection count rides along to expose the estimator error.  All "
    "register weights sum as exact int64; only the final divisions are "
    "double.",
    tags=("sketch", "set-ops", "added-r3"),
)
def hll_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pulsar_pekko_streams_example_spark.functions import hashing as H
    from pulsar_pekko_streams_example_spark.operators.partitioning import spread
    from pulsar_pekko_streams_example_spark.plans.mldata_queries import (
        _hll_exprs,
        SHINGLE_N_FOR_OVERLAP,
    )

    docs = load_table(spark, sf_dir, "documents")
    reg, rho = _hll_exprs("spark")
    el = (
        spread(docs)
        .withColumn("w", F.expr(H.tokens("text", "spark")))
        .select(
            "source",
            F.explode(F.expr(H.shingles(SHINGLE_N_FOR_OVERLAP, "spark"))).alias("uid"),
        )
        .distinct()
    )
    regs = el.groupBy("source", F.expr(reg).alias("reg")).agg(
        F.expr(f"MAX({rho})").alias("m")
    )
    per_src = regs.groupBy("source").agg(
        F.count(F.lit(1)).alias("used"),
        F.sum(F.expr("shiftleft(1L, 30 - m)")).cast("long").alias("w"),
    )
    pairs = (
        per_src.alias("a")
        .join(per_src.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            F.expr(_hll_est("a.used", "a.w")).alias("est_a"),
            F.expr(_hll_est("b.used", "b.w")).alias("est_b"),
        )
    )
    sides = pairs.select("source_a", "source_b", F.col("source_a").alias("src")).union(
        pairs.select("source_a", "source_b", F.col("source_b").alias("src"))
    )
    pair_regs = (
        sides.join(regs.withColumnRenamed("source", "src"), "src")
        .groupBy("source_a", "source_b", "reg")
        .agg(F.max("m").alias("m"))
    )
    pair_union = pair_regs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("used"),
        F.sum(F.expr("shiftleft(1L, 30 - m)")).cast("long").alias("w"),
    )
    exact_inter = (
        el.alias("x")
        .join(
            el.alias("y"),
            (F.col("x.uid") == F.col("y.uid")) & (F.col("x.source") < F.col("y.source")),
        )
        .groupBy(
            F.col("x.source").alias("source_a"), F.col("y.source").alias("source_b")
        )
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    return (
        pair_union.join(F.broadcast(pairs), ["source_a", "source_b"])
        .join(exact_inter, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            "est_a",
            "est_b",
            F.expr(_hll_est("used", "w")).alias("est_union"),
            F.coalesce(F.col("exact_intersection"), F.lit(0).cast("long")).alias(
                "exact_intersection"
            ),
        )
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / theta-style) distinct sketch with SET OPERATIONS
# ---------------------------------------------------------------------------
# The sketch family HLL cannot replace: HLL registers union cleanly but has
# no intersection; a KMV sketch (the K smallest hash values of a set) is a
# uniform SAMPLE of the hashed universe, so sketches merge by taking the K
# smallest of the concatenation, and Jaccard estimates by counting union-
# sample members present in both input samples (Beyer et al. SIGMOD 2007,
# the core of the theta-sketch framework).  Everything is engine-portable
# integer arithmetic: the hash is the AB-test multiplicative form, the
# K-smallest selection is ORDER BY + LIMIT (TakeOrderedAndProject — per-
# partition top-K, K-row driver merge, the distributed shape), and the
# estimator (K-1)*MOD DIV h_K is one exact int64 division.  |S| < K
# degrades to the exact count (the sample IS the set) — the sf0.001 corpus
# exercises that branch, sf0.01+ exercises the estimator.
KMV_K = 16
KMV_PREMOD = 1000003
KMV_MULT = 2654435761
KMV_MOD = 1073741789  # prime < 2^30
KMV_SET_A = "click"
KMV_SET_B = "purchase"
_KMV_HASH = f"(((user_id % {KMV_PREMOD}) * {KMV_MULT}) % {KMV_MOD})"


def _kmv_est(cnt: str, theta: str) -> str:
    """Shared estimator text: exact when the sample is the whole set
    (cnt < K), else (K-1)*MOD DIV theta."""
    return (
        f"CAST(CASE WHEN {cnt} < {KMV_K} THEN {cnt} "
        f"ELSE (({KMV_K} - 1) * CAST({KMV_MOD} AS BIGINT)) // {theta} END AS BIGINT)"
    )


@register(
    "kmv_sketch_setops",
    oracle=f"""
        WITH ha AS (
          SELECT DISTINCT {_KMV_HASH} AS h FROM events WHERE event_type = '{KMV_SET_A}'
        ),
        hb AS (
          SELECT DISTINCT {_KMV_HASH} AS h FROM events WHERE event_type = '{KMV_SET_B}'
        ),
        sa AS (SELECT h FROM ha ORDER BY h LIMIT {KMV_K}),
        sb AS (SELECT h FROM hb ORDER BY h LIMIT {KMV_K}),
        su AS (
          SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb)
          ORDER BY h LIMIT {KMV_K}
        ),
        stats AS (
          SELECT (SELECT COUNT(*) FROM sa) AS ca, (SELECT MAX(h) FROM sa) AS ta,
                 (SELECT COUNT(*) FROM sb) AS cb, (SELECT MAX(h) FROM sb) AS tb,
                 (SELECT COUNT(*) FROM su) AS cu, (SELECT MAX(h) FROM su) AS tu,
                 (SELECT COUNT(*) FROM su
                   WHERE h IN (SELECT h FROM sa) AND h IN (SELECT h FROM sb)) AS cboth,
                 (SELECT COUNT(*) FROM ha) AS xa,
                 (SELECT COUNT(*) FROM hb) AS xb,
                 (SELECT COUNT(*) FROM (SELECT h FROM ha UNION SELECT h FROM hb)) AS xu
        )
        SELECT CAST({KMV_K} AS BIGINT) AS k,
               {_kmv_est('ca', 'ta')} AS est_a, CAST(xa AS BIGINT) AS exact_a,
               {_kmv_est('cb', 'tb')} AS est_b, CAST(xb AS BIGINT) AS exact_b,
               {_kmv_est('cu', 'tu')} AS est_union, CAST(xu AS BIGINT) AS exact_union,
               CAST(CASE WHEN cu = 0 THEN 0
                    ELSE (cboth * {_kmv_est('cu', 'tu')}) // cu END AS BIGINT)
                 AS est_intersection,
               CAST(xa + xb - xu AS BIGINT) AS exact_intersection
        FROM stats
        """,
    doc="KMV / theta-style distinct sketch with set operations — the "
    "sketch HLL cannot be: the K smallest user-id hash values per set "
    "merge by re-taking the K smallest of the concatenation (union "
    "sketch from SKETCHES, never re-reading the data), and intersection "
    "estimates as (union-sample members in both inputs)/K x est_union "
    "(Beyer et al. 2007; the theta-sketch core).  K-smallest is ORDER BY "
    "+ LIMIT -> TakeOrderedAndProject (per-partition top-K, K-row driver "
    "merge); the estimator (K-1)*MOD DIV h_K is exact int64; samples "
    "smaller than K degrade to exact counts.  Exact counterparts are "
    "emitted alongside for error inspection — the sketch math itself is "
    "under oracle test, not just the happy path.  At 100 TB each "
    "per-set sketch is one distinct + top-K pass; every set operation "
    "after that touches K rows.",
    tags=("sketch", "agg", "added-r13"),
)
def kmv_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")

    def sample(event_type: str) -> DataFrame:
        return (
            events.filter(F.col("event_type") == event_type)
            .select(F.expr(_KMV_HASH).alias("h"))
            .distinct()
            .orderBy("h")
            .limit(KMV_K)
        )

    def exact(event_type: str) -> DataFrame:
        return (
            events.filter(F.col("event_type") == event_type)
            .select(F.expr(_KMV_HASH).alias("h"))
            .distinct()
        )

    sa, sb = sample(KMV_SET_A), sample(KMV_SET_B)
    su = sa.union(sb).distinct().orderBy("h").limit(KMV_K)
    ha, hb = exact(KMV_SET_A), exact(KMV_SET_B)
    xu = ha.union(hb).distinct()
    both = (
        su.join(sa.withColumnRenamed("h", "h_a"), F.col("h") == F.col("h_a"), "left_semi")
        .join(sb.withColumnRenamed("h", "h_b"), F.col("h") == F.col("h_b"), "left_semi")
    )
    stats = (
        sa.agg(F.count("h").alias("ca"), F.max("h").alias("ta"))
        .crossJoin(sb.agg(F.count("h").alias("cb"), F.max("h").alias("tb")))
        .crossJoin(su.agg(F.count("h").alias("cu"), F.max("h").alias("tu")))
        .crossJoin(both.agg(F.count("h").alias("cboth")))
        .crossJoin(ha.agg(F.count("h").alias("xa")))
        .crossJoin(hb.agg(F.count("h").alias("xb")))
        .crossJoin(xu.agg(F.count("h").alias("xu")))
    )
    return stats.selectExpr(
        f"CAST({KMV_K} AS BIGINT) AS k",
        f"{_kmv_est('ca', 'ta')} AS est_a".replace("//", "DIV"),
        "CAST(xa AS BIGINT) AS exact_a",
        f"{_kmv_est('cb', 'tb')} AS est_b".replace("//", "DIV"),
        "CAST(xb AS BIGINT) AS exact_b",
        f"{_kmv_est('cu', 'tu')} AS est_union".replace("//", "DIV"),
        "CAST(xu AS BIGINT) AS exact_union",
        (
            f"CAST(CASE WHEN cu = 0 THEN 0 "
            f"ELSE (cboth * {_kmv_est('cu', 'tu')}) DIV cu END AS BIGINT) "
            f"AS est_intersection"
        ).replace("//", "DIV"),
        "CAST(xa + xb - xu AS BIGINT) AS exact_intersection",
    )
