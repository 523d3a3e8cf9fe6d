"""Probabilistic sketch operators: count-min frequency sketch, Bloom-filter
membership.

Why sketches in this engine: at 100 TB, "how often does key X occur" and
"is key X in set S" must not require a full shuffle of the raw keys.  A
count-min sketch is a fixed-size (d × w) counter grid — build is one
map-side-combinable groupBy over (row, bucket); estimates touch d counters
per key.  A Bloom filter replaces a broadcast semi-join with a bitset test.

All hash functions are the engine-portable integer arithmetic from
functions/hashing.py's family ((A*x + B) % P % w), so the DuckDB oracle
rebuilds the identical sketch — estimates, collisions and false positives
match bit-for-bit.  (Spark's built-in BloomFilterAggregate would be faster
but engine-opaque; at 100 TB swap it in behind the same API.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P = 1_000_000_007

# count-min: d rows × w buckets
CMS_DEPTH = 4
CMS_WIDTH = 256
CMS_A = [(2654435761 * (j + 1) + 101) % P for j in range(CMS_DEPTH)]
CMS_B = [(40503 * (j + 1) * (j + 3) + 7) % P for j in range(CMS_DEPTH)]

# bloom: k hash functions into m bits
BLOOM_K = 5
BLOOM_M = 8192
BLOOM_A = [(1103515245 * (j + 1) + 12345) % P for j in range(BLOOM_K)]
BLOOM_B = [(362436069 * (j + 1) + 521288629) % P for j in range(BLOOM_K)]


def _canon_key(key: str) -> str:
    """Reduce an arbitrary int64 expression into [0, P) BEFORE the affine
    hash.  ``A * key`` with a raw key near ±2⁶³ overflows int64 (ANSI Spark
    errors the job; DuckDB errors too — a 100 TB feed WILL contain negative
    and boundary ids), and C-style ``%`` would hand negative keys negative
    buckets.  Since (A·x + B) mod P == (A·(x mod P) + B) mod P, canonical
    reduction changes NOTHING for keys already in [0, P) — every test-corpus
    id — while making the hash total and non-negative on the full domain:
    |key % P| < P ≈ 1e9, so A·(canon) < 1e18 stays safely inside int64."""
    return f"((({key}) % {P}) + {P}) % {P}"


def cms_bucket(j: int, key: str) -> str:
    """Dialect-neutral SQL: bucket of integer expression ``key`` in row j."""
    return f"((({CMS_A[j]} * ({_canon_key(key)}) + {CMS_B[j]}) % {P}) % {CMS_WIDTH})"


def bloom_bit(j: int, key: str) -> str:
    """Dialect-neutral SQL: bit index of integer expression ``key``, hash j."""
    return f"((({BLOOM_A[j]} * ({_canon_key(key)}) + {BLOOM_B[j]}) % {P}) % {BLOOM_M})"


def cms_build(rows: DataFrame, key: str) -> DataFrame:
    """Count-min counter grid (j, bucket, cnt) from ``rows[key]`` (int64).

    One explode(×d) + one groupBy: map-side partial aggregation compresses
    each partition to ≤ d×w rows before the (tiny, fixed-size) shuffle.
    """
    buckets = F.explode(
        F.expr(
            "array("
            + ", ".join(
                f"struct({j}L AS j, CAST({cms_bucket(j, key)} AS LONG) AS bucket)"
                for j in range(CMS_DEPTH)
            )
            + ")"
        )
    ).alias("jb")
    return (
        rows.select(buckets)
        .select(F.col("jb.j").alias("j"), F.col("jb.bucket").alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimates(rows: DataFrame, key: str) -> DataFrame:
    """(key, est): count-min frequency estimate for each distinct key —
    min over the d counters the key hashes to.  est >= true count always."""
    grid = cms_build(rows, key)
    keys = rows.select(F.col(key).alias("k")).distinct()
    lookups = keys.select(
        "k",
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"struct({j}L AS j, CAST({cms_bucket(j, 'k')} AS LONG) AS bucket)"
                    for j in range(CMS_DEPTH)
                )
                + ")"
            )
        ).alias("jb"),
    ).select("k", F.col("jb.j").alias("j"), F.col("jb.bucket").alias("bucket"))
    return (
        lookups.join(grid, ["j", "bucket"], "inner")
        .groupBy("k")
        .agg(F.min("cnt").alias("est"))
    )


def bloom_build_bits(members: DataFrame, key: str) -> DataFrame:
    """Distinct set bit positions of the Bloom filter for ``members[key]``."""
    bits = F.explode(
        F.expr(
            "array("
            + ", ".join(f"CAST({bloom_bit(j, key)} AS LONG)" for j in range(BLOOM_K))
            + ")"
        )
    ).alias("bit")
    return members.select(bits).distinct()


def bloom_probe(candidates: DataFrame, key: str, bits: DataFrame) -> DataFrame:
    """candidates + ``in_bloom`` flag: true iff ALL k bits for the key are
    set.  Implemented as a bit-level join + count (set-membership without
    materializing the member set on every executor; at scale the bitset is a
    broadcast of m/8 bytes, not of the member keys)."""
    probes = candidates.select(
        F.col(key).alias("k"),
        F.explode(
            F.expr(
                "array("
                + ", ".join(
                    f"CAST({bloom_bit(j, key)} AS LONG)" for j in range(BLOOM_K)
                )
                + ")"
            )
        ).alias("bit"),
    )
    hits = (
        probes.join(F.broadcast(bits), ["bit"], "left_semi")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("bits_set"))
    )
    return (
        candidates.select(F.col(key).alias("k"))
        .distinct()
        .join(hits, ["k"], "left")
        .select(
            "k",
            (F.coalesce("bits_set", F.lit(0)) == BLOOM_K).alias("in_bloom"),
        )
    )
