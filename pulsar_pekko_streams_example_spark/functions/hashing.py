"""Cross-engine deterministic hashing expressions.

The dedup/fingerprint operators need hash functions that produce IDENTICAL
values in Spark and in the DuckDB oracle.  Engine-native hashes differ
(Spark xxhash64/murmur vs DuckDB's), so everything here is plain int64
arithmetic over character codes, expressed twice — once per dialect — from
the same constants.  All intermediates stay < 2^63 (P ≈ 1e9, products ≤
~1e18), so no overflow under Spark's ANSI mode.

Replaces the reference's JVM-native hashing touchpoints
(JavaStringHash key routing, util/PulsarClientWrapper.scala:158) with an
engine-portable construction.
"""

from __future__ import annotations

P = 1_000_000_007  # fold modulus (prime)
CHAR_MULT = 31

# MinHash: h_i(x) = (A[i] * x + B[i]) % P  — constants generated from LCG
# multipliers, inlined as literals into both dialects.
N_MINHASH = 8
N_BANDS = 4  # 2 rows per band
MINHASH_A = [(1103515245 * (i + 1) + 12345) % P for i in range(N_MINHASH)]
MINHASH_B = [(362436069 * (i + 1) + 521288629) % P for i in range(N_MINHASH)]

SIMHASH_BITS = 16


def word_hash(inner: str, dialect: str) -> str:
    """Polynomial fold over the characters of string expression ``inner``.

    spark:  aggregate(transform(split(x,''), c->ascii(c)), 0L, (a,x)->(a*31+x)%P)
    duckdb: list_reduce(list_prepend(0, list_transform(string_split(x,''), ...)))
    """
    if dialect == "spark":
        return (
            f"aggregate(transform(split({inner}, ''), c -> ascii(c)), 0L, "
            f"(acc, x) -> (acc * {CHAR_MULT} + x) % {P})"
        )
    # CAST the seed to BIGINT: DuckDB would otherwise fold in INT32 and
    # overflow-error once acc*31 exceeds 2^31 (Spark's 0L seed is already long)
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split({inner}, ''), "
        f"c -> ascii(c))), (acc, x) -> (acc * {CHAR_MULT} + x) % {P})"
    )


def minhash_perm(i: int, inner: str) -> str:
    """i-th MinHash permutation of an int64 expression (dialect-neutral)."""
    return f"(({MINHASH_A[i]} * {inner} + {MINHASH_B[i]}) % {P})"


def simhash_bit(j: int, inner: str, dialect: str) -> str:
    """Bit j of an int64 hash expression → {0,1} (dialect-aware int div)."""
    div = "div" if dialect == "spark" else "//"
    return f"(({inner} {div} {2**j}) % 2)"


def positional_shingles(n: int, dialect: str) -> str:
    """POSITIONAL n-gram word shingles over a tokens-array column ``w`` —
    one shingle per token position, duplicates KEPT (the span-coverage twin
    of ``shingles``, which distincts for set semantics).  Position i's
    shingle covers tokens i..i+n-1; a doc has max(0, len(w) - n + 1)
    positions.  Guarded for docs shorter than n tokens (empty list)."""
    if dialect == "spark":
        parts = ", '_', ".join(f"element_at(w, i + {k})" for k in range(n))
        return (
            f"CASE WHEN size(w) >= {n} THEN "
            f"transform(sequence(1, size(w) - {n - 1}), i -> concat({parts})) "
            f"ELSE array() END"
        )
    joined = " || '_' || ".join(f"w[i + {k}]" for k in range(n))
    return (
        f"CASE WHEN len(w) >= {n} THEN "
        f"list_transform(range(1, len(w) - {n - 2}), i -> {joined}) "
        f"ELSE [] END"
    )


def tokens(text: str, dialect: str) -> str:
    """Whitespace tokenization with empty tokens dropped."""
    if dialect == "spark":
        return f"filter(split({text}, ' '), t -> t <> '')"
    return f"list_filter(string_split({text}, ' '), t -> t <> '')"


def shingles(n: int, dialect: str) -> str:
    """Distinct n-gram word shingles joined with '_', over a tokens-array
    column named ``w`` (materialize the tokens first in both dialects).

    Guarded for docs shorter than n tokens (empty list, no OOB access).
    """
    if dialect == "spark":
        parts = ", '_', ".join(f"element_at(w, i + {k})" for k in range(n))
        return (
            f"CASE WHEN size(w) >= {n} THEN "
            f"array_distinct(transform(sequence(1, size(w) - {n - 1}), i -> concat({parts}))) "
            f"ELSE array() END"
        )
    joined = " || '_' || ".join(f"w[i + {k}]" for k in range(n))
    return (
        f"CASE WHEN len(w) >= {n} THEN "
        f"list_distinct(list_transform(range(1, len(w) - {n - 2}), i -> {joined})) "
        f"ELSE [] END"
    )
