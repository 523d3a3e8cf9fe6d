"""Cross-engine-exact numeric aggregation helpers.

Double summation is order-dependent; Spark's partial aggregation order differs
from DuckDB's, so raw SUM(double) would break the driver's value-hash compare.
Accumulating per-row values as DECIMAL(38,6) makes the sum exact and
associative (each row's double→decimal conversion is deterministic and
identical in both engines), then the final cast back to DOUBLE is bit-stable.

The accumulation is TOTAL: a summand outside the DECIMAL(38,6) envelope
(|x| >= 1e32) or non-finite (NaN/±Inf — real at corpus scale: a float32-max
embedding component squares to ~1e77) contributes NULL and is excluded from
the sum, identically in both engines, instead of aborting the whole job
(Spark ANSI raises NUMERIC_VALUE_OUT_OF_RANGE on a plain cast).  Spark's
try_cast handles all three cases; DuckDB's TRY_CAST handles the finite
out-of-range case but still ERRORS on NaN/Inf→DECIMAL, hence the isfinite
pre-guard in the SQL twins.  COUNT still counts the excluded rows (they are
not NULL in the source column), so davg's divisor is unchanged — also in
both engines.

At scale this costs one extra cast per row inside codegen — negligible vs the
scan — and buys deterministic, crash-free results, which matters for 100 TB
reruns too.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"

# Portable 6-decimal pre-quantization (round-16 finding, surfaced by the
# trained-PQ ADC sums): the engines CONVERT double -> DECIMAL differently.
# Spark goes through the value's SHORTEST decimal representation (Java
# BigDecimal.valueOf) and rounds that HALF_UP; DuckDB rounds the EXACT
# binary expansion.  A double whose shortest repr carries a tie at the 7th
# fractional digit therefore rounds differently per engine: 182.7653145 ->
# 182.765315 (Spark) vs 182.765314 (DuckDB, exact binary ...44999...).
# Rational-arithmetic data (means of integer-valued components) lands on
# such doubles in practice.  Fix: quantize with PURE IEEE double ops first
# — floor(x*1e6 + 0.5)/1e6, bit-identical in both engines — which puts
# every |x| < 9e9 exactly on a 6-decimal grid point whose decimal
# conversion is then unambiguous (the grid double's shortest repr IS the
# grid value, and its exact binary is within half an ulp of it).  Ties
# round toward +inf in BOTH engines by contract.  Larger magnitudes skip
# the quantization (the micro-unit product would leave the 2^53
# exact-integer range); any low-digit conversion difference there is
# absorbed by the final CAST(.. AS DOUBLE), as it always was.
_Q6_BOUND = 9.0e9


def _q6(c: Column) -> Column:
    return F.when(
        F.abs(c) < F.lit(_Q6_BOUND),
        F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("double") / F.lit(1e6),
    ).otherwise(c)


def dcast(c: Column) -> Column:
    """Total, engine-portable double→DECIMAL(38,6) cell cast (NaN/Inf/
    out-of-range → NULL; 6-decimal ties pre-quantized identically in both
    engines — see _q6).  Use for inline decimal accumulations that
    dsum/davg don't cover."""
    return _q6(c).try_cast(DEC)


_dec = dcast


def dsum(col: Column | str) -> Column:
    """Exact, engine-portable, total SUM over a double expression → DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(_dec(c)).cast("double")


def davg(col: Column | str) -> Column:
    """Exact, engine-portable, total AVG over a double expression → DOUBLE.

    sum(decimal)/count performed in double (single deterministic division).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(_dec(c)).cast("double") / F.count(c)


def sql_dcast(expr: str) -> str:
    """DuckDB twin of dcast() (isfinite pre-guard: DuckDB TRY_CAST still
    errors on NaN/Inf→DECIMAL; same _q6 pure-double pre-quantization so
    6-decimal conversion ties resolve identically in both engines)."""
    x = f"CAST(({expr}) AS DOUBLE)"
    q = (
        f"CASE WHEN abs({x}) < {_Q6_BOUND!r} "
        f"THEN floor({x} * 1e6 + 0.5) / 1e6 ELSE {x} END"
    )
    return (
        f"TRY_CAST(CASE WHEN isfinite({x}) "
        f"THEN ({q}) END AS DECIMAL(38,6))"
    )


_sql_dec = sql_dcast


def sql_dsum(expr: str) -> str:
    """DuckDB twin of dsum()."""
    return f"CAST(SUM({_sql_dec(expr)}) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB twin of davg()."""
    return f"(CAST(SUM({_sql_dec(expr)}) AS DOUBLE) / COUNT({expr}))"
