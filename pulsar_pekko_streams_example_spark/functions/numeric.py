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


def dcast(c: Column) -> Column:
    """Total double→DECIMAL(38,6) cell cast (NaN/Inf/out-of-range → NULL).
    Use for inline decimal accumulations that dsum/davg don't cover."""
    return c.try_cast(DEC)


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
    errors on NaN/Inf→DECIMAL)."""
    return (
        f"TRY_CAST(CASE WHEN isfinite(CAST(({expr}) AS DOUBLE)) "
        f"THEN ({expr}) END AS DECIMAL(38,6))"
    )


_sql_dec = sql_dcast


def sql_dsum(expr: str) -> str:
    """DuckDB twin of dsum()."""
    return f"CAST(SUM({_sql_dec(expr)}) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB twin of davg()."""
    return f"(CAST(SUM({_sql_dec(expr)}) AS DOUBLE) / COUNT({expr}))"
