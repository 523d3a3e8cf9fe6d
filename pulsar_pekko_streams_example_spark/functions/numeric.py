"""Cross-engine-exact numeric aggregation helpers.

Double summation is order-dependent; Spark's partial aggregation order differs
from DuckDB's, so raw SUM(double) would break the driver's value-hash compare.
Accumulating per-row values as DECIMAL(38,6) makes the sum exact and
associative (each row's double→decimal conversion is deterministic and
identical in both engines), then the final cast back to DOUBLE is bit-stable.

At scale this costs one extra cast per row inside codegen — negligible vs the
scan — and buys deterministic results, which matters for 100 TB reruns too.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(38,6)"


def dsum(col: Column | str) -> Column:
    """Exact, engine-portable SUM over a double expression → DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Exact, engine-portable AVG over a double expression → DOUBLE.

    sum(decimal)/count performed in double (single deterministic division).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def sql_dsum(expr: str) -> str:
    """DuckDB twin of dsum()."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB twin of davg()."""
    return f"(CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE) / COUNT({expr}))"
