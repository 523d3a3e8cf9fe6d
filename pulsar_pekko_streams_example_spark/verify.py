"""Cross-engine result comparison — the local mirror of the driver's
DuckDB-oracle gate, shipped in-package so the CLI `check` command and the
test suite share one implementation.

Strict by design: row count, sorted column names, and exact cell values after
light normalization (Decimal→float, date/datetime→ISO string, float→repr).

It also reproduces the driver's TYPE sensitivity: the driver hashes the
DuckDB result through pandas, where HUGEINT/UHUGEINT become float64 — so a
bare top-level ``SUM(int)`` in DuckDB (HUGEINT) hash-mismatches Spark's int64
even when every value is identical (round-4 reds ``mad_robust_anomalies`` /
``shingle_df_histogram``).  ``fetchall()`` converts HUGEINT to Python int and
cannot see that divergence, so ``compare`` additionally inspects the DuckDB
output *types* and flags any HUGEINT/UHUGEINT column as a mismatch.  With
that check, if this passes, the driver's order-insensitive value hash passes
too.
"""

from __future__ import annotations

import datetime as dt
import decimal
import math
from typing import Any


def _norm_cell(v: Any) -> Any:
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def normalize(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def compare(spark_df, duck_rel) -> list[str]:
    """Returns a list of mismatch descriptions (empty = parity)."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = list(duck_rel.columns)
    d_types = [str(t).upper() for t in getattr(duck_rel, "types", [])]
    for col, typ in zip(d_cols, d_types):
        if "HUGEINT" in typ:  # matches HUGEINT and UHUGEINT
            problems.append(
                f"oracle column {col!r} is DuckDB {typ}: the driver's pandas "
                f"path renders it float64 and the value hash diverges from "
                f"Spark's int64 — CAST it to BIGINT in the oracle SQL"
            )
    d_rows = [tuple(r) for r in duck_rel.fetchall()]

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")

    ns, nd = normalize(s_cols, s_rows), normalize(d_cols, d_rows)
    if ns != nd:
        diffs = [(a, b) for a, b in zip(ns, nd) if a != b]
        sample = diffs[:5] if diffs else list(zip(ns[:3], nd[:3]))
        problems.append(f"values differ ({len(diffs)} aligned diffs); sample: {sample}")
    return problems
