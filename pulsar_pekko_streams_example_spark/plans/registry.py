"""Query registry — the engine's verification surface.

Every operator from SURVEY.md §2 is exposed as a named query: a PySpark
DataFrame builder ``(spark, sf_dir) -> DataFrame`` plus (where SQL can express
it) an equivalent DuckDB oracle SQL string.  The driver runs both sides at
sf=0.01 and compares row count + schema + order-insensitive value hash, so:

- every computed column is aliased IDENTICALLY in both representations;
- floating-point aggregates go through exact DECIMAL(38,6) accumulation and
  are cast back to DOUBLE, so both engines produce bit-identical values
  regardless of summation order;
- no engine-specific hash functions appear in oracle-checked queries — all
  pseudo-randomness is plain integer arithmetic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: QueryFn
    oracle: str | None  # DuckDB SQL twin; None => driver does rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query builder under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, build=fn, oracle=oracle, doc=doc or fn.__doc__ or "", tags=tags)
        return fn

    return deco


# Export order for the driver contract.  The driver's correctness gate walks
# ``queries()`` in dict order under a wall-clock budget, so families that have
# not yet earned CORRECTNESS rows go first (round 1's budget covered the
# core/tpch prefix; the LLM-data-pipeline families never got rows).  Within a
# family, registration (source) order is preserved.
_MODULE_ORDER = [
    "data_queries",
    "temporal_queries",
    "sketch_queries",
    "mldata_queries",
    "analytic_queries",
    "core_queries",
    "tpch_queries",
]


def _export_order() -> list[str]:
    import pulsar_pekko_streams_example_spark.plans  # noqa: F401  (triggers registration)

    insertion = {name: i for i, name in enumerate(REGISTRY)}

    def key(name: str) -> tuple[int, int]:
        mod = REGISTRY[name].build.__module__.rsplit(".", 1)[-1]
        rank = _MODULE_ORDER.index(mod) if mod in _MODULE_ORDER else len(_MODULE_ORDER)
        return (rank, insertion[name])

    return sorted(REGISTRY, key=key)


def all_queries() -> dict[str, QueryFn]:
    return {name: REGISTRY[name].build for name in _export_order()}


def all_oracles() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _export_order()
        if REGISTRY[name].oracle is not None
    }
