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


def all_queries() -> dict[str, QueryFn]:
    import pulsar_pekko_streams_example_spark.plans  # noqa: F401  (triggers registration)

    return {name: spec.build for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    import pulsar_pekko_streams_example_spark.plans  # noqa: F401

    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
