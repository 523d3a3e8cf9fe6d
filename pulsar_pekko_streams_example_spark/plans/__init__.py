"""Query plan registry — importing this package registers all queries."""

from pulsar_pekko_streams_example_spark.plans import core_queries  # noqa: F401
from pulsar_pekko_streams_example_spark.plans.registry import REGISTRY, all_oracles, all_queries

try:  # modules added per milestone; keep the registry importable mid-build
    from pulsar_pekko_streams_example_spark.plans import tpch_queries  # noqa: F401
except ImportError:
    pass
try:
    from pulsar_pekko_streams_example_spark.plans import data_queries  # noqa: F401
except ImportError:
    pass
try:
    from pulsar_pekko_streams_example_spark.plans import temporal_queries  # noqa: F401
except ImportError:
    pass
try:
    from pulsar_pekko_streams_example_spark.plans import sketch_queries  # noqa: F401
except ImportError:
    pass
try:
    from pulsar_pekko_streams_example_spark.plans import mldata_queries  # noqa: F401
except ImportError:
    pass
try:
    from pulsar_pekko_streams_example_spark.plans import analytic_queries  # noqa: F401
except ImportError:
    pass
try:
    from pulsar_pekko_streams_example_spark.plans import cluster_queries  # noqa: F401
except ImportError:
    pass

try:
    from pulsar_pekko_streams_example_spark.plans import diagnostic_queries  # noqa: F401
except ImportError:
    pass

__all__ = ["REGISTRY", "all_queries", "all_oracles"]
