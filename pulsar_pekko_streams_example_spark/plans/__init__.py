"""Query plan registry — importing this package registers all queries.

Every family import is UNGUARDED on purpose (round-13): the old
``try/except ImportError: pass`` wrappers dated from the mid-build era
when families landed one at a time; at 178 registered queries they had
become a silent-shrink hazard — a family whose import broke (a typo, a
bad merge, a missing dependency inside one module) simply vanished from
``REGISTRY`` with every downstream gate still green, and the driver's
coverage would quietly drop.  A broken family now fails THIS import,
which fails every test and the driver's entry-point smoke check — loud,
immediate, and pointing at the offending module.  The census pin in
``tests/test_registry.py`` (EXPECTED_REGISTRY_SIZE) is the second lock:
even a surgically deleted ``register()`` call trips it.
"""

from pulsar_pekko_streams_example_spark.plans import (  # noqa: F401
    analytic_queries,
    cluster_queries,
    core_queries,
    data_queries,
    diagnostic_queries,
    mldata_queries,
    sketch_queries,
    temporal_queries,
    tpch_queries,
)
from pulsar_pekko_streams_example_spark.plans.registry import REGISTRY, all_oracles, all_queries

__all__ = ["REGISTRY", "all_queries", "all_oracles"]
