"""Back-compat shim: the comparison moved into the package so the CLI
shares it (pulsar_pekko_streams_example_spark/verify.py)."""

from pulsar_pekko_streams_example_spark.verify import _norm_cell, compare, normalize  # noqa: F401
