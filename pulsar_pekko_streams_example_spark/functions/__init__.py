from pulsar_pekko_streams_example_spark.functions.numeric import dsum, davg

__all__ = ["dsum", "davg"]
