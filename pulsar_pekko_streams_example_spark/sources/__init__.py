from pulsar_pekko_streams_example_spark.sources.streams import (
    bounded_event_time,
    envelope_file_stream,
    watermarked,
)
from pulsar_pekko_streams_example_spark.sources.tables import TABLES, load_table, load_tables

__all__ = [
    "TABLES",
    "bounded_event_time",
    "envelope_file_stream",
    "load_table",
    "load_tables",
    "watermarked",
]
