"""Streaming source helpers.

Reference: the backpressured Pulsar source (S1,
``part1/PulsarPekkoSource.scala:44-131``) and consumer construction (S2,
``util/PulsarClientWrapper.scala:203-226``).  In Spark the source is a
``readStream`` and backpressure is admission (micro-batch pull): the broker
(or filesystem) holds the backlog, matching the reference's zero-buffer
design (``part2/PekkoStreamGenerator.scala:91-94``).

For a real Pulsar topic the StreamNative pulsar-spark connector exposes the
same envelope columns; it isn't installed here, so ``envelope_file_stream``
serves the driver-testable path: a file-based stream with identical schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from pulsar_pekko_streams_example_spark.session import prepare_session

# canonical envelope for streamed attempts (FIXTURES.md F1 subset)
ATTEMPT_STREAM_SCHEMA = (
    "message_id string, event_id long, topic string, key string, seq long, "
    "attempt long, status string, publish_time timestamp"
)


def envelope_file_stream(
    spark: SparkSession,
    path: str,
    schema: str | StructType = ATTEMPT_STREAM_SCHEMA,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Backpressured file source: one micro-batch pulls at most
    ``max_files_per_trigger`` files — the receiver-queue-size analog
    (S2 receiverQueueSize, util/PulsarClientWrapper.scala:169)."""
    prepare_session(spark)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        # `is not None`, not truthiness: a computed bound that bottoms out
        # at 0 must fail loud here, not silently run the stream UNBOUNDED —
        # the opposite of the full throttle the caller asked for
        if max_files_per_trigger <= 0:
            raise ValueError(
                f"max_files_per_trigger must be positive, got "
                f"{max_files_per_trigger}; to run unbounded, pass None "
                "explicitly"
            )
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def bounded_event_time(
    df: DataFrame,
    ts_col: str = "publish_time",
    lo: str = "2000-01-01",
    hi: str = "2100-01-01",
    metrics_name: str | None = None,
) -> DataFrame:
    """Guard an event-time column before ``withWatermark``.

    Watermarks advance to ``max(event_time) - delay``: ONE message carrying a
    far-future timestamp (clock skew, a corrupted epoch, a hostile producer)
    advances the watermark past every legitimate event, and the engine then
    silently drops the rest of the stream as late — a single poisoned row
    becomes total data loss with no error anywhere (round-8 streaming sweep).
    Bounding event time to a validity window caps how far any one message can
    drag the watermark; NULL event times are dropped here explicitly, which
    is the same contract the batch window oracles pin (an event with no
    timestamp belongs to no window) rather than an engine-version-dependent
    behavior.  Route the rejects via ``filter(NOT ...)`` upstream if they
    must be audited instead of dropped.

    ``metrics_name`` meters the guard so the drops are RECONCILABLE rather
    than silent: an ``observe`` with ``scanned`` / ``in_bounds`` counters
    rides the existing job (zero extra passes; per micro-batch via
    StreamingQueryListener, or ``pyspark.sql.Observation`` in batch) —
    ``scanned - in_bounds`` is the guard's drop count.
    """
    from pyspark.sql import functions as F

    c = F.col(ts_col)
    valid = (
        c.isNotNull()
        & (c >= F.lit(lo).cast("timestamp"))
        & (c < F.lit(hi).cast("timestamp"))
    )
    if metrics_name:
        df = df.observe(
            metrics_name,
            F.count(F.lit(1)).alias("scanned"),
            F.count(F.when(valid, 1)).alias("in_bounds"),
        )
    return df.filter(valid)


#: Default event-time validity window for ``watermarked``.  Wide enough that
#: no legitimate workload hits it, narrow enough that a corrupted epoch
#: (year-9999 clock skew, a hostile producer) cannot drag the watermark past
#: the live stream.
DEFAULT_EVENT_TIME_BOUNDS: tuple[str, str] = ("2000-01-01", "2100-01-01")


def watermarked(
    df: DataFrame,
    delay: str,
    ts_col: str = "publish_time",
    bounds: tuple[str, str] | None = DEFAULT_EVENT_TIME_BOUNDS,
    guard_metrics: str | None = None,
) -> DataFrame:
    """The library's watermark entry point: bounded event time BY DEFAULT.

    ``df.withWatermark(ts, delay)`` alone is unsafe against hostile input —
    the watermark advances to ``max(event_time) - delay``, so a single
    far-future timestamp silently drops every subsequent legitimate event as
    late (total loss, pinned by
    ``tests/test_streaming_hostile.py::test_far_future_timestamp_poisons_watermark_without_guard``).
    This helper composes :func:`bounded_event_time` with ``withWatermark`` so
    the default path is guarded; the guard also drops NULL event times (an
    event with no timestamp belongs to no window — same contract the batch
    window oracles pin).

    Opt-out: pass ``bounds=None`` for a bare ``withWatermark`` (only when the
    producer is trusted AND rejects must be audited upstream instead).
    ``guard_metrics`` names an ``observe`` that meters the guard
    (scanned / in_bounds per micro-batch) so drops reconcile instead of
    vanishing.

    Reference semantics at stake: arrival-time fidelity of the envelope
    stream (``part1/PulsarPekkoSource.scala:44-131`` delivers every received
    message downstream; a watermark that jumps a century violates that).
    """
    if bounds is None and guard_metrics is not None:
        # contradictory ask: guard_metrics names the guard's observation,
        # and bounds=None disables the guard — silently attaching nothing
        # would make guard_totals() report zero drops while the bare
        # watermark may be dropping rows, the exact books-don't-balance
        # outcome the metering exists to prevent
        raise ValueError(
            "guard_metrics meters the bounded_event_time guard, but "
            "bounds=None disables it — pass bounds, or drop guard_metrics "
            "and audit rejects upstream"
        )
    if bounds is not None:
        lo, hi = bounds
        df = bounded_event_time(
            df, ts_col=ts_col, lo=lo, hi=hi, metrics_name=guard_metrics
        )
    return df.withWatermark(ts_col, delay)


def rate_stream(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """Synthetic keyed source (for lifecycle tests): rate source mapped onto
    the envelope shape."""
    prepare_session(spark)
    from pyspark.sql import functions as F

    df = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    return df.select(
        F.col("value").cast("string").alias("message_id"),
        F.col("value").alias("event_id"),
        F.lit("persistent://testing/rate/topic-0").alias("topic"),
        F.concat(F.lit("key-"), (F.col("value") % 4).cast("string")).alias("key"),
        F.col("value").alias("seq"),
        F.lit(1).cast("long").alias("attempt"),
        F.lit("success").alias("status"),
        F.col("timestamp").alias("publish_time"),
    )
