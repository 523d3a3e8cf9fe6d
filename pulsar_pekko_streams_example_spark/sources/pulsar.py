"""Pulsar connector integration (StreamNative pulsar-spark).

Reference analog: consumer/producer construction in
``util/PulsarClientWrapper.scala:151-226`` — subscription name/type/mode,
initial position Earliest, receiver queue 1000, nack redelivery 10 s — and
the Key_Shared subscription of ``part5/OrderedStreamGenerator.scala:190-196``.

This environment ships no Pulsar broker and no connector jar, so the pieces
that need one (``read_stream``/``write_stream`` materialization) raise
``ConnectorUnavailable`` with a clear message.  Everything else — option
construction, delivery-semantics knobs, and the mapping from the connector's
raw columns to this engine's canonical envelope — is pure, unit-tested code
that a deployment with the connector jar uses as-is:

    spark-submit --packages io.streamnative.connectors:pulsar-spark-connector_2.13:<ver>
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ConnectorUnavailable(RuntimeError):
    """The pulsar-spark connector (or the broker) is not present."""


@dataclass(frozen=True)
class PulsarSourceConfig:
    """Consumer-side config — the FULL ConsumerConfig surface of
    ``util/PulsarClientWrapper.scala:163-173``, defaults identical."""

    service_url: str = "pulsar://localhost:6650"
    admin_url: str = "http://localhost:8080"
    topics: tuple[str, ...] = ()
    subscription_name: str = "engine-subscription"
    key_shared: bool = False  # Key_Shared ⇒ per-key ordered (part5)
    #: subscriptionMode, :168 — Durable (broker persists the cursor) or
    #: NonDurable (reader-style, cursor dropped on disconnect); rides the
    #: ``pulsar.consumer.*`` passthrough like the other client knobs
    subscription_mode: str = "Durable"
    starting_offsets: str = "earliest"  # SubscriptionInitialPosition.Earliest
    max_entries_per_trigger: int | None = 1000  # receiver-queue-size analog
    #: consumer-client knobs (ConsumerConfigurationData field names ride
    #: the connector's ``pulsar.consumer.*`` passthrough)
    receiver_queue_size: int = 1000  # receiverQueueSize, :168
    ack_group_time_ms: int = 100  # acknowledgementsGroupTime, :169
    negative_ack_redelivery_delay_ms: int = 10_000  # :170 (the 10 s nack)
    consumer_name: str | None = None  # :171


@dataclass(frozen=True)
class PulsarSinkConfig:
    """Producer-side config — the FULL ProducerConfig surface of
    ``util/PulsarClientWrapper.scala:150-161``, defaults identical."""

    service_url: str = "pulsar://localhost:6650"
    admin_url: str = "http://localhost:8080"
    topic: str = ""
    send_timeout_ms: int = 30_000  # sendTimeout, :153
    producer_name: str | None = None  # :152
    max_pending_messages: int = 1000  # :154
    block_if_queue_full: bool = False  # :155
    message_routing_mode: str = "RoundRobinPartition"  # :156
    compression_type: str = "NONE"  # :157
    hashing_scheme: str = "JavaStringHash"  # :158 (S4 key-hash routing)
    batching_enabled: bool = True  # :159
    batching_max_messages: int = 1000  # :160
    extra: dict = field(default_factory=dict)


def _pulsar_conf_value(v) -> str:
    """Connector passthrough values are parsed as JSON into the Pulsar
    config data classes — booleans must be ``true``/``false``, not
    Python's ``True``/``False``."""
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def source_options(cfg: PulsarSourceConfig) -> dict[str, str]:
    """The option map for ``spark.readStream.format('pulsar')``.

    Admission control: ``maxEntriesPerTrigger`` bounds each micro-batch the
    way the reference's receiver queue bounds the consumer — backlog stays in
    the broker, never in the engine (PulsarPekkoSource.scala:63-65's
    pull-based contract, kept by construction in micro-batch Spark).
    """
    opts = {
        "service.url": cfg.service_url,
        "admin.url": cfg.admin_url,
        "topics": ",".join(cfg.topics),
        "predefinedSubscription": cfg.subscription_name,
        "subscriptionType": "Key_Shared" if cfg.key_shared else "Shared",
        "pulsar.consumer.subscriptionMode": cfg.subscription_mode,
        "startingOffsets": cfg.starting_offsets,
        # ConsumerConfigurationData passthrough (times are MICROS there;
        # the reference speaks ms, so the mapping converts)
        "pulsar.consumer.receiverQueueSize": str(cfg.receiver_queue_size),
        "pulsar.consumer.acknowledgementsGroupTimeMicros": str(
            cfg.ack_group_time_ms * 1000
        ),
        "pulsar.consumer.negativeAckRedeliveryDelayMicros": str(
            cfg.negative_ack_redelivery_delay_ms * 1000
        ),
    }
    if cfg.consumer_name:
        opts["pulsar.consumer.consumerName"] = cfg.consumer_name
    if cfg.max_entries_per_trigger is not None:
        opts["maxEntriesPerTrigger"] = str(cfg.max_entries_per_trigger)
    return opts


def sink_options(cfg: PulsarSinkConfig) -> dict[str, str]:
    """The option map for ``writeStream.format('pulsar')`` — every knob the
    reference's ProducerConfig sets (``PulsarClientWrapper.scala:176-198``
    applies them builder-call by builder-call; here each becomes a
    ``pulsar.producer.*`` passthrough with the ProducerConfigurationData
    field name)."""
    opts = {
        "service.url": cfg.service_url,
        "admin.url": cfg.admin_url,
        "topic": cfg.topic,
        "pulsar.producer.sendTimeoutMs": str(cfg.send_timeout_ms),
        "pulsar.producer.maxPendingMessages": str(cfg.max_pending_messages),
        "pulsar.producer.blockIfQueueFull": _pulsar_conf_value(
            cfg.block_if_queue_full
        ),
        "pulsar.producer.messageRoutingMode": cfg.message_routing_mode,
        "pulsar.producer.compressionType": cfg.compression_type,
        "pulsar.producer.hashingScheme": cfg.hashing_scheme,
        "pulsar.producer.batchingEnabled": _pulsar_conf_value(
            cfg.batching_enabled
        ),
        "pulsar.producer.batchingMaxMessages": str(cfg.batching_max_messages),
    }
    if cfg.producer_name:
        opts["pulsar.producer.producerName"] = cfg.producer_name
    opts.update({k: _pulsar_conf_value(v) for k, v in cfg.extra.items()})
    return opts


# The connector's raw output columns (its fixed metadata schema).
RAW_COLUMNS = ("value", "__key", "__topic", "__messageId", "__publishTime", "__eventTime")


def to_envelope(raw: DataFrame, payload_schema: str = "name string, numPublishes int") -> DataFrame:
    """Map the connector's raw columns onto the engine's canonical envelope.

    Works on any DataFrame with RAW_COLUMNS (streaming or batch — unit tests
    feed a batch frame).  The JSON payload decode mirrors the reference's
    play-json Schema[T] (PulsarClientSetup.scala:21-29): payload bytes →
    typed struct, with ``corrupt`` flagging undecodable rows instead of
    failing the stream (errors-as-data, same policy as the processor UDF).
    """
    # PERMISSIVE from_json yields an all-null struct for bad input, so detect
    # corruption via the standard _corrupt_record side-channel column.  A
    # NULL payload never reaches from_json (it returns NULL with no corrupt
    # record), so flag it explicitly: a message with no bytes cannot decode,
    # and reporting it corrupt=false with a null struct would let it pass
    # a "corrupt = false" filter and NPE downstream (round-8 streaming
    # sweep).  Same for payloads that are pure whitespace after the UTF-8
    # cast — from_json maps them to NULL without a corrupt record too.
    decoded = F.from_json(
        F.col("value").cast("string"), payload_schema + ", _corrupt_record string"
    )
    return raw.select(
        F.hex(F.col("__messageId")).alias("message_id"),
        F.col("__key").cast("string").alias("key"),
        F.col("__topic").alias("topic"),
        F.col("__publishTime").alias("publish_time"),
        decoded.dropFields("_corrupt_record").alias("payload"),
        (
            F.col("value").isNull()
            | decoded.isNull()
            | decoded.getField("_corrupt_record").isNotNull()
        ).alias("corrupt"),
    )


def read_stream(spark: SparkSession, cfg: PulsarSourceConfig) -> DataFrame:
    """``readStream.format('pulsar')`` with the engine's option map.

    Raises ConnectorUnavailable when the connector jar is absent (this test
    environment) — callers fall back to ``sources.streams`` file/rate sources
    which feed the identical envelope schema.
    """
    reader = spark.readStream.format("pulsar")
    for k, v in source_options(cfg).items():
        reader = reader.option(k, v)
    try:
        return to_envelope(reader.load())
    except Exception as e:  # connector jar missing → DATA_SOURCE_NOT_FOUND
        raise ConnectorUnavailable(
            "pulsar-spark connector not on the classpath; add "
            "io.streamnative.connectors:pulsar-spark-connector and a broker, "
            "or use sources.streams file/rate sources for local runs"
        ) from e


def write_stream(df: DataFrame, cfg: PulsarSinkConfig, checkpoint: str):
    """``writeStream.format('pulsar')`` — hop-counter republish sink (S3):
    the caller increments ``numPublishes`` before handing the frame over
    (PulsarClientSetup.scala:17)."""
    writer = (
        df.select(F.to_json(F.col("payload")).cast("binary").alias("value"), F.col("key"))
        .writeStream.format("pulsar")
        .option("checkpointLocation", checkpoint)
    )
    for k, v in sink_options(cfg).items():
        writer = writer.option(k, v)
    try:
        return writer.start()
    except Exception as e:
        raise ConnectorUnavailable(
            "pulsar-spark connector not on the classpath; see read_stream"
        ) from e
