"""Pulsar connector integration: option construction and envelope mapping
are pure and tested here; broker-dependent materialization must fail with a
clear ConnectorUnavailable in this jar-less environment."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulsar_pekko_streams_example_spark.sources.pulsar import (
    ConnectorUnavailable,
    PulsarSinkConfig,
    PulsarSourceConfig,
    read_stream,
    sink_options,
    source_options,
    to_envelope,
)


def test_source_options_mirror_reference_defaults():
    cfg = PulsarSourceConfig(topics=("persistent://t/ns/a", "persistent://t/ns/b"))
    opts = source_options(cfg)
    assert opts["topics"] == "persistent://t/ns/a,persistent://t/ns/b"
    assert opts["subscriptionType"] == "Shared"
    assert opts["startingOffsets"] == "earliest"  # Earliest initial position
    assert opts["maxEntriesPerTrigger"] == "1000"  # receiver queue analog
    # full ConsumerConfig surface (PulsarClientWrapper.scala:163-173),
    # reference defaults, ms → the passthrough's micros
    assert opts["pulsar.consumer.receiverQueueSize"] == "1000"
    assert opts["pulsar.consumer.acknowledgementsGroupTimeMicros"] == "100000"
    assert opts["pulsar.consumer.negativeAckRedeliveryDelayMicros"] == "10000000"
    assert "pulsar.consumer.consumerName" not in opts  # None omitted, like the builder
    # subscriptionMode (:168): Durable default, NonDurable overridable
    assert opts["pulsar.consumer.subscriptionMode"] == "Durable"
    named = source_options(PulsarSourceConfig(consumer_name="c-1"))
    assert named["pulsar.consumer.consumerName"] == "c-1"
    reader_style = source_options(PulsarSourceConfig(subscription_mode="NonDurable"))
    assert reader_style["pulsar.consumer.subscriptionMode"] == "NonDurable"


def test_key_shared_subscription_selected_for_ordered_mode():
    opts = source_options(PulsarSourceConfig(key_shared=True))
    assert opts["subscriptionType"] == "Key_Shared"


def test_sink_options_carry_send_timeout():
    opts = sink_options(PulsarSinkConfig(topic="persistent://t/ns/out"))
    assert opts["topic"] == "persistent://t/ns/out"
    assert opts["pulsar.producer.sendTimeoutMs"] == "30000"


def test_sink_options_mirror_full_producer_config():
    """Every knob the reference's ProducerConfig sets
    (PulsarClientWrapper.scala:150-161) maps through, defaults identical —
    including S4's JavaStringHash key routing — and booleans are emitted in
    JSON case (the passthrough parses them into ProducerConfigurationData;
    Python's 'True' would fail the parse)."""
    opts = sink_options(PulsarSinkConfig(topic="persistent://t/ns/out"))
    assert opts["pulsar.producer.maxPendingMessages"] == "1000"
    assert opts["pulsar.producer.blockIfQueueFull"] == "false"
    assert opts["pulsar.producer.messageRoutingMode"] == "RoundRobinPartition"
    assert opts["pulsar.producer.compressionType"] == "NONE"
    assert opts["pulsar.producer.hashingScheme"] == "JavaStringHash"
    assert opts["pulsar.producer.batchingEnabled"] == "true"
    assert opts["pulsar.producer.batchingMaxMessages"] == "1000"
    assert "pulsar.producer.producerName" not in opts  # None omitted
    custom = sink_options(
        PulsarSinkConfig(
            topic="t",
            producer_name="p-1",
            block_if_queue_full=True,
            extra={"pulsar.producer.batcherBuilder": "KEY_BASED", "flag": False},
        )
    )
    assert custom["pulsar.producer.producerName"] == "p-1"
    assert custom["pulsar.producer.blockIfQueueFull"] == "true"
    assert custom["pulsar.producer.batcherBuilder"] == "KEY_BASED"
    assert custom["flag"] == "false"  # extra booleans JSON-cased too


def test_to_envelope_maps_connector_columns(spark):
    raw = spark.createDataFrame(
        [
            (b'{"name": "w1", "numPublishes": 2}', b"key-1", "persistent://t/ns/a",
             b"\x08\x01", "2024-01-01 00:00:01", "2024-01-01 00:00:00"),
            (b"not json", b"key-2", "persistent://t/ns/a",
             b"\x08\x02", "2024-01-01 00:00:02", "2024-01-01 00:00:00"),
        ],
        "value binary, __key binary, __topic string, __messageId binary, "
        "__publishTime string, __eventTime string",
    ).withColumn("__publishTime", F.col("__publishTime").cast("timestamp"))
    env = to_envelope(raw).collect()
    good = next(r for r in env if r.key == "key-1")
    bad = next(r for r in env if r.key == "key-2")
    assert good.payload.name == "w1" and good.payload.numPublishes == 2
    assert not good.corrupt and good.message_id == "0801"
    assert bad.corrupt and bad.payload.name is None  # errors-as-data, stream survives


def test_read_stream_without_connector_raises_clear_error(spark):
    with pytest.raises(ConnectorUnavailable, match="connector"):
        read_stream(spark, PulsarSourceConfig(topics=("persistent://t/ns/a",)))


@pytest.mark.pulsar_integration
def test_pulsar_envelope_roundtrip_against_live_broker(spark):
    """S1 end-to-end (part1/PulsarPekkoSource.scala:54-65): readStream from a
    real broker through the connector and assert the canonical envelope
    schema comes back streaming.  Requires PULSAR_SERVICE_URL (and the
    connector jar on the classpath); skips cleanly in this jar-less,
    broker-less environment so the suite stays green everywhere while a
    deployment with a broker gets a real integration gate."""
    import os

    service = os.environ.get("PULSAR_SERVICE_URL")
    if not service:
        pytest.skip("PULSAR_SERVICE_URL not set: no broker in this environment")
    cfg = PulsarSourceConfig(
        service_url=service,
        admin_url=os.environ.get("PULSAR_ADMIN_URL", "http://localhost:8080"),
        topics=(os.environ.get("PULSAR_TOPIC", "persistent://public/default/engine-it"),),
    )
    try:
        env = read_stream(spark, cfg)
    except ConnectorUnavailable:
        pytest.skip("broker URL set but pulsar-spark connector jar missing")
    assert env.isStreaming
    assert set(env.columns) == {
        "message_id", "key", "topic", "publish_time", "payload", "corrupt"
    }
