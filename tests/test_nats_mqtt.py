"""NATS + MQTT connectors over the from-scratch protocol stacks
(functions/nats_proto.py, functions/mqtt_proto.py; operators/natsio.py,
operators/mqttio.py) — loopback-TCP integration, same shape as the
reference's Dockerised integration tests."""

from __future__ import annotations

import os
import threading
import time

import pytest

from benthos_spark.functions.mqtt_proto import (MiniMqttBroker,
                                                MqttConnection,
                                                encode_remaining_length,
                                                topic_matches)
from benthos_spark.functions.nats_proto import (MiniNatsServer,
                                                NatsConnection,
                                                subject_matches)
from benthos_spark.operators.mqttio import MqttSink, MqttSource
from benthos_spark.operators.natsio import NatsSink, NatsSource


@pytest.fixture()
def nats():
    s = MiniNatsServer().start()
    yield s
    s.stop()


@pytest.fixture()
def mqtt():
    b = MiniMqttBroker().start()
    yield b
    b.stop()


def _wait_for(pred, timeout_s=15.0, step=0.05):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(step)
    return False


# ---------------------------------------------------------------------------
# Protocol semantics
# ---------------------------------------------------------------------------


def test_nats_subject_wildcards():
    assert subject_matches("foo.bar", "foo.bar")
    assert not subject_matches("foo.bar", "foo.baz")
    assert subject_matches("foo.*", "foo.bar")
    assert not subject_matches("foo.*", "foo.bar.baz")
    assert subject_matches("foo.>", "foo.bar.baz")
    assert not subject_matches("foo.>", "foo")
    assert subject_matches("*.b.>", "a.b.c.d")


def test_mqtt_topic_wildcards():
    assert topic_matches("a/b", "a/b")
    assert topic_matches("a/+", "a/b")
    assert not topic_matches("a/+", "a/b/c")
    assert topic_matches("a/#", "a/b/c")
    assert topic_matches("#", "anything/at/all")
    assert not topic_matches("a/b", "a")


def test_mqtt_remaining_length_encoding():
    # spec §2.2.3 examples
    assert encode_remaining_length(0) == b"\x00"
    assert encode_remaining_length(127) == b"\x7f"
    assert encode_remaining_length(128) == b"\x80\x01"
    assert encode_remaining_length(16383) == b"\xff\x7f"
    assert encode_remaining_length(16384) == b"\x80\x80\x01"


def test_nats_pubsub_roundtrip(nats):
    got = []
    sub = NatsConnection(nats.address)
    sub.subscribe("orders.created", lambda s, p, r: got.append((s, p)))
    time.sleep(0.05)
    pub = NatsConnection(nats.address)
    pub.publish("orders.created", b"hello")
    pub.publish("orders.deleted", b"nope")  # not subscribed
    pub.flush()
    assert _wait_for(lambda: len(got) == 1)
    assert got[0] == ("orders.created", b"hello")
    sub.close()
    pub.close()


def test_nats_queue_group_balances(nats):
    got_a, got_b = [], []
    a = NatsConnection(nats.address)
    b = NatsConnection(nats.address)
    a.subscribe("jobs", lambda s, p, r: got_a.append(p), queue="workers")
    b.subscribe("jobs", lambda s, p, r: got_b.append(p), queue="workers")
    time.sleep(0.05)
    pub = NatsConnection(nats.address)
    for i in range(10):
        pub.publish("jobs", f"j{i}".encode())
    pub.flush()
    assert _wait_for(lambda: len(got_a) + len(got_b) == 10)
    # round-robin: each member got some, none got all
    assert got_a and got_b and len(got_a) + len(got_b) == 10
    for c in (a, b, pub):
        c.close()


def test_mqtt_qos1_roundtrip(mqtt):
    got = []
    sub = MqttConnection(mqtt.address, client_id="sub")
    sub.subscribe("sensors/+/temp", lambda t, p: got.append((t, p)))
    pub = MqttConnection(mqtt.address, client_id="pub")
    pub.publish("sensors/a/temp", b"21.5")       # qos1: waits for PUBACK
    pub.publish("sensors/a/humidity", b"0.4")    # filtered out
    assert _wait_for(lambda: len(got) == 1)
    assert got[0] == ("sensors/a/temp", b"21.5")
    sub.close()
    pub.close()


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def test_nats_sink_to_source_stream(spark, nats, tmp_path):
    src = NatsSource(url=nats.address, subject="pipe.out",
                     spool_dir=str(tmp_path / "spool")).start()
    try:
        NatsSink(nats.address, subject="pipe.out")(
            spark.createDataFrame([("n1",), ("n2",), ("n3",)], "value string"), 0)
        spool = str(tmp_path / "spool")
        assert _wait_for(lambda: os.path.isdir(spool) and len(os.listdir(spool)) >= 3)
        rows = spark.read.format("text").load(spool).collect()
        assert sorted(r.value for r in rows) == ["n1", "n2", "n3"]
    finally:
        src.stop()


def test_mqtt_sink_to_source_stream(spark, mqtt, tmp_path):
    src = MqttSource(url=mqtt.address, topic="out/#",
                     spool_dir=str(tmp_path / "spool")).start()
    try:
        df = spark.createDataFrame([("m1", "out/a"), ("m2", "out/b")],
                                   "value string, t string")
        MqttSink(mqtt.address, topic_col="t")(df, 0)
        spool = str(tmp_path / "spool")
        assert _wait_for(lambda: os.path.isdir(spool) and len(os.listdir(spool)) >= 2)
        rows = spark.read.format("text").load(spool).collect()
        assert sorted(r.value for r in rows) == ["m1", "m2"]
    finally:
        src.stop()


def test_config_wiring(nats, mqtt, tmp_path):
    from benthos_spark.config import _input, _output

    n_in = _input({"nats": {"url": nats.address, "subject": "s",
                            "spool_dir": str(tmp_path / "n")}})
    assert isinstance(n_in, NatsSource)
    m_in = _input({"mqtt": {"url": mqtt.address, "topic": "t",
                            "spool_dir": str(tmp_path / "m")}})
    assert isinstance(m_in, MqttSource)
    assert isinstance(_output({"nats": {"url": nats.address, "subject": "s"}}), NatsSink)
    assert isinstance(_output({"mqtt": {"url": mqtt.address, "topic": "t"}}), MqttSink)
