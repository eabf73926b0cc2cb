"""pulsar connectors over the from-scratch binary protocol
(functions/pulsar_proto.py, operators/pulsario.py). Frame-level shapes
are pinned against the published spec (totalSize/commandSize framing,
the 0x0E01 payload magic, CRC32C over metadataSize+metadata+payload),
so the client and broker aren't merely tested against each other."""

from __future__ import annotations

import struct
import time

import pytest
from pyspark.sql import functions as F

from benthos_spark.functions.kafka_proto import crc32c
from benthos_spark.functions.pulsar_proto import (MAGIC_CRC32C,
                                                  MiniPulsarBroker,
                                                  PulsarClient,
                                                  encode_command,
                                                  encode_payload_command,
                                                  read_command)
from benthos_spark.operators.pulsario import PulsarSink, PulsarSource


@pytest.fixture()
def broker():
    b = MiniPulsarBroker().start()
    yield b
    b.stop()


# ---------------------------------------------------------------------------
# wire pins
# ---------------------------------------------------------------------------


def test_frame_layout_spec():
    f = encode_command({"type": 18, "ping": {}})
    total, cmd_size = struct.unpack(">II", f[:8])
    assert total == len(f) - 4            # totalSize excludes itself
    assert cmd_size == len(f) - 8         # commandSize covers the command


def test_payload_frame_magic_and_crc():
    f = encode_payload_command(
        {"type": 6, "send": {"producerId": 1, "sequenceId": 0}},
        {"producerName": "p", "sequenceId": 0, "publishTime": 0},
        b"hello")
    total, cmd_size = struct.unpack(">II", f[:8])
    tail = f[8 + cmd_size:]
    assert tail[:2] == MAGIC_CRC32C == b"\x0e\x01"
    crc = struct.unpack(">I", tail[2:6])[0]
    # CRC32C over everything AFTER the checksum (the spec's coverage)
    assert crc == crc32c(tail[6:])
    meta_size = struct.unpack(">I", tail[6:10])[0]
    assert tail[10 + meta_size:] == b"hello"


def test_corrupted_payload_rejected(broker):
    import socket as _socket

    c = PulsarClient(broker.url)
    c.create_producer("t")
    f = bytearray(encode_payload_command(
        {"type": 6, "send": {"producerId": 1, "sequenceId": 0}},
        {"producerName": "p", "sequenceId": 0, "publishTime": 0},
        b"tampered"))
    f[-1] ^= 0xFF  # flip a payload byte after the CRC was computed
    c.sock.sendall(bytes(f))
    # broker must drop the connection rather than store a corrupt entry
    c.sock.settimeout(5)
    with pytest.raises((ConnectionError, _socket.timeout, OSError)):
        read_command(c.sock)
    assert broker.topics["t"] == []


# ---------------------------------------------------------------------------
# client/broker behavior
# ---------------------------------------------------------------------------


def test_produce_consume_ack_roundtrip(broker):
    p = PulsarClient(broker.url)
    p.create_producer("orders")
    for i in range(5):
        mid = p.send(f"m{i}".encode(), properties={"i": str(i)})
        assert mid["entryId"] == i
    p.close()

    c = PulsarClient(broker.url)
    c.subscribe("orders", "subA", initial_position=1)
    c.flow(100)
    got = []
    for _ in range(5):
        msg = c.receive(timeout_s=5)
        got.append(msg["payload"])
        c.ack(msg["message_id"])
    assert got == [f"m{i}".encode() for i in range(5)]
    assert c.receive(timeout_s=0.3) is None
    c.close()


def test_unacked_redelivery_on_disconnect(broker):
    p = PulsarClient(broker.url)
    p.create_producer("jobs")
    p.send(b"job-1")
    p.close()

    c1 = PulsarClient(broker.url)
    c1.subscribe("jobs", "workers")
    c1.flow(10)
    msg = c1.receive(timeout_s=5)
    assert msg["payload"] == b"job-1"
    c1.close()  # crash before ack -> redelivery

    deadline = time.monotonic() + 5
    got = None
    while got is None and time.monotonic() < deadline:
        c2 = PulsarClient(broker.url)
        c2.subscribe("jobs", "workers")
        c2.flow(10)
        got = c2.receive(timeout_s=0.5)
        if got is not None:
            c2.ack(got["message_id"])
        c2.close()
    assert got is not None and got["payload"] == b"job-1"


def test_latest_position_skips_history(broker):
    p = PulsarClient(broker.url)
    p.create_producer("t2")
    p.send(b"old")
    c = PulsarClient(broker.url)
    c.subscribe("t2", "tail", initial_position=0)  # Latest
    c.flow(10)
    p.send(b"new")
    msg = c.receive(timeout_s=5)
    assert msg["payload"] == b"new"
    p.close()
    c.close()


# ---------------------------------------------------------------------------
# Spark connectors
# ---------------------------------------------------------------------------


def test_sink_then_source_batch(broker, spark):
    df = spark.range(20).select(
        F.concat(F.lit("p-"), F.col("id")).alias("value"),
        F.col("id").cast("string").alias("k"))
    PulsarSink(broker.url, "bulk", key_col="k")(df, 0)
    src = PulsarSource(url=broker.url, topic="bulk",
                       subscription_name="reader")
    out = src.read(spark)
    vals = sorted(r.value for r in out.collect())
    assert vals == sorted(f"p-{i}" for i in range(20))
    # all acked: a second subscribe on the same subscription sees nothing
    again = PulsarSource(url=broker.url, topic="bulk",
                         subscription_name="reader", idle_timeout_s=0.3)
    assert again.read(spark).count() == 0


def test_config_wiring(broker, spark):
    from benthos_spark.config import _input, _output

    sink = _output({"pulsar": {"url": broker.url, "topic": "cfg"}})
    sink(spark.createDataFrame([("wired",)], "value string"), 0)
    src = _input({"pulsar": {"url": broker.url, "topics": ["cfg"],
                             "subscription_name": "s"}})
    assert [r.value for r in src.read(spark).collect()] == ["wired"]
