"""amqp_1 connectors over the from-scratch AMQP 1.0 codec
(functions/amqp1_proto.py, operators/amqp1.py). Type-system encodings
are pinned against the OASIS spec byte-for-byte, so the codec isn't
merely tested against itself."""

from __future__ import annotations

import struct
import time

import pytest
from pyspark.sql import functions as F

from benthos_spark.functions.amqp1_proto import (AMQP_HEADER,
                                                 Amqp1Connection, Described,
                                                 MiniAmqp1Broker, Symbol,
                                                 Uint, decode_message,
                                                 decode_value, encode_frame,
                                                 encode_message, encode_value)
from benthos_spark.operators.amqp1 import Amqp1Sink, Amqp1Source


@pytest.fixture()
def broker():
    b = MiniAmqp1Broker().start()
    yield b
    b.stop()


# ---------------------------------------------------------------------------
# §1.6 encoding pins
# ---------------------------------------------------------------------------


def test_primitive_encodings_pinned():
    assert encode_value(None) == b"\x40"
    assert encode_value(True) == b"\x41"
    assert encode_value(False) == b"\x42"
    assert encode_value(5) == b"\x53\x05"                  # smallulong
    assert encode_value(Uint(0)) == b"\x43"                # uint0
    assert encode_value(Uint(7)) == b"\x52\x07"            # smalluint
    assert encode_value("ab") == b"\xa1\x02ab"             # str8-utf8
    assert encode_value(Symbol("x")) == b"\xa3\x01x"       # sym8
    assert encode_value(b"\x01\x02") == b"\xa0\x02\x01\x02"  # vbin8
    assert encode_value([]) == b"\x45"                     # list0
    # list8: size=count byte + items
    assert encode_value([True]) == b"\xc0\x02\x01\x41"
    # described: 0x00 + descriptor + value
    assert encode_value(Described(0x24, [])) == b"\x00\x53\x24\x45"


def test_encoding_roundtrip_all_shapes():
    cases = [None, True, False, 0, 7, 300, 2 ** 40, -5, "hé", Symbol("sym"),
             b"bytes" * 100, [1, "a", [True, None]], {"k": 1, "j": "v"},
             Uint(0), Uint(4096),
             Described(0x75, b"payload"), "x" * 300]
    for v in cases:
        enc = encode_value(v)
        out, pos = decode_value(enc)
        assert pos == len(enc), v
        assert out == v, v


def test_frame_header_layout():
    f = encode_frame(3, Described(0x10, ["cid"]))
    size, doff, ftype, channel = struct.unpack(">IBBH", f[:8])
    assert size == len(f) and doff == 2 and ftype == 0 and channel == 3
    assert AMQP_HEADER == b"AMQP\x00\x01\x00\x00"


def test_message_sections_roundtrip():
    payload = encode_message(b"body", {"k": "v", "n": 3})
    body, props = decode_message(payload)
    assert body == b"body" and props == {"k": "v", "n": 3}


# ---------------------------------------------------------------------------
# client/broker
# ---------------------------------------------------------------------------


def test_send_receive_accept(broker):
    tx = Amqp1Connection(broker.url)
    tx.attach_sender("orders")
    for i in range(5):
        tx.send(f"m{i}".encode(), app_properties={"i": i})
    tx.close()

    rx = Amqp1Connection(broker.url)
    rx.attach_receiver("orders")
    got = []
    for _ in range(5):
        msg = rx.receive(timeout_s=5)
        got.append(msg["body"])
        rx.accept(msg["delivery_id"])
    assert got == [f"m{i}".encode() for i in range(5)]
    assert rx.receive(timeout_s=0.3) is None
    rx.close()
    time.sleep(0.1)
    assert broker.queues["orders"] == []  # all settled


def test_unsettled_requeue_on_disconnect(broker):
    tx = Amqp1Connection(broker.url)
    tx.attach_sender("jobs")
    tx.send(b"job-1")
    tx.close()

    rx1 = Amqp1Connection(broker.url)
    rx1.attach_receiver("jobs")
    msg = rx1.receive(timeout_s=5)
    assert msg["body"] == b"job-1"
    rx1.close()  # crash before accept -> broker requeues

    deadline = time.monotonic() + 5
    got = None
    while got is None and time.monotonic() < deadline:
        rx2 = Amqp1Connection(broker.url)
        rx2.attach_receiver("jobs")
        got = rx2.receive(timeout_s=0.5)
        if got is not None:
            rx2.accept(got["delivery_id"])
        rx2.close()
    assert got is not None and got["body"] == b"job-1"


# ---------------------------------------------------------------------------
# Spark connectors
# ---------------------------------------------------------------------------


def test_sink_then_source(broker, spark):
    df = spark.range(15).select(
        F.concat(F.lit("a-"), F.col("id")).alias("value"))
    Amqp1Sink(broker.url, "bulk")(df, 0)
    src = Amqp1Source(url=broker.url, source_address="bulk")
    out = sorted(r.value for r in src.read(spark).collect())
    assert out == sorted(f"a-{i}" for i in range(15))
    # accepted: a second receiver sees an empty queue
    again = Amqp1Source(url=broker.url, source_address="bulk",
                        idle_timeout_s=0.3)
    assert again.read(spark).count() == 0


def test_config_wiring(broker, spark):
    from benthos_spark.config import _input, _output

    sink = _output({"amqp_1": {"url": broker.url, "target_address": "cfg"}})
    sink(spark.createDataFrame([("wired",)], "value string"), 0)
    src = _input({"amqp_1": {"url": broker.url, "source_address": "cfg"}})
    assert [r.value for r in src.read(spark).collect()] == ["wired"]
