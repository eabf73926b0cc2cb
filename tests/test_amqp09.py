"""AMQP 0-9-1 connector over the from-scratch frame codec + broker
(functions/amqp_proto.py, operators/amqp09.py)."""

from __future__ import annotations

import os
import time

import pytest

from benthos_spark.functions.amqp_proto import (AmqpConnection, Args,
                                                MiniAmqpBroker, encode_frame,
                                                topic_key_matches)
from benthos_spark.operators.amqp09 import Amqp09Sink, Amqp09Source


@pytest.fixture()
def broker():
    b = MiniAmqpBroker().start()
    yield b
    b.stop()


def _wait_for(pred, timeout_s=15.0):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(0.05)
    return False


# ---------------------------------------------------------------------------
# Codec semantics
# ---------------------------------------------------------------------------


def test_args_bit_packing_roundtrip():
    # §4.2.5.2: consecutive bits pack into one octet, LSB first
    raw = Args().shortstr("q").bit(True).bit(False).bit(True).short(7).done()
    a = Args(raw)
    assert a.r_shortstr() == "q"
    assert a.r_bits(3) == [True, False, True]
    assert a.r_short() == 7


def test_field_table_roundtrip():
    raw = Args().table({"product": "x", "version": "1"}).done()
    got = Args(raw).r_table()
    assert got == {"product": b"x", "version": b"1"}


def test_frame_layout():
    f = encode_frame(1, 3, b"\x01\x02")
    # type=1, channel=3, size=2, payload, frame-end 0xCE
    assert f == b"\x01\x00\x03\x00\x00\x00\x02\x01\x02\xce"


def test_topic_key_matching():
    assert topic_key_matches("a.*.c", "a.b.c")
    assert not topic_key_matches("a.*.c", "a.b.b.c")
    assert topic_key_matches("a.#", "a")
    assert topic_key_matches("a.#", "a.b.c")
    assert topic_key_matches("#.c", "a.b.c")
    assert not topic_key_matches("a.b", "a")


# ---------------------------------------------------------------------------
# Client <-> broker
# ---------------------------------------------------------------------------


def test_handshake_declare_publish_get(broker):
    conn = AmqpConnection(broker.address)
    assert conn.queue_declare("work") == "work"
    conn.publish("", "work", b"m1")       # default exchange routes by name
    conn.publish("", "work", b"m2")
    # round-trip a declare so the async publishes land first
    conn.queue_declare("work")
    assert conn.get("work") == b"m1"
    assert conn.get("work") == b"m2"
    assert conn.get("work") is None
    conn.close()


def test_exchange_routing_direct_fanout_topic(broker):
    conn = AmqpConnection(broker.address)
    for q in ("q1", "q2", "qt"):
        conn.queue_declare(q)
    conn.exchange_declare("ex.direct", "direct")
    conn.exchange_declare("ex.fan", "fanout")
    conn.exchange_declare("ex.topic", "topic")
    conn.queue_bind("q1", "ex.direct", "red")
    conn.queue_bind("q1", "ex.fan", "")
    conn.queue_bind("q2", "ex.fan", "")
    conn.queue_bind("qt", "ex.topic", "logs.*.err")
    conn.publish("ex.direct", "red", b"d")
    conn.publish("ex.direct", "blue", b"dropped")
    conn.publish("ex.fan", "whatever", b"f")
    conn.publish("ex.topic", "logs.web.err", b"t")
    conn.publish("ex.topic", "logs.web.info", b"dropped")
    conn.queue_declare("q1")  # flush
    assert conn.get("q1") == b"d"
    assert conn.get("q1") == b"f"
    assert conn.get("q1") is None
    assert conn.get("q2") == b"f"
    assert conn.get("qt") == b"t"
    conn.close()


def test_consume_push_with_acks(broker):
    pub = AmqpConnection(broker.address)
    pub.queue_declare("push")
    pub.publish("", "push", b"early")  # queued before the consumer exists
    pub.queue_declare("push")
    got = []
    sub = AmqpConnection(broker.address)
    sub.consume("push", lambda body, rk: got.append((body, rk)))
    assert _wait_for(lambda: len(got) == 1)
    pub.publish("", "push", b"late")
    assert _wait_for(lambda: len(got) == 2)
    assert got == [(b"early", "push"), (b"late", "push")]
    # everything acked: broker's unacked book is empty
    assert _wait_for(lambda: not broker._unacked)
    sub.close()
    pub.close()


def test_unacked_requeue_on_consumer_drop(broker):
    """At-least-once: a consumer that dies mid-delivery gets its
    message requeued for the next consumer."""
    pub = AmqpConnection(broker.address)
    pub.queue_declare("fragile")

    class DyingConn(AmqpConnection):
        pass

    died = []
    sub = AmqpConnection(broker.address)

    def crash(body, rk):
        died.append(body)
        sub._sock.close()  # simulate consumer death BEFORE ack
        raise ConnectionError("boom")

    sub.consume("fragile", crash)
    pub.publish("", "fragile", b"precious")
    assert _wait_for(lambda: died)
    # message is requeued once the broker notices the drop
    assert _wait_for(lambda: broker.queues.get("fragile"))
    assert pub.get("fragile") == b"precious"
    pub.close()


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def test_sink_then_batch_source(spark, broker):
    df = spark.createDataFrame([(f"a{i}",) for i in range(8)], "value string")
    Amqp09Sink(broker.address, exchange="", key="batchq",
               declare_queue="batchq")(df, 0)
    src = Amqp09Source(url=broker.address, queue="batchq", streaming=False)
    rows = src.read(spark).collect()
    assert sorted(r.value for r in rows) == sorted(f"a{i}" for i in range(8))


def test_streaming_consume_spool(spark, broker, tmp_path):
    src = Amqp09Source(url=broker.address, queue="sq", declare=True,
                       spool_dir=str(tmp_path / "spool"))
    df = src.read(spark)
    assert df.isStreaming
    try:
        pub = AmqpConnection(broker.address)
        for i in range(3):
            pub.publish("", "sq", f"s{i}".encode())
        pub.queue_declare("sq")
        spool = str(tmp_path / "spool")
        assert _wait_for(lambda: len(os.listdir(spool)) >= 3)
        got = spark.read.format("text").load(spool).collect()
        assert sorted(r.value for r in got) == ["s0", "s1", "s2"]
        pub.close()
    finally:
        src.stop()


def test_config_wiring(broker, tmp_path):
    from benthos_spark.config import _input, _output

    src = _input({"amqp_0_9": {"url": broker.address, "queue": "q",
                               "spool_dir": str(tmp_path / "s")}})
    assert isinstance(src, Amqp09Source)
    sink = _output({"amqp_0_9": {"url": broker.address, "exchange": "",
                                 "key": "q"}})
    assert isinstance(sink, Amqp09Sink)
