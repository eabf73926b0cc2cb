"""NSQ + beanstalkd connectors over the from-scratch protocol stacks
(functions/queue_protos.py, operators/queueio.py)."""

from __future__ import annotations

import os
import struct
import time

import pytest

from benthos_spark.functions.queue_protos import (BeanstalkdConnection,
                                                  MiniBeanstalkdServer,
                                                  MiniNsqServer,
                                                  NSQ_FRAME_MESSAGE,
                                                  NsqConnection,
                                                  nsq_encode_message,
                                                  nsq_frame)
from benthos_spark.operators.queueio import (BeanstalkdSink, BeanstalkdSource,
                                             NsqSink, NsqSource)


@pytest.fixture()
def nsqd():
    s = MiniNsqServer().start()
    yield s
    s.stop()


@pytest.fixture()
def bean():
    s = MiniBeanstalkdServer().start()
    yield s
    s.stop()


def _wait_for(pred, timeout_s=15.0):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(0.05)
    return False


# ---------------------------------------------------------------------------
# Protocol shapes
# ---------------------------------------------------------------------------


def test_nsq_frame_layout():
    f = nsq_frame(NSQ_FRAME_MESSAGE, b"xy")
    # size covers frame-type + data
    assert struct.unpack(">i", f[:4])[0] == 6
    assert struct.unpack(">i", f[4:8])[0] == 2
    assert f[8:] == b"xy"
    m = nsq_encode_message(b"0" * 16, b"body", attempts=3, ts_ns=123)
    assert struct.unpack(">q", m[:8])[0] == 123
    assert struct.unpack(">H", m[8:10])[0] == 3
    assert m[10:26] == b"0" * 16 and m[26:] == b"body"


def test_nsq_pub_sub_channels(nsqd):
    pub = NsqConnection(nsqd.address)
    pub.pub("events", b"pre")  # before any channel exists: retained
    got_a, got_b = [], []
    a = NsqConnection(nsqd.address)
    a.sub("events", "ch_a", got_a.append)
    b = NsqConnection(nsqd.address)
    b.sub("events", "ch_b", got_b.append)
    pub.pub("events", b"live")
    # first channel adopted the retained message; both channels get live
    assert _wait_for(lambda: got_a == [b"pre", b"live"])
    assert _wait_for(lambda: got_b == [b"live"])
    for c in (pub, a, b):
        c.close()


def test_nsq_channel_balances_consumers(nsqd):
    got_1, got_2 = [], []
    c1 = NsqConnection(nsqd.address)
    c1.sub("jobs", "workers", got_1.append)
    c2 = NsqConnection(nsqd.address)
    c2.sub("jobs", "workers", got_2.append)
    pub = NsqConnection(nsqd.address)
    for i in range(10):
        pub.pub("jobs", f"j{i}".encode())
    assert _wait_for(lambda: len(got_1) + len(got_2) == 10)
    assert got_1 and got_2  # one channel, round-robin across consumers
    for c in (c1, c2, pub):
        c.close()


def test_beanstalkd_put_reserve_delete(bean):
    c = BeanstalkdConnection(bean.address)
    c.use("jobs")
    jid = c.put(b"task-1")
    assert jid == 1
    c.put(b"task-0", pri=10)  # lower pri value = more urgent
    c.watch("jobs")
    got = c.reserve(timeout_s=1)
    assert got is not None and got[1] == b"task-0"  # priority order
    c.delete(got[0])
    got2 = c.reserve(timeout_s=1)
    assert got2[1] == b"task-1"
    c.delete(got2[0])
    assert c.reserve(timeout_s=0) is None
    c.close()


def test_beanstalkd_blocking_reserve_wakes(bean):
    import threading

    c = BeanstalkdConnection(bean.address)
    c.watch("t")

    def put_later():
        time.sleep(0.15)
        p = BeanstalkdConnection(bean.address)
        p.use("t")
        p.put(b"late")
        p.close()

    threading.Thread(target=put_later, daemon=True).start()
    t0 = time.time()
    got = c.reserve(timeout_s=5)
    assert got is not None and got[1] == b"late"
    assert time.time() - t0 < 4.0
    c.delete(got[0])
    c.close()


def test_beanstalkd_requeue_on_drop(bean):
    c = BeanstalkdConnection(bean.address)
    c.use("frag")
    c.put(b"precious")
    r = BeanstalkdConnection(bean.address)
    r.watch("frag")
    got = r.reserve(timeout_s=1)
    assert got is not None
    r.close()  # dies without delete → requeued
    c.watch("frag")
    assert _wait_for(lambda: bean.tubes.get("frag"))
    got2 = c.reserve(timeout_s=2)
    assert got2 is not None and got2[1] == b"precious"
    c.close()


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def test_nsq_sink_to_source(spark, nsqd, tmp_path):
    src = NsqSource(address=nsqd.address, topic="pipe", channel="spark",
                    spool_dir=str(tmp_path / "spool")).start()
    try:
        NsqSink(nsqd.address, topic="pipe")(
            spark.createDataFrame([("x1",), ("x2",)], "value string"), 0)
        spool = str(tmp_path / "spool")
        assert _wait_for(lambda: os.path.isdir(spool) and len(os.listdir(spool)) >= 2)
        rows = spark.read.format("text").load(spool).collect()
        assert sorted(r.value for r in rows) == ["x1", "x2"]
    finally:
        src.stop()


def test_beanstalkd_sink_to_batch_source(spark, bean):
    BeanstalkdSink(bean.address, tube="spark")(
        spark.createDataFrame([("b1",), ("b2",), ("b3",)], "value string"), 0)
    src = BeanstalkdSource(address=bean.address, tube="spark")
    rows = src.read(spark).collect()
    assert sorted(r.value for r in rows) == ["b1", "b2", "b3"]
    # drained
    assert not bean.tubes.get("spark")


def test_config_wiring(nsqd, bean, tmp_path):
    from benthos_spark.config import _input, _output

    assert isinstance(_input({"nsq": {"address": nsqd.address, "topic": "t",
                                      "spool_dir": str(tmp_path / "n")}}), NsqSource)
    assert isinstance(_input({"beanstalkd": {"address": bean.address}}),
                      BeanstalkdSource)
    assert isinstance(_output({"nsq": {"address": nsqd.address, "topic": "t"}}), NsqSink)
    assert isinstance(_output({"beanstalkd": {"address": bean.address}}), BeanstalkdSink)
