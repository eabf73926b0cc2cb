"""gcp_pubsub connector over the public v1 REST surface
(operators/gcp_pubsub.py) against the loopback MiniPubSubServer —
the same hookup shape as Google's own Pub/Sub emulator."""

from __future__ import annotations

import os
import time

import pytest

from benthos_spark.operators.gcp_pubsub import (MiniPubSubServer, PubSubClient,
                                                PubSubSink, PubSubSource)


@pytest.fixture()
def pubsub():
    s = MiniPubSubServer(ack_deadline_s=1.0).start()
    yield s
    s.stop()


@pytest.fixture()
def client(pubsub):
    c = PubSubClient(pubsub.endpoint, "proj")
    c.create_topic("events")
    c.create_subscription("events-sub", "events")
    return c


def _wait_for(pred, timeout_s=15.0):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(0.05)
    return False


def test_publish_pull_ack_roundtrip(client):
    ids = client.publish("events", [(b"m1", {"k": "v"}), (b"m2", {})])
    assert len(ids) == 2
    got = client.pull("events-sub")
    assert len(got) == 2
    import base64

    assert base64.b64decode(got[0]["message"]["data"]) == b"m1"
    assert got[0]["message"]["attributes"] == {"k": "v"}
    client.acknowledge("events-sub", [m["ackId"] for m in got])
    assert client.pull("events-sub") == []


def test_unacked_redelivery_after_deadline(client):
    client.publish("events", [(b"precious", {})])
    got = client.pull("events-sub")
    assert len(got) == 1  # leased, NOT acked
    assert client.pull("events-sub") == []  # in-flight: invisible
    time.sleep(1.2)  # ack deadline passes
    again = client.pull("events-sub")
    assert len(again) == 1  # redelivered — at-least-once
    client.acknowledge("events-sub", [again[0]["ackId"]])


def test_fanout_to_multiple_subscriptions(client):
    client.create_subscription("second-sub", "events")
    client.publish("events", [(b"fan", {})])
    a = client.pull("events-sub")
    b = client.pull("second-sub")
    assert len(a) == 1 and len(b) == 1


def test_sink_then_batch_source(spark, pubsub, client):
    df = spark.createDataFrame([(f"p{i}", "red") for i in range(6)],
                               "value string, color string")
    PubSubSink(pubsub.endpoint, "proj", "events", attr_cols=["color"])(df, 0)
    src = PubSubSource(endpoint=pubsub.endpoint, project="proj",
                       subscription="events-sub")
    rows = src.read(spark).collect()
    assert sorted(r.value for r in rows) == sorted(f"p{i}" for i in range(6))
    # drained + acked
    assert client.pull("events-sub") == []


def test_streaming_pull_spool(spark, pubsub, client, tmp_path):
    src = PubSubSource(endpoint=pubsub.endpoint, project="proj",
                       subscription="events-sub", streaming=True,
                       spool_dir=str(tmp_path / "spool"))
    df = src.read(spark)
    assert df.isStreaming
    try:
        client.publish("events", [(b"s1", {}), (b"s2", {})])
        spool = str(tmp_path / "spool")
        assert _wait_for(lambda: os.path.isdir(spool) and len(os.listdir(spool)) >= 2)
        rows = spark.read.format("text").load(spool).collect()
        assert sorted(r.value for r in rows) == ["s1", "s2"]
        # everything acked once spooled
        assert _wait_for(lambda: not pubsub._leased)
    finally:
        src.stop()


def test_config_wiring(pubsub):
    from benthos_spark.config import _input, _output

    src = _input({"gcp_pubsub": {"endpoint": pubsub.endpoint, "project": "p",
                                 "subscription": "s"}})
    assert isinstance(src, PubSubSource)
    sink = _output({"gcp_pubsub": {"endpoint": pubsub.endpoint, "project": "p",
                                   "topic": "t"}})
    assert isinstance(sink, PubSubSink)
