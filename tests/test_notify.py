"""pusher / sentry_capture / discord connectors and the ristretto
cache (operators/notify.py, operators/ristretto.py). The pusher mini
server verifies the published HMAC-SHA256 auth signature by
independent recomputation; the ristretto tests exercise the TinyLFU
admission behavior, not just the dict surface."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from benthos_spark.operators.notify import (DiscordSink, DiscordSource,
                                            MiniDiscordServer,
                                            MiniPusherServer,
                                            MiniSentryServer, PusherClient,
                                            PusherSink,
                                            SentryCaptureProcessor,
                                            parse_dsn, pusher_sign)
from benthos_spark.operators.ristretto import RistrettoCache


# ---------------------------------------------------------------------------
# ristretto
# ---------------------------------------------------------------------------


def test_ristretto_basic_and_add():
    c = RistrettoCache(max_cost=10_000)
    assert c.get("a") is None
    c.set("a", "1")
    assert c.get("a") == "1"
    assert c.add("a", "2") is False
    assert c.add("b", "3") is True
    c.delete("a")
    assert c.get("a") is None


def test_ristretto_ttl_expiry():
    c = RistrettoCache(default_ttl_s=0.05)
    c.set("k", "v")
    assert c.get("k") == "v"
    import time

    time.sleep(0.08)
    assert c.get("k") is None
    assert c.add("k", "v2") is True  # expired key is addable again


def test_ristretto_admission_protects_hot_keys():
    c = RistrettoCache(max_cost=60)  # fits a handful of entries
    for _ in range(50):              # make "hot" clearly frequent
        c.set("hot", "x")
        c.get("hot")
    # a burst of cold one-shot keys must not displace the hot entry
    for i in range(200):
        c.set(f"cold{i}", "y")
    assert c.get("hot") == "x"


def test_ristretto_cost_bound_holds():
    c = RistrettoCache(max_cost=100)
    for i in range(100):
        c.set(f"k{i}", "v" * 10)
    assert c._cost <= 100


# ---------------------------------------------------------------------------
# pusher
# ---------------------------------------------------------------------------


def test_pusher_signature_shape():
    q = {"auth_key": "k", "auth_timestamp": "1", "auth_version": "1.0",
         "body_md5": "d41d8cd98f00b204e9800998ecf8427e"}
    sig = pusher_sign("secret", "POST", "/apps/1/events", q)
    # published scheme: hex HMAC-SHA256 over 'POST\npath\nsorted query'
    import hashlib
    import hmac as _hmac

    sts = ("POST\n/apps/1/events\n"
           "auth_key=k&auth_timestamp=1&auth_version=1.0&"
           "body_md5=d41d8cd98f00b204e9800998ecf8427e")
    assert sig == _hmac.new(b"secret", sts.encode(), hashlib.sha256).hexdigest()


def test_pusher_trigger_and_sink(spark):
    srv = MiniPusherServer().start()
    try:
        bad = PusherClient(srv.endpoint, srv.app_id, srv.key, "wrong")
        with pytest.raises(IOError):
            bad.trigger_batch([{"name": "e", "channel": "c", "data": "x"}])

        df = spark.range(12).select(
            F.concat(F.lit("ev-"), F.col("id")).alias("value"))
        PusherSink(srv.endpoint, srv.app_id, srv.key, srv.secret,
                   event="order_created", channel="sales")(df, 0)
        got = sorted(e["data"] for e in srv.events["sales"])
        assert got == sorted(f"ev-{i}" for i in range(12))
        assert all(e["name"] == "order_created" for e in srv.events["sales"])
    finally:
        srv.stop()


# ---------------------------------------------------------------------------
# sentry
# ---------------------------------------------------------------------------


def test_parse_dsn():
    assert parse_dsn("http://abc@h:1234/42") == ("http://h:1234", "abc", "42")


def test_sentry_capture_tap(spark):
    srv = MiniSentryServer().start()
    try:
        df = spark.createDataFrame([("boom", "svcA"), ("ok", "svcB")],
                                   "value string, svc string")
        proc = SentryCaptureProcessor(
            srv.dsn, level="warning", environment="prod", release="1.2.3",
            tags_cols={"service": "svc"})
        out = proc(df).collect()  # tap: batch unchanged
        assert sorted(r.value for r in out) == ["boom", "ok"]
        msgs = {e["message"]: e for e in srv.events}
        assert set(msgs) == {"boom", "ok"}
        e = msgs["boom"]
        assert (e["level"], e["environment"], e["release"]) == \
            ("warning", "prod", "1.2.3")
        assert e["tags"] == {"service": "svcA"}
    finally:
        srv.stop()


def test_sentry_sampling_deterministic(spark):
    srv = MiniSentryServer().start()
    try:
        df = spark.createDataFrame([(f"m{i}",) for i in range(40)],
                                   "value string")
        proc = SentryCaptureProcessor(srv.dsn, sampling_rate=0.5)
        proc(df).count()
        first = sorted(e["message"] for e in srv.events)
        assert 0 < len(first) < 40
        srv.events.clear()
        proc(df).count()  # redelivery samples the SAME subset
        assert sorted(e["message"] for e in srv.events) == first
    finally:
        srv.stop()


# ---------------------------------------------------------------------------
# discord
# ---------------------------------------------------------------------------


def test_discord_sink_then_source_cursor(spark):
    srv = MiniDiscordServer().start()
    try:
        srv.post("c1", "manual hello")
        df = spark.range(3).select(
            F.concat(F.lit("bot-"), F.col("id")).alias("value"))
        DiscordSink(srv.endpoint, "c1", srv.bot_token)(df, 0)
        src = DiscordSource(endpoint=srv.endpoint, channel_id="c1",
                            bot_token=srv.bot_token)
        out = src.read(spark).collect()
        assert sorted(r.value for r in out) == \
            sorted(["manual hello", "bot-0", "bot-1", "bot-2"])
        # ids are a replayable cursor: polling after the max id is empty
        assert src._poll(max(r.message_id for r in out)) == []
    finally:
        srv.stop()


def test_discord_auth_required(spark):
    srv = MiniDiscordServer().start()
    try:
        src = DiscordSource(endpoint=srv.endpoint, channel_id="c",
                            bot_token="WRONG")
        with pytest.raises(IOError):
            src._poll("0")
    finally:
        srv.stop()


def test_config_wiring(spark):
    from benthos_spark.config import _cache_resource, _input, _output, _proc

    cache = _cache_resource({"label": "x", "ristretto": {}})
    cache.set("k", "v")
    assert cache.get("k") == "v"

    dsrv = MiniDiscordServer().start()
    try:
        sink = _output({"discord": {"endpoint": dsrv.endpoint,
                                    "channel_id": "c", "bot_token": "token"}})
        sink(spark.createDataFrame([("hi",)], "value string"), 0)
        src = _input({"discord": {"endpoint": dsrv.endpoint,
                                  "channel_id": "c", "bot_token": "token"}})
        assert [r.value for r in src.read(spark).collect()] == ["hi"]
    finally:
        dsrv.stop()

    ssrv = MiniSentryServer().start()
    try:
        proc = _proc({"sentry_capture": {"dsn": ssrv.dsn, "level": "ERROR"}})
        proc(spark.createDataFrame([("oops",)], "value string")).count()
        assert ssrv.events[0]["level"] == "error"
    finally:
        ssrv.stop()
