"""Redis connector family over the from-scratch RESP stack.

Server + client live in this repo (functions/resp.py, operators/redis.py)
— the same wire protocol an external Redis speaks, exercised over
loopback TCP exactly like the reference's integration tests run against
a Dockerised Redis (internal/impl/redis/integration_test.go)."""

from __future__ import annotations

import json
import time

import pytest

from benthos_spark.functions.resp import (MiniRedisServer, RespError,
                                          RespReader, Simple, encode_command,
                                          encode_reply)
from benthos_spark.operators.redis import (RedisCache, RedisClient,
                                           RedisHashSink, RedisListSink,
                                           RedisListSource, RedisProcessor,
                                           RedisPubSubSink, RedisPubSubSource,
                                           RedisRateLimit, RedisStreamsSink,
                                           RedisStreamsSource)


@pytest.fixture()
def server():
    srv = MiniRedisServer().start()
    yield srv
    srv.stop()


@pytest.fixture()
def client(server):
    c = RedisClient(server.address)
    yield c
    c.close()


# ---------------------------------------------------------------------------
# Wire codec
# ---------------------------------------------------------------------------


def test_resp_encode_command_vectors():
    # protocol-spec example: LLEN mylist
    assert encode_command("LLEN", "mylist") == b"*2\r\n$4\r\nLLEN\r\n$6\r\nmylist\r\n"
    assert encode_command("SET", "k", b"\x00\x01") == b"*3\r\n$3\r\nSET\r\n$1\r\nk\r\n$2\r\n\x00\x01\r\n"


def test_resp_encode_reply_vectors():
    assert encode_reply(Simple("OK")) == b"+OK\r\n"
    assert encode_reply(1000) == b":1000\r\n"
    assert encode_reply(b"hello") == b"$5\r\nhello\r\n"
    assert encode_reply(None) == b"$-1\r\n"
    assert encode_reply([b"a", 2]) == b"*2\r\n$1\r\na\r\n:2\r\n"
    assert encode_reply(RespError("ERR boom")) == b"-ERR boom\r\n"


# ---------------------------------------------------------------------------
# Server command semantics (through the real client socket)
# ---------------------------------------------------------------------------


def test_strings_set_get_ttl_nx(client):
    assert client.cmd("PING") == Simple("PONG")
    assert client.cmd("SET", "k", "v") == Simple("OK")
    assert client.cmd("GET", "k") == b"v"
    assert client.cmd("SET", "k", "w", "NX") is None  # NX on existing
    assert client.cmd("GET", "k") == b"v"
    assert client.cmd("SET", "k2", "x", "PX", "40") == Simple("OK")
    assert client.cmd("GET", "k2") == b"x"
    time.sleep(0.08)
    assert client.cmd("GET", "k2") is None
    assert client.cmd("PTTL", "missing") == -2
    assert client.cmd("TTL", "k") == -1
    assert client.cmd("INCRBY", "n", 5) == 5
    assert client.cmd("INCR", "n") == 6
    assert client.cmd("DEL", "k", "n") == 2


def test_wrongtype_and_unknown(client):
    client.cmd("RPUSH", "l", "a")
    with pytest.raises(RespError, match="WRONGTYPE"):
        client.cmd("GET", "l")
    with pytest.raises(RespError, match="unknown command"):
        client.cmd("NOPE")


def test_lists_push_pop_blocking(client, server):
    assert client.cmd("RPUSH", "q", "a", "b") == 2
    assert client.cmd("LPUSH", "q", "z") == 3
    assert client.cmd("LRANGE", "q", 0, -1) == [b"z", b"a", b"b"]
    assert client.cmd("LPOP", "q") == b"z"
    assert client.cmd("BLPOP", "q", 1, timeout_s=5) == [b"q", b"a"]
    # blocking pop released by a concurrent push
    import threading

    def push_later():
        time.sleep(0.15)
        RedisClient(server.address).cmd("RPUSH", "q2", "late")

    threading.Thread(target=push_later, daemon=True).start()
    assert client.cmd("BLPOP", "q2", 5, timeout_s=10) == [b"q2", b"late"]
    assert client.cmd("BLPOP", "empty", 0.1, timeout_s=5) is None


def test_hashes_and_sets(client):
    assert client.cmd("HSET", "h", "f1", "1", "f2", "2") == 2
    assert client.cmd("HGET", "h", "f1") == b"1"
    got = client.cmd("HGETALL", "h")
    assert dict(zip(got[::2], got[1::2])) == {b"f1": b"1", b"f2": b"2"}
    assert client.cmd("SADD", "s", "a", "b", "a") == 2
    assert client.cmd("SCARD", "s") == 2
    assert client.cmd("SISMEMBER", "s", "a") == 1
    assert client.cmd("SREM", "s", "a") == 1


def test_streams_xadd_xrange_xread(client):
    id1 = client.cmd("XADD", "st", "1-1", "body", "m1")
    id2 = client.cmd("XADD", "st", "*", "body", "m2")
    assert id1 == b"1-1"
    assert client.cmd("XLEN", "st") == 2
    ents = client.cmd("XRANGE", "st", "-", "+")
    assert [e[0] for e in ents] == [id1, id2]
    # exclusive XREAD after id1 sees only m2
    got = client.cmd("XREAD", "STREAMS", "st", "1-1")
    assert len(got) == 1 and got[0][0] == b"st"
    assert [e[0] for e in got[0][1]] == [id2]
    # monotonic id enforcement
    with pytest.raises(RespError, match="equal or smaller"):
        client.cmd("XADD", "st", "1-1", "body", "dup")
    last = client.cmd("XREVRANGE", "st", "+", "-", "COUNT", 1)
    assert last[0][0] == id2


def test_pipeline(client):
    out = client.pipeline([("SET", "a", "1"), ("SET", "b", "2"), ("GET", "a")])
    assert out[2] == b"1"


# ---------------------------------------------------------------------------
# Cache + rate limit resources
# ---------------------------------------------------------------------------


def test_redis_cache_protocol(server):
    cache = RedisCache(server.address, prefix="bs:")
    assert cache.get("k") is None
    cache.set("k", {"a": 1})
    assert cache.get("k") == {"a": 1}
    assert cache.add("k", "other") is False  # dedupe primitive
    assert cache.add("fresh", 7) is True
    assert sorted(cache.items()) == [("fresh", 7), ("k", {"a": 1})]
    cache.delete("k")
    assert cache.get("k") is None


def test_redis_cache_ttl(server):
    cache = RedisCache(server.address, default_ttl_ms=50)
    cache.set("t", "v")
    assert cache.get("t") == "v"
    time.sleep(0.1)
    assert cache.get("t") is None


def test_redis_rate_limit(server):
    rl = RedisRateLimit(server.address, key="rl", count=3, interval_s=0.2)
    assert [rl.allow() for _ in range(4)] == [True, True, True, False]
    time.sleep(0.25)  # window expired
    assert rl.allow() is True


# ---------------------------------------------------------------------------
# Spark inputs / outputs
# ---------------------------------------------------------------------------


def test_list_source_batch_and_sink_roundtrip(spark, server):
    RedisListSink(server.address, key="jobs")(  # rpush via foreachPartition
        spark.createDataFrame([("m1",), ("m2",), ("m3",)], "value string"), 0)
    src = RedisListSource(url=server.address, key="jobs")
    got = sorted(r.value for r in src.read(spark).collect())
    assert got == ["m1", "m2", "m3"]
    # queue drained
    assert RedisClient(server.address).cmd("LLEN", "jobs") == 0


def test_list_sink_key_col(spark, server):
    df = spark.createDataFrame([("a", "k1"), ("b", "k2")], "value string, target string")
    RedisListSink(server.address, command="rpush", key_col="target")(df, 0)
    c = RedisClient(server.address)
    assert c.cmd("LRANGE", "k1", 0, -1) == [b"a"]
    assert c.cmd("LRANGE", "k2", 0, -1) == [b"b"]


def test_list_source_streaming_spool(spark, server, tmp_path):
    src = RedisListSource(url=server.address, key="sq", streaming=True,
                          spool_dir=str(tmp_path / "spool"), poll_timeout_s=0.2)
    df = src.read(spark)
    assert df.isStreaming
    c = RedisClient(server.address)
    for i in range(3):
        c.cmd("RPUSH", "sq", f"msg{i}")
    out = str(tmp_path / "out")
    q = (df.writeStream.format("parquet")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .option("path", out).trigger(processingTime="300 milliseconds").start())
    try:
        deadline = time.time() + 45
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 3:
                    break
            except Exception:
                pass
            time.sleep(0.4)
        rows = sorted(r.value for r in spark.read.parquet(out).collect())
        assert rows == ["msg0", "msg1", "msg2"]
    finally:
        q.stop()
        src.stop()


def test_pubsub_roundtrip(spark, server, tmp_path):
    src = RedisPubSubSource(url=server.address, channels=["events"],
                            spool_dir=str(tmp_path / "spool")).start()
    try:
        RedisPubSubSink(server.address, channel="events")(
            spark.createDataFrame([("p1",), ("p2",)], "value string"), 0)
        deadline = time.time() + 20
        spooled = []
        import os
        while time.time() < deadline and len(spooled) < 2:
            d = str(tmp_path / "spool")
            spooled = [f for f in os.listdir(d)] if os.path.isdir(d) else []
            time.sleep(0.1)
        df = spark.read.format("text").load(str(tmp_path / "spool"))
        assert sorted(r.value for r in df.collect()) == ["p1", "p2"]
    finally:
        src.stop()


def test_hash_sink(spark, server):
    df = spark.createDataFrame([("u1", "alice", 30), ("u2", "bob", 25)],
                               "id string, name string, age int")
    RedisHashSink(server.address, key_col="id", field_cols=["name", "age"])(df, 0)
    c = RedisClient(server.address)
    got = c.cmd("HGETALL", "u1")
    assert dict(zip(got[::2], got[1::2])) == {b"name": b"alice", b"age": b"30"}


def test_streams_sink_and_batch_source(spark, server):
    df = spark.createDataFrame([("e1", "wav"), ("e2", "flac")], "value string, codec string")
    RedisStreamsSink(server.address, stream="clips", meta_cols=["codec"])(df, 0)
    src = RedisStreamsSource(url=server.address, streams=["clips"], streaming=False)
    rows = src.read(spark).orderBy("ms", "seq").collect()
    assert [bytes(r.body).decode() for r in rows] == ["e1", "e2"] or \
           sorted(bytes(r.body).decode() for r in rows) == ["e1", "e2"]
    assert {r.fields["codec"] for r in rows} == {"wav", "flac"}
    assert all(r.key == "clips" for r in rows)


def test_streams_source_incremental_stream(spark, server, tmp_path):
    """The Spark-native path: stream-entry-id offsets through a real
    checkpointed micro-batch stream — appended entries arrive exactly
    once."""
    c = RedisClient(server.address)
    c.cmd("XADD", "s1", "*", "body", "first")
    src = RedisStreamsSource(url=server.address, streams=["s1"])
    df = src.read(spark)
    assert df.isStreaming
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = (df.writeStream.format("parquet").option("checkpointLocation", ckpt)
         .option("path", out).trigger(processingTime="300 milliseconds").start())
    try:
        deadline = time.time() + 45
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 1:
                    break
            except Exception:
                pass
            time.sleep(0.4)
        c.cmd("XADD", "s1", "*", "body", "second")
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 2:
                    break
            except Exception:
                pass
            time.sleep(0.4)
        rows = spark.read.parquet(out).collect()
        assert sorted(bytes(r.body).decode() for r in rows) == ["first", "second"]
        # exactly once: no duplicates across micro-batches
        assert len(rows) == 2
    finally:
        q.stop()


# ---------------------------------------------------------------------------
# Processor
# ---------------------------------------------------------------------------


def test_redis_processor_old_style_ops(spark, server):
    df = spark.createDataFrame([("colors", "red"), ("colors", "blue"), ("colors", "red")],
                               "key string, value string")
    out = RedisProcessor(url=server.address, operator="sadd")(df).collect()
    # sadd returns 1 for new members, 0 for the duplicate
    assert sorted(r.redis_result for r in out) == ["0", "1", "1"]
    df2 = spark.createDataFrame([("colors", "")], "key string, value string")
    got = RedisProcessor(url=server.address, operator="scard")(df2).collect()
    assert got[0].redis_result == "2"


def test_redis_processor_command_style(spark, server):
    df = spark.createDataFrame([("hits", 3), ("hits", 4)], "k string, by int")
    out = RedisProcessor(url=server.address, command="INCRBY",
                         args_cols=["k", "by"])(df).collect()
    # rows may run in either partition order; the final counter is fixed
    got = sorted(int(r.redis_result) for r in out)
    assert got in ([3, 7], [4, 7])
    assert RedisClient(server.address).cmd("GET", "hits") == b"7"


def test_redis_processor_config_validation():
    with pytest.raises(ValueError, match="old style"):
        RedisProcessor(url="x")
    with pytest.raises(ValueError, match="old style"):
        RedisProcessor(url="x", operator="sadd", command="GET")


# ---------------------------------------------------------------------------
# Config wiring
# ---------------------------------------------------------------------------


def test_config_cache_resource_redis(server):
    from benthos_spark.config import Resources

    res = Resources.from_config({
        "cache_resources": [
            {"label": "rc", "redis": {"url": server.address, "prefix": "p:"}},
        ]
    })
    res.caches["rc"].set("k", "v")
    assert res.caches["rc"].get("k") == "v"


def test_config_redis_input_output_wiring(server, tmp_path):
    from benthos_spark.config import _input, _output, _proc

    src = _input({"redis_list": {"url": server.address, "key": "q"}})
    assert isinstance(src, RedisListSource)
    sink = _output({"redis_streams": {"url": server.address, "stream": "s"}})
    assert isinstance(sink, RedisStreamsSink)
    proc = _proc({"redis": {"url": server.address, "operator": "scard"}})
    assert isinstance(proc, RedisProcessor)
