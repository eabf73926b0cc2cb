"""couchbase processor + cache over the from-scratch KV binary
protocol (functions/couchbase_proto.py, operators/couchbase.py).
Header framing is pinned against the published protocol_binary layout,
and the mini server enforces the SASL PLAIN + SELECT_BUCKET gate."""

from __future__ import annotations

import struct

import pytest

from benthos_spark.functions.couchbase_proto import (HEADER, MAGIC_REQ,
                                                     OP_GET, OP_SET,
                                                     CouchbaseClient,
                                                     CouchbaseError,
                                                     MiniCouchbaseServer,
                                                     pack_request,
                                                     read_packet)
from benthos_spark.operators.couchbase import (CouchbaseCache,
                                               CouchbaseProcessor)


@pytest.fixture()
def cb():
    srv = MiniCouchbaseServer().start()
    yield srv
    srv.stop()


def _client(cb) -> CouchbaseClient:
    return CouchbaseClient(cb.url, "user", "pass", "default")


# ---------------------------------------------------------------------------
# wire pins
# ---------------------------------------------------------------------------


def test_header_layout_pinned():
    # 24-byte header, big-endian, magic 0x80, SET extras = flags+expiry
    pkt = pack_request(OP_SET, key=b"k", value=b"v",
                       extras=struct.pack(">II", 0, 60), opaque=7, cas=9)
    assert len(pkt) == 24 + 8 + 1 + 1
    magic, opcode, klen, elen, dtype, vb, blen, opaque, cas = HEADER.unpack(pkt[:24])
    assert (magic, opcode, klen, elen, blen, opaque, cas) == \
        (MAGIC_REQ, OP_SET, 1, 8, 10, 7, 9)
    assert pkt[24:32] == struct.pack(">II", 0, 60)   # extras before key
    assert pkt[32:33] == b"k" and pkt[33:] == b"v"


def test_auth_gate(cb):
    with pytest.raises(CouchbaseError):   # wrong password
        CouchbaseClient(cb.url, "user", "wrong", "default")
    with pytest.raises(CouchbaseError):   # unknown bucket
        CouchbaseClient(cb.url, "user", "pass", "nope")
    # data ops before select-bucket are refused
    import socket

    raw = socket.create_connection(("127.0.0.1", cb.port))
    raw.sendall(pack_request(OP_GET, key=b"k"))
    assert read_packet(raw)["status"] == 0x0020  # AUTH_ERROR
    raw.close()


def test_kv_verbs(cb):
    c = _client(cb)
    assert c.get("k") is None
    c.set("k", b"v1")
    assert c.get("k") == b"v1"
    assert c.add("k", b"v2") is False      # atomic ADD conflict
    assert c.add("k2", b"x") is True
    c.replace("k", b"v3")
    assert c.get("k") == b"v3"
    with pytest.raises(CouchbaseError):    # REPLACE misses -> KEY_ENOENT
        c.replace("missing", b"z")
    c.delete("k")
    assert c.get("k") is None
    c.close()


# ---------------------------------------------------------------------------
# processor + cache
# ---------------------------------------------------------------------------


def test_processor_upsert_then_get(cb, spark):
    df = spark.createDataFrame(
        [("doc1", '{"a": 1}'), ("doc2", '{"b": 2}')],
        "key string, value string")
    up = CouchbaseProcessor(cb.url, username="user", password="pass",
                            operation="upsert", content_col="value")
    out = up(df).collect()
    assert all(r["_error"] is None for r in out)

    get = CouchbaseProcessor(cb.url, username="user", password="pass",
                             operation="get")
    got = {r.key: r.value for r in get(df).collect()}
    assert got == {"doc1": '{"a": 1}', "doc2": '{"b": 2}'}


def test_processor_get_miss_sets_error(cb, spark):
    df = spark.createDataFrame([("nope",)], "key string")
    get = CouchbaseProcessor(cb.url, username="user", password="pass",
                             operation="get", col="key")
    row = get(df).collect()[0]
    assert row["_error"] is not None and "not found" in row["_error"]


def test_processor_insert_conflict(cb, spark):
    df = spark.createDataFrame([("dup", "x")], "key string, value string")
    ins = CouchbaseProcessor(cb.url, username="user", password="pass",
                             operation="insert", content_col="value")
    assert ins(df).collect()[0]["_error"] is None
    assert ins(df).collect()[0]["_error"] is not None  # second insert errors


def test_processor_requires_content():
    with pytest.raises(ValueError, match="content must be set"):
        CouchbaseProcessor("couchbase://x:1", operation="upsert")


def test_cache_and_config(cb, spark):
    from benthos_spark.config import _cache_resource, _proc

    cache = CouchbaseCache(cb.url, username="user", password="pass")
    cache.set("a", "1")
    assert cache.get("a") == "1"
    assert cache.add("a", "2") is False
    cache.delete("a")
    assert cache.get("a") is None

    c2 = _cache_resource({"label": "x", "couchbase": {
        "url": cb.url, "username": "user", "password": "pass"}})
    c2.set("cfg", "ok")
    assert c2.get("cfg") == "ok"

    proc = _proc({"couchbase": {"url": cb.url, "username": "user",
                                "password": "pass", "operation": "get"}})
    df = spark.createDataFrame([("cfg",)], "key string")
    assert proc(df.withColumn("value", df.key)).collect()[0].value == "ok"
