"""mongodb connector over the from-scratch BSON + OP_MSG stack
(functions/bson_proto.py, operators/mongo.py)."""

from __future__ import annotations

import json
import struct

import pytest

from benthos_spark.functions.bson_proto import (MiniMongoServer, MongoClient,
                                                decode_bson, decode_op_msg,
                                                encode_bson, encode_op_msg)
from benthos_spark.operators.mongo import MongoFindOne, MongoSink, MongoSource


@pytest.fixture()
def mongod():
    s = MiniMongoServer().start()
    yield s
    s.stop()


@pytest.fixture()
def client(mongod):
    c = MongoClient(mongod.address, db="app")
    yield c
    c.close()


# ---------------------------------------------------------------------------
# BSON codec
# ---------------------------------------------------------------------------


def test_bson_spec_hello_world_vector():
    # bsonspec.org's published example: {"hello": "world"} encodes to
    # \x16\x00\x00\x00\x02hello\x00\x06\x00\x00\x00world\x00\x00
    raw = encode_bson({"hello": "world"})
    assert raw == (b"\x16\x00\x00\x00\x02hello\x00\x06\x00\x00\x00world\x00\x00")
    doc, used = decode_bson(raw)
    assert doc == {"hello": "world"} and used == len(raw)


def test_bson_roundtrip_types():
    doc = {"s": "str", "i": 7, "big": 2**40, "f": 1.5, "b": True,
           "z": None, "bin": b"\x00\x01", "sub": {"k": 1}, "arr": [1, "a", None]}
    got, _ = decode_bson(encode_bson(doc))
    assert got == doc


def test_bson_array_is_indexed_document():
    raw = encode_bson({"a": [10, 20]})
    # the array element encodes as a document with keys "0","1"
    assert b"\x040" not in raw  # sanity: type 0x04 then name 'a'
    got, _ = decode_bson(raw)
    assert got == {"a": [10, 20]}


def test_op_msg_roundtrip():
    frame = encode_op_msg(42, {"ping": 1, "$db": "x"})
    length = struct.unpack("<i", frame[:4])[0]
    assert length == len(frame)
    rid, doc = decode_op_msg(frame)
    assert rid == 42 and doc == {"ping": 1, "$db": "x"}


# ---------------------------------------------------------------------------
# Client <-> server
# ---------------------------------------------------------------------------


def test_insert_find_filters_sort(client):
    client.insert_many("users", [{"_id": f"u{i}", "age": 20 + i, "team": "a" if i % 2 else "b"}
                                 for i in range(6)])
    assert client.count("users") == 6
    got = client.find("users", filter={"age": {"$gte": 23}}, sort={"age": -1})
    assert [d["_id"] for d in got] == ["u5", "u4", "u3"]
    got2 = client.find("users", filter={"team": "a"}, limit=2)
    assert len(got2) == 2 and all(d["team"] == "a" for d in got2)
    assert client.find("users", filter={"age": {"$in": [21, 22]}},
                       sort={"age": 1})[0]["_id"] == "u1"


def test_update_upsert_delete(client):
    client.insert_many("kv", [{"_id": "k1", "v": 1}])
    out = client.update_many("kv", {"_id": "k1"}, {"$set": {"v": 2}})
    assert out["nModified"] == 1
    assert client.find("kv", {"_id": "k1"})[0]["v"] == 2
    client.update_many("kv", {"_id": "k2"}, {"$set": {"v": 9}}, upsert=True)
    assert client.find("kv", {"_id": "k2"})[0]["v"] == 9
    assert client.delete_many("kv", {"v": {"$gte": 2}}) == 2
    assert client.count("kv") == 0


def test_unknown_command_errors(client):
    with pytest.raises(IOError, match="no such command"):
        client.command({"frobnicate": 1})


# ---------------------------------------------------------------------------
# Spark integration
# ---------------------------------------------------------------------------


def test_sink_insert_then_source(spark, mongod, client):
    df = spark.createDataFrame(
        [(json.dumps({"_id": f"d{i}", "n": i}),) for i in range(8)], "value string")
    MongoSink(mongod.address, "test", "docs")(df, 0)
    src = MongoSource(url=mongod.address, database="test", collection="docs")
    rows = src.read(spark).collect()
    got = sorted(json.loads(r.value)["_id"] for r in rows)
    assert got == sorted(f"d{i}" for i in range(8))


def test_sink_upsert_idempotent_replay(spark, mongod):
    df = spark.createDataFrame(
        [(json.dumps({"k": "a", "v": 1}), "a"), (json.dumps({"k": "b", "v": 2}), "b")],
        "value string, k string")
    sink = MongoSink(mongod.address, "test", "up", operation="upsert", key_col="k")
    sink(df, 0)
    sink(df, 0)  # replay: same keys, no duplicates
    c = MongoClient(mongod.address, db="test")
    assert c.count("up") == 2
    c.close()


def test_source_split_ranges_distributed(spark, mongod):
    c = MongoClient(mongod.address, db="test")
    c.insert_many("nums", [{"_id": f"n{i:03d}", "x": i} for i in range(30)])
    c.close()
    src = MongoSource(url=mongod.address, database="test", collection="nums",
                      split_key="x", splits=[10, 20])
    df = src.read(spark)
    assert df.rdd.getNumPartitions() == 3
    assert df.count() == 30
    xs = sorted(json.loads(r.value)["x"] for r in df.collect())
    assert xs == list(range(30))


def test_find_one_processor(spark, mongod):
    c = MongoClient(mongod.address, db="test")
    c.insert_many("dims", [{"_id": "red", "hex": "#f00"}, {"_id": "blue", "hex": "#00f"}])
    c.close()
    df = spark.createDataFrame([("red",), ("blue",), ("green",)], "key string")
    out = MongoFindOne(url=mongod.address, database="test", collection="dims")(df).collect()
    by_key = {r.key: r.mongo_doc for r in out}
    assert json.loads(by_key["red"])["hex"] == "#f00"
    assert by_key["green"] is None


def test_config_wiring(mongod):
    from benthos_spark.config import _input, _output, _proc

    assert isinstance(_input({"mongodb": {"url": mongod.address, "collection": "c"}}),
                      MongoSource)
    assert isinstance(_output({"mongodb": {"url": mongod.address, "database": "d",
                                           "collection": "c"}}), MongoSink)
    assert isinstance(_proc({"mongodb": {"url": mongod.address, "collection": "c"}}),
                      MongoFindOne)
