"""schema_registry_encode / schema_registry_decode (internal/impl/confluent/).

The avro decode vectors are ported VERBATIM from the reference's
processor_schema_registry_decode_test.go (testSchema + the wire-byte
inputs and expected Avro-JSON / raw-JSON outputs), and the protobuf
multi-message cases from serde_protobuf_test.go. The logical-type
vector is skipped: this engine doesn't implement Avro logical types
(the reference itself documents goavro's logical-type encode bug in
processor_schema_registry_encode.go's Known Issues)."""

from __future__ import annotations

import json

import pytest

from benthos_spark.functions import schema_registry as sr
from benthos_spark.functions.jsonschema import validate as js_validate

# -- reference schema (processor_schema_registry_decode_test.go:103) ---------

TEST_SCHEMA = """{
    "namespace": "foo.namespace.com",
    "type": "record",
    "name": "identity",
    "fields": [
        { "name": "Name", "type": "string"},
        { "name": "Address", "type": ["null",{
            "namespace": "my.namespace.com",
            "type": "record",
            "name": "address",
            "fields": [
                { "name": "City", "type": ["null", "string"], "default": null },
                { "name": "State", "type": "string" }
            ]
        }],"default":null},
        {"name": "MaybeHobby", "type": ["null","string"] }
    ]
}"""

THINGS_PROTO = """
syntax = "proto3";
package things;

message foo {
  float a = 1;
  string b = 2;
}

message bar {
  string b = 1;
}
"""


@pytest.fixture(scope="module")
def registry():
    server = sr.RegistryServer().start()
    yield server
    server.stop()


# -- wire format ---------------------------------------------------------------


def test_wire_header_roundtrip():
    framed = sr.insert_id(3, b"payload")
    assert framed[:5] == b"\x00\x00\x00\x00\x03"
    sid, rest = sr.extract_id(framed)
    assert sid == 3 and rest == b"payload"


def test_wire_header_rejects():
    with pytest.raises(sr.SchemaRegistryError, match="version number 6 not supported"):
        sr.extract_id(b"\x06\x00\x00\x00\x03")
    with pytest.raises(sr.SchemaRegistryError, match="empty"):
        sr.extract_id(b"")


def test_message_indexes():
    # serde_protobuf.go:275 — [0] optimizes to a single zero byte
    assert sr.message_indexes_to_bytes([0]) == b"\x00"
    assert sr.read_message_indexes(b"\x00rest") == (1, [0])
    b = sr.message_indexes_to_bytes([1, 2])
    consumed, idx = sr.read_message_indexes(b + b"tail")
    assert idx == [1, 2] and consumed == len(b)


# -- avro serde: reference decode vectors ---------------------------------------

AVRO_CASES = [
    (
        b"\x00\x00\x00\x00\x03\x06foo\x02\x02\x06foo\x06bar\x02\x0edancing",
        '{"Address":{"my.namespace.com.address":{"City":{"string":"foo"},'
        '"State":"bar"}},"MaybeHobby":{"string":"dancing"},"Name":"foo"}',
    ),
    (
        b"\x00\x00\x00\x00\x03\x06foo\x02\x02\x06foo\x06bar\x00",
        '{"Address":{"my.namespace.com.address":{"City":{"string":"foo"},'
        '"State":"bar"}},"MaybeHobby":null,"Name":"foo"}',
    ),
    (
        b"\x00\x00\x00\x00\x03\x06foo\x00\x00",
        '{"Name":"foo","MaybeHobby":null,"Address": null}',
    ),
]

RAW_JSON_CASES = [
    (
        b"\x00\x00\x00\x00\x03\x06foo\x02\x02\x06foo\x06bar\x02\x0edancing",
        '{"Address":{"City":"foo","State":"bar"},"MaybeHobby":"dancing","Name":"foo"}',
    ),
    (
        b"\x00\x00\x00\x00\x03\x06foo\x02\x02\x06foo\x06bar\x00",
        '{"Address":{"City":"foo","State":"bar"},"MaybeHobby":null,"Name":"foo"}',
    ),
    (
        b"\x00\x00\x00\x00\x03\x06foo\x00\x00",
        '{"Name":"foo","MaybeHobby":null,"Address": null}',
    ),
]


@pytest.mark.parametrize("wire,expected", AVRO_CASES)
def test_avro_decode_reference_vectors(wire, expected):
    serde = sr.AvroSerde(json.loads(TEST_SCHEMA), raw_json=False)
    _, payload = sr.extract_id(wire)
    assert json.loads(serde.decode(payload)) == json.loads(expected)


@pytest.mark.parametrize("wire,expected", RAW_JSON_CASES)
def test_avro_decode_raw_json_vectors(wire, expected):
    serde = sr.AvroSerde(json.loads(TEST_SCHEMA), raw_json=True)
    _, payload = sr.extract_id(wire)
    assert json.loads(serde.decode(payload)) == json.loads(expected)


@pytest.mark.parametrize("wire,expected", AVRO_CASES)
def test_avro_encode_roundtrip(wire, expected):
    """encode(textual avro JSON) reproduces the reference wire bytes."""
    serde = sr.AvroSerde(json.loads(TEST_SCHEMA), raw_json=False)
    assert serde.encode(expected.encode()) == wire[5:]


@pytest.mark.parametrize("wire,expected", RAW_JSON_CASES)
def test_avro_encode_raw_roundtrip(wire, expected):
    serde = sr.AvroSerde(json.loads(TEST_SCHEMA), raw_json=True)
    assert serde.encode(expected.encode()) == wire[5:]


def test_avro_references_hydrate():
    """serde_avro.go:13-46 — root array-of-names becomes a union."""
    refs = {
        "thing": '{"type":"record","name":"thing","fields":[{"name":"x","type":"int"}]}',
        "other": '{"type":"record","name":"other","fields":[{"name":"y","type":"string"}]}',
    }
    doc = sr.hydrate_avro_references('["thing","other"]', refs)
    serde = sr.AvroSerde(doc, raw_json=False)
    wire = serde.encode(b'{"other":{"y":"hi"}}')
    assert json.loads(serde.decode(wire)) == {"other": {"y": "hi"}}
    with pytest.raises(sr.SchemaRegistryError, match="'missing' was not found"):
        sr.hydrate_avro_references('["missing"]', refs)


# -- protobuf serde --------------------------------------------------------------


def test_protobuf_roundtrip_and_indexes():
    serde = sr.ProtobufSerde(THINGS_PROTO, {})
    wire = serde.encode(b'{"a":123,"b":"hello world"}')
    # 'foo' is the first top-level message → single-zero-byte indexes
    assert wire[0] == 0
    assert json.loads(serde.decode(wire)) == {"a": 123.0, "b": "hello world"}


def test_protobuf_second_message_indexes():
    serde = sr.ProtobufSerde(THINGS_PROTO, {})
    # {"a":...} only fits foo; force bar by giving the caching a foo
    # first, then a doc only bar accepts? both accept {"b":...} —
    # instead address bar explicitly through its index path.
    wire = sr.message_indexes_to_bytes([1]) + b"\x0a\x03zzz"
    assert json.loads(serde.decode(wire)) == {"b": "zzz"}


def test_protobuf_alternating_messages_cache():
    """serde_protobuf_test.go TestProtobufEncodeMultipleMessagesCaching"""
    schema = """
syntax = "proto3";
package things;

message foo {
  float a = 1;
  string b = 2;
}

message bar {
  float c = 1;
  string d = 2;
}
"""
    serde = sr.ProtobufSerde(schema, {})
    for _ in range(3):
        w1 = serde.encode(b'{"a":1.5,"b":"foo"}')
        w2 = serde.encode(b'{"c":2.5,"d":"bar"}')
        assert json.loads(serde.decode(w1)) == {"a": 1.5, "b": "foo"}
        assert json.loads(serde.decode(w2)) == {"c": 2.5, "d": "bar"}


def test_protobuf_unknown_field_rejected():
    serde = sr.ProtobufSerde(THINGS_PROTO, {})
    with pytest.raises(sr.SchemaRegistryError, match="no message type accepts"):
        serde.encode(b'{"a":123,"b":"x","zzz":"what"}')


def test_protobuf_nested_message_indexes():
    schema = """
syntax = "proto3";
package things;

message outer {
  message inner {
    string s = 1;
  }
  inner i = 1;
}
"""
    serde = sr.ProtobufSerde(schema, {})
    fqn = serde._by_indexes([0, 0])
    assert fqn.endswith("outer.inner")
    assert serde._indexes_of(fqn) == [0, 0]


# -- json serde -------------------------------------------------------------------


def test_json_serde_validates():
    schema = json.dumps(
        {
            "type": "object",
            "required": ["name"],
            "properties": {
                "name": {"type": "string"},
                "age": {"type": "integer", "minimum": 0},
            },
            "additionalProperties": False,
        }
    )
    serde = sr.JsonSerde(schema, {})
    ok = b'{"name":"ann","age":3}'
    assert serde.encode(ok) == ok and serde.decode(ok) == ok
    with pytest.raises(sr.SchemaRegistryError, match="age"):
        serde.encode(b'{"name":"ann","age":-1}')
    with pytest.raises(sr.SchemaRegistryError, match="required"):
        serde.encode(b"{}")


def test_jsonschema_validator_core():
    sch = {
        "type": "object",
        "properties": {
            "tags": {"type": "array", "items": {"type": "string"}, "minItems": 1},
            "kind": {"enum": ["a", "b"]},
            "nested": {"$ref": "#/definitions/pt"},
        },
        "definitions": {
            "pt": {
                "type": "object",
                "properties": {"x": {"type": "number"}},
                "required": ["x"],
            }
        },
    }
    assert js_validate(sch, {"tags": ["t"], "kind": "a", "nested": {"x": 1.5}}) == []
    assert js_validate(sch, {"tags": []}) != []
    assert js_validate(sch, {"kind": "c"}) != []
    assert js_validate(sch, {"nested": {}}) != []
    assert js_validate({"oneOf": [{"type": "string"}, {"type": "integer"}]}, 3) == []
    assert js_validate({"oneOf": [{"type": "number"}, {"type": "integer"}]}, 3) != []


# -- registry server + client -------------------------------------------------------


def test_registry_server_and_client(registry):
    sid = registry.register("identity", TEST_SCHEMA, "AVRO")
    # identical schema dedupes to the same global id
    assert registry.register("identity-2", TEST_SCHEMA, "AVRO") == sid
    client = sr.RegistryClient(registry.url)
    info = client.schema_by_id(sid)
    assert info["schemaType"] == "AVRO" and json.loads(info["schema"])
    latest = client.schema_by_subject("identity")
    assert latest["id"] == sid and latest["version"] == 1 and latest["subject"] == "identity"
    with pytest.raises(sr.SchemaRegistryError, match="schema '999999' not found by registry"):
        client.schema_by_id(999999)
    with pytest.raises(
        sr.SchemaRegistryError, match="schema subject 'nope' not found by registry"
    ):
        client.schema_by_subject("nope")


def test_registry_versions(registry):
    v1 = '{"type":"record","name":"v","fields":[{"name":"a","type":"int"}]}'
    v2 = '{"type":"record","name":"v","fields":[{"name":"a","type":"int"},{"name":"b","type":["null","string"],"default":null}]}'
    registry.register("versioned", v1)
    registry.register("versioned", v2)
    client = sr.RegistryClient(registry.url)
    assert json.loads(client.schema_by_subject("versioned", 1)["schema"]) == json.loads(v1)
    assert json.loads(client.schema_by_subject("versioned")["schema"]) == json.loads(v2)


def test_registry_references_walk(registry):
    child = '{"type":"record","name":"leaf","fields":[{"name":"n","type":"int"}]}'
    registry.register("leaf-subject", child)
    parent_refs = [{"name": "leaf", "subject": "leaf-subject", "version": 1}]
    sid = registry.register("union-root", '["leaf"]', "AVRO", parent_refs)
    client = sr.RegistryClient(registry.url)
    info = client.schema_by_id(sid)
    refs = client.walk_references(info)
    assert json.loads(refs["leaf"]) == json.loads(child)
    serde = sr.build_serde(info, refs, avro_raw_json=False)
    wire = serde.encode(b'{"leaf":{"n":7}}')
    assert json.loads(serde.decode(wire)) == {"leaf": {"n": 7}}


# -- processors over Spark -----------------------------------------------------------


def test_processor_roundtrip_spark(spark, registry):
    from benthos_spark.operators.confluent import (
        SchemaRegistryDecode,
        SchemaRegistryEncode,
    )

    registry.register("people", TEST_SCHEMA, "AVRO")
    docs = [
        '{"Name":"ann","Address":{"my.namespace.com.address":{"City":{"string":"x"},"State":"CA"}},"MaybeHobby":{"string":"chess"}}',
        '{"Name":"bob","Address":null,"MaybeHobby":null}',
    ]
    df = spark.createDataFrame([(d,) for d in docs], "value string")
    enc = SchemaRegistryEncode(url=registry.url, subject="people", col="value",
                              out_col="framed")
    dec = SchemaRegistryDecode(url=registry.url, col="framed", out_col="decoded")
    out = dec(enc(df)).select("value", "framed", "decoded", "_error").collect()
    for row in out:
        assert row["_error"] is None
        assert row["framed"][0] == 0
        assert json.loads(row["decoded"]) == json.loads(row["value"])


def test_processor_error_routing_spark(spark, registry):
    from benthos_spark.operators.confluent import SchemaRegistryDecode

    sid = registry.register("people", TEST_SCHEMA, "AVRO")
    good_wire = sr.insert_id(sid, b"\x06foo\x00\x00")
    df = spark.createDataFrame(
        [(b"\x06bad-magic",), (good_wire,)],
        "value binary",
    )
    dec = SchemaRegistryDecode(url=registry.url, col="value", out_col="decoded")
    rows = {bytes(r["value"]): r for r in dec(df).collect()}
    bad = rows[b"\x06bad-magic"]
    assert bad["decoded"] is None and "version number 6" in bad["_error"]
    good = rows[good_wire]
    assert good["_error"] is None
    assert json.loads(good["decoded"])["Name"] == "foo"


def test_processor_interpolated_subject_spark(spark, registry):
    from benthos_spark.operators.confluent import SchemaRegistryEncode

    registry.register("topic-a", '{"type":"record","name":"A","fields":[{"name":"x","type":"int"}]}')
    registry.register("topic-b", '{"type":"record","name":"B","fields":[{"name":"x","type":"string"}]}')
    df = spark.createDataFrame(
        [("a", '{"x":1}'), ("b", '{"x":"s"}')], "topic string, value string"
    )
    enc = SchemaRegistryEncode(
        url=registry.url,
        subject="topic-${! topic }",
        col="value",
        out_col="framed",
    )
    rows = {r["topic"]: r for r in enc(df).collect()}
    assert rows["a"]["_error"] is None and rows["b"]["_error"] is None
    # each row encoded under its own subject's schema: int vs string field
    from benthos_spark.functions.schema_registry import RegistryClient

    client = RegistryClient(registry.url)
    id_a = client.schema_by_subject("topic-a")["id"]
    id_b = client.schema_by_subject("topic-b")["id"]
    assert sr.extract_id(bytes(rows["a"]["framed"]))[0] == id_a
    assert sr.extract_id(bytes(rows["b"]["framed"]))[0] == id_b


def test_config_wired(spark, registry):
    from benthos_spark.config import _proc

    registry.register("people", TEST_SCHEMA, "AVRO")
    p = _proc(
        {
            "schema_registry_encode": {
                "url": registry.url,
                "subject": "people",
                "refresh_period": "60s",
            }
        }
    )
    df = spark.createDataFrame(
        [('{"Name":"z","Address":null,"MaybeHobby":null}',)], "value string"
    )
    row = p(df).collect()[0]
    assert row["_error"] is None and bytes(row["value"])[0] == 0
    d = _proc({"schema_registry_decode": {"url": registry.url}})
    row2 = d(p(df)).collect()[0]
    assert json.loads(row2["value"])["Name"] == "z"
