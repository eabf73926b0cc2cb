"""Pure-python proto3 codec + protobuf processor
(processor_protobuf.go operators to_json/from_json)."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings, strategies as st

from benthos_spark.functions.protobuf import (
    FileSet,
    ProtobufProcessor,
    ProtoError,
    decode_message,
    encode_message,
    load_schema,
    message_to_json_dict,
    parse_proto,
)

# the reference's own doc example schema (processor_protobuf.go:60-75)
PERSON_PROTO = """
syntax = "proto3";
package testing;

import "google/protobuf/timestamp.proto";

message Person {
  string first_name = 1;
  string last_name = 2;
  string full_name = 3;
  int32 age = 4;
  int32 id = 5; // Unique ID number for this person.
  string email = 6;

  google.protobuf.Timestamp last_updated = 7;
}
"""

RICH_PROTO = """
syntax = "proto3";
package rich;

enum Color {
  COLOR_UNSPECIFIED = 0;
  RED = 1;
  BLUE = 2;
}

message Inner {
  sint64 delta = 1;
  double ratio = 2;
}

message Outer {
  repeated int32 nums = 1;
  Inner inner = 2;
  Color color = 3;
  map<string, int64> counts = 4;
  bytes blob = 5;
  bool flag = 6;
  repeated Inner inners = 7;
}
"""


@pytest.fixture(scope="module")
def person_fs():
    return parse_proto(PERSON_PROTO)


@pytest.fixture(scope="module")
def rich_fs():
    return parse_proto(RICH_PROTO)


def test_known_wire_bytes(person_fs):
    # field 1 (string "caleb"): tag 0x0A, len 5 — protobuf.dev/encoding
    data = encode_message({"firstName": "caleb"}, "testing.Person", person_fs)
    assert data == b"\x0a\x05caleb"
    # field 4 (int32 150): tag 0x20, varint 0x96 0x01
    data = encode_message({"age": 150}, "testing.Person", person_fs)
    assert data == b"\x20\x96\x01"


def test_person_roundtrip_with_timestamp(person_fs):
    doc = {
        "firstName": "caleb",
        "lastName": "quaye",
        "email": "caleb@myspace.com",
        "age": 33,
        "lastUpdated": "2020-08-14T11:50:26.371Z",
    }
    wire = encode_message(doc, "testing.Person", person_fs)
    back = message_to_json_dict(wire, "testing.Person", person_fs)
    assert back == doc


def test_rich_roundtrip(rich_fs):
    doc = {
        "nums": [1, -2, 300],
        "inner": {"delta": -42, "ratio": 2.5},
        "color": "BLUE",
        "counts": {"a": 1, "b": -7},
        "blob": "aGVsbG8=",  # base64("hello")
        "flag": True,
        "inners": [{"delta": 1, "ratio": 0.5}, {"delta": -1, "ratio": 1.5}],
    }
    wire = encode_message(doc, "rich.Outer", rich_fs)
    back = message_to_json_dict(wire, "rich.Outer", rich_fs)
    assert back == doc


def test_unknown_fields_skipped(rich_fs, person_fs):
    # bytes encoded as Person decode as Outer: unknown tags are skipped
    wire = encode_message({"firstName": "x", "age": 3}, "testing.Person", person_fs)
    out = decode_message(wire, "rich.Outer", rich_fs)
    assert "firstName" not in out


def test_negative_int_encoding(rich_fs):
    # int32 -1 is 10-byte two's-complement varint; sint64 uses zigzag
    wire = encode_message({"nums": [-1]}, "rich.Outer", rich_fs)
    back = decode_message(wire, "rich.Outer", rich_fs)
    assert back["nums"] == [-1]
    wire = encode_message({"inner": {"delta": -1}}, "rich.Outer", rich_fs)
    assert b"\x01" in wire  # zigzag(-1) == 1
    assert decode_message(wire, "rich.Outer", rich_fs)["inner"]["delta"] == -1


@settings(max_examples=60, deadline=None)
@given(
    st.fixed_dictionaries(
        {
            "nums": st.lists(st.integers(-(2**31), 2**31 - 1), max_size=5),
            "flag": st.booleans(),
            "counts": st.dictionaries(st.text(min_size=1, max_size=5), st.integers(-(2**62), 2**62), max_size=3),
            "inner": st.fixed_dictionaries(
                {"delta": st.integers(-(2**62), 2**62),
                 "ratio": st.floats(allow_nan=False, allow_infinity=False)}
            ),
        }
    )
)
def test_roundtrip_hypothesis(doc):
    fs = parse_proto(RICH_PROTO)
    wire = encode_message(doc, "rich.Outer", fs)
    back = decode_message(wire, "rich.Outer", fs)
    want = {k: v for k, v in doc.items() if v not in ([], {},)}
    got = {k: v for k, v in back.items() if k in want}
    assert got == want


def test_import_paths(tmp_path):
    schema_dir = tmp_path / "schema"
    schema_dir.mkdir()
    (schema_dir / "common.proto").write_text(
        'syntax = "proto3";\npackage common;\nmessage Tag { string k = 1; string v = 2; }\n'
    )
    (schema_dir / "main.proto").write_text(
        'syntax = "proto3";\npackage app;\nimport "common.proto";\n'
        "message Doc { string id = 1; common.Tag tag = 2; }\n"
    )
    fs = load_schema([str(schema_dir)])
    doc = {"id": "d1", "tag": {"k": "env", "v": "prod"}}
    wire = encode_message(doc, "app.Doc", fs)
    assert message_to_json_dict(wire, "app.Doc", fs) == doc


def test_processor_to_json_from_json(spark, tmp_path):
    schema_dir = tmp_path / "schema"
    schema_dir.mkdir()
    (schema_dir / "person.proto").write_text(PERSON_PROTO)
    fs = parse_proto(PERSON_PROTO)
    docs = [
        {"firstName": "ann", "age": 3},
        {"firstName": "bob", "email": "b@x.io"},
    ]
    wires = [encode_message(d, "testing.Person", fs) for d in docs]
    df = spark.createDataFrame([(w,) for w in wires], "value binary")
    out = ProtobufProcessor("to_json", "testing.Person", [str(schema_dir)])(df)
    got = sorted(json.loads(r["value"])["firstName"] for r in out.collect())
    assert got == ["ann", "bob"]
    # and back: from_json reproduces the wire bytes
    jdf = spark.createDataFrame([(json.dumps(d),) for d in docs], "value string")
    back = ProtobufProcessor("from_json", "testing.Person", [str(schema_dir)])(jdf)
    assert sorted(bytes(r["value"]) for r in back.collect()) == sorted(wires)


PALETTE_PROTO = """
syntax = "proto3";
package pal;

enum Color {
  COLOR_UNSPECIFIED = 0;
  RED = 1;
  BLUE = 2;
}

message Palette {
  repeated Color colors = 1;
}
"""


def test_packed_repeated_enum_decode():
    """proto3 packs repeated enums by default (wire 2, varint blob) —
    decode must unpack them, not read the length as the first value."""
    fs = parse_proto(PALETTE_PROTO)
    # field 1 / wire 2, len=4, varints [1, 2, 0, 300]
    wire = bytes([0x0A, 0x05, 0x01, 0x02, 0x00, 0xAC, 0x02])
    doc = decode_message(wire, "pal.Palette", fs)
    assert doc == {"colors": ["RED", "BLUE", "COLOR_UNSPECIFIED", 300]}


def test_unpacked_repeated_enum_roundtrip():
    fs = parse_proto(PALETTE_PROTO)
    wire = encode_message({"colors": ["RED", "BLUE"]}, "pal.Palette", fs)
    assert decode_message(wire, "pal.Palette", fs) == {"colors": ["RED", "BLUE"]}
