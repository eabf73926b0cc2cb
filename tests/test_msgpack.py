"""MessagePack codec (parse_msgpack/format_msgpack parity): spec-correct
roundtrips via hypothesis plus the Spark pandas-UDF surface."""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from benthos_spark.functions.msgpack import (
    format_msgpack_from_json,
    packb,
    parse_msgpack_to_json,
    unpackb,
)

scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**64 - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=80),
    st.binary(max_size=80),
)
values = st.recursive(
    scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=8), st.dictionaries(st.text(max_size=10), children, max_size=8)
    ),
    max_leaves=25,
)


@given(values)
@settings(max_examples=300, deadline=None)
def test_roundtrip(v):
    assert unpackb(packb(v)) == v


def test_known_encodings():
    # spot-checks against the msgpack spec
    assert packb(None) == b"\xc0"
    assert packb(True) == b"\xc3"
    assert packb(127) == b"\x7f"
    assert packb(-1) == b"\xff"
    assert packb(255) == b"\xcc\xff"
    assert packb("hi") == b"\xa2hi"
    assert packb([1, 2]) == b"\x92\x01\x02"
    assert packb({"a": 1}) == b"\x81\xa1a\x01"
    assert packb(1.5) == b"\xcb?\xf8\x00\x00\x00\x00\x00\x00"


def test_boundary_widths():
    for n in (31, 32, 255, 256, 65535, 65536):
        s = "x" * n
        assert unpackb(packb(s)) == s
    for v in (0xFF, 0x100, 0xFFFF, 0x10000, 0xFFFFFFFF, 0x100000000, -0x80, -0x81, -0x8000, -0x8001):
        assert unpackb(packb(v)) == v


def test_spark_surface_roundtrip(spark):
    df = spark.createDataFrame(
        [('{"k":1,"tags":["a","b"],"ok":true}',), ('{"n":null}',)], "j string"
    )
    packed = df.select(format_msgpack_from_json("j").alias("mp"))
    back = packed.select(parse_msgpack_to_json("mp").alias("j2")).collect()
    assert json.loads(back[0]["j2"]) == {"k": 1, "tags": ["a", "b"], "ok": True}
    assert json.loads(back[1]["j2"]) == {"n": None}
