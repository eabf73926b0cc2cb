"""Pure-python Avro OCF codec (reader.go avro-ocf scanner) — roundtrip
+ file-input integration, including interop with the JVM avro jar is
out of scope (no spark-avro DataSource offline)."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings, strategies as st

from benthos_spark.functions.avro_ocf import AvroError, read_ocf, write_ocf

SCHEMA = {
    "type": "record",
    "name": "Event",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {"name": "maybe", "type": ["null", "string"]},
        {"name": "kind", "type": {"type": "enum", "name": "Kind", "symbols": ["A", "B"]}},
    ],
}

RECORDS = [
    {"id": 1, "name": "alpha", "score": 1.5, "tags": ["x", "y"], "props": {"a": 1}, "maybe": None, "kind": "A"},
    {"id": -7, "name": "βeta", "score": -2.25, "tags": [], "props": {}, "maybe": "yes", "kind": "B"},
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_ocf_roundtrip(codec):
    blob = write_ocf(SCHEMA, RECORDS, codec=codec)
    schema, records = read_ocf(blob)
    assert schema == SCHEMA
    assert records == RECORDS


def test_bad_magic():
    with pytest.raises(AvroError, match="magic"):
        read_ocf(b"nope" + b"\x00" * 20)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.fixed_dictionaries(
            {
                "id": st.integers(min_value=-(2**62), max_value=2**62),
                "name": st.text(max_size=20),
                "score": st.floats(allow_nan=False, allow_infinity=False, width=32),
                "tags": st.lists(st.text(max_size=5), max_size=4),
                "props": st.dictionaries(st.text(min_size=1, max_size=5), st.integers(-1000, 1000), max_size=3),
                "maybe": st.one_of(st.none(), st.text(max_size=5)),
                "kind": st.sampled_from(["A", "B"]),
            }
        ),
        max_size=10,
    )
)
def test_ocf_roundtrip_hypothesis(records):
    schema, got = read_ocf(write_ocf(SCHEMA, records))
    assert got == records


def test_file_source_avro_ocf_codec(spark, tmp_path):
    blob = write_ocf(SCHEMA, RECORDS, codec="deflate")
    p = tmp_path / "events.avro"
    p.write_bytes(blob)
    from benthos_spark.sources.readers import FileSource

    rows = FileSource(str(p), codec="avro-ocf").read(spark).collect()
    docs = sorted((json.loads(r["line"]) for r in rows), key=lambda d: d["id"])
    assert docs[0]["name"] == "βeta" and docs[1]["tags"] == ["x", "y"]


def test_file_source_gzip_avro_chain(spark, tmp_path):
    import gzip as _gz

    blob = write_ocf(SCHEMA, RECORDS)
    p = tmp_path / "events.avro.gz"
    p.write_bytes(_gz.compress(blob))
    from benthos_spark.sources.readers import FileSource

    rows = FileSource(str(p), codec="gzip/avro-ocf").read(spark).collect()
    assert len(rows) == 2
