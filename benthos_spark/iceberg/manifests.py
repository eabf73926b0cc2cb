"""Iceberg v2 manifest list + manifest file Avro schemas and codecs.

Field names, field-ids, and optionality follow the public spec tables
("Manifests" and "Manifest Lists", https://iceberg.apache.org/spec/).
The files are standard Avro OCF written by our from-scratch codec
(:mod:`benthos_spark.functions.avro_ocf`); tests parse them back with
the REAL Java Avro reader on Spark's classpath to prove
interoperability.

Iceberg attaches its field-ids to Avro via the ``field-id`` schema
attribute — a standard Avro "extra attribute" every conforming reader
ignores.  Maps keyed by int (column stats) are spec-serialized as
arrays of key/value records with ``logicalType: map``; we only emit the
stats we actually track (record counts, value counts, bounds for the
partition summary), leaving the rest null as the spec allows.
"""

from __future__ import annotations

import struct
from typing import Any

from benthos_spark.functions.avro_ocf import read_ocf, write_ocf


def _f(name: str, typ: Any, fid: int, *, optional: bool = False, doc: str | None = None) -> dict:
    f: dict[str, Any] = {"name": name, "type": ["null", typ] if optional else typ, "field-id": fid}
    if optional:
        f["default"] = None
    return f


# -- manifest list: one manifest_file record per manifest ------------------

_FIELD_SUMMARY = {
    "type": "record",
    "name": "r508",
    "fields": [
        _f("contains_null", "boolean", 509),
        _f("contains_nan", "boolean", 518, optional=True),
        _f("lower_bound", "bytes", 510, optional=True),
        _f("upper_bound", "bytes", 511, optional=True),
    ],
}

MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        _f("manifest_path", "string", 500),
        _f("manifest_length", "long", 501),
        _f("partition_spec_id", "int", 502),
        _f("content", "int", 517),  # 0: data, 1: deletes
        _f("sequence_number", "long", 515),
        _f("min_sequence_number", "long", 516),
        _f("added_snapshot_id", "long", 503),
        _f("added_files_count", "int", 504),
        _f("existing_files_count", "int", 505),
        _f("deleted_files_count", "int", 506),
        _f("added_rows_count", "long", 512),
        _f("existing_rows_count", "long", 513),
        _f("deleted_rows_count", "long", 514),
        _f(
            "partitions",
            {"type": "array", "items": _FIELD_SUMMARY, "element-id": 508},
            507,
            optional=True,
        ),
        _f("key_metadata", "bytes", 519, optional=True),
    ],
}


# -- manifest: one manifest_entry per data file ----------------------------

# entry status values (spec: "Manifest Entries")
STATUS_EXISTING = 0
STATUS_ADDED = 1
STATUS_DELETED = 2

# data_file content values
CONTENT_DATA = 0
CONTENT_POSITION_DELETES = 1
CONTENT_EQUALITY_DELETES = 2


def _int_keyed_map(name: str, value_type: Any, fid: int, kid: int, vid: int) -> dict:
    return {
        "name": name,
        "field-id": fid,
        "default": None,
        "type": [
            "null",
            {
                "type": "array",
                "logicalType": "map",
                "items": {
                    "type": "record",
                    "name": f"k{kid}_v{vid}",
                    "fields": [
                        _f("key", "int", kid),
                        _f("value", value_type, vid),
                    ],
                },
            },
        ],
    }


def data_file_schema(partition_fields: list[dict]) -> dict:
    """``partition_fields`` are Avro record fields for the partition
    tuple (one per partition spec field, carrying that field's id)."""
    return {
        "type": "record",
        "name": "r2",
        "fields": [
            _f("content", "int", 134),
            _f("file_path", "string", 100),
            _f("file_format", "string", 101),
            {
                "name": "partition",
                "field-id": 102,
                "type": {"type": "record", "name": "r102", "fields": partition_fields},
            },
            _f("record_count", "long", 103),
            _f("file_size_in_bytes", "long", 104),
            _int_keyed_map("column_sizes", "long", 108, 117, 118),
            _int_keyed_map("value_counts", "long", 109, 119, 120),
            _int_keyed_map("null_value_counts", "long", 110, 121, 122),
            _int_keyed_map("nan_value_counts", "long", 137, 138, 139),
            _int_keyed_map("lower_bounds", "bytes", 125, 126, 127),
            _int_keyed_map("upper_bounds", "bytes", 128, 129, 130),
            _f("key_metadata", "bytes", 131, optional=True),
            _f(
                "split_offsets",
                {"type": "array", "items": "long", "element-id": 133},
                132,
                optional=True,
            ),
            _f(
                "equality_ids",
                {"type": "array", "items": "int", "element-id": 136},
                135,
                optional=True,
            ),
            _f("sort_order_id", "int", 140, optional=True),
        ],
    }


def manifest_entry_schema(partition_fields: list[dict]) -> dict:
    return {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            _f("status", "int", 0),
            _f("snapshot_id", "long", 1, optional=True),
            _f("sequence_number", "long", 3, optional=True),
            _f("file_sequence_number", "long", 4, optional=True),
            {
                "name": "data_file",
                "field-id": 2,
                "type": data_file_schema(partition_fields),
            },
        ],
    }


# -- single-value binary serialization (spec "Binary single-value") --------


def encode_bound(value: Any, iceberg_type: str) -> bytes:
    """Lower/upper bound encoding for stats: little-endian fixed widths
    for numerics, UTF-8 for strings (spec: Appendix D)."""
    if iceberg_type == "int" or iceberg_type == "date":
        return struct.pack("<i", int(value))
    if iceberg_type in ("long", "timestamp", "timestamptz"):
        return struct.pack("<q", int(value))
    if iceberg_type == "float":
        return struct.pack("<f", float(value))
    if iceberg_type == "double":
        return struct.pack("<d", float(value))
    if iceberg_type == "string":
        return str(value).encode("utf-8")
    if iceberg_type == "boolean":
        return b"\x01" if value else b"\x00"
    if iceberg_type == "binary":
        return bytes(value)
    raise ValueError(f"no bound encoding for {iceberg_type}")


def decode_bound(data: bytes, iceberg_type: str) -> Any:
    if iceberg_type == "int" or iceberg_type == "date":
        return struct.unpack("<i", data)[0]
    if iceberg_type in ("long", "timestamp", "timestamptz"):
        return struct.unpack("<q", data)[0]
    if iceberg_type == "float":
        return struct.unpack("<f", data)[0]
    if iceberg_type == "double":
        return struct.unpack("<d", data)[0]
    if iceberg_type == "string":
        return data.decode("utf-8")
    if iceberg_type == "boolean":
        return data == b"\x01"
    if iceberg_type == "binary":
        return data
    raise ValueError(f"no bound decoding for {iceberg_type}")


# -- read/write helpers ----------------------------------------------------


def write_manifest(
    path: str,
    entries: list[dict],
    partition_fields: list[dict],
    *,
    schema_json: dict,
    partition_spec_json: list[dict],
    partition_spec_id: int,
) -> int:
    """Writes a manifest Avro file; returns its length in bytes. The
    OCF metadata keys mirror what the spec requires a manifest to
    carry (schema, partition-spec, format-version, content)."""
    import json as _json

    blob = write_ocf(
        manifest_entry_schema(partition_fields),
        entries,
        meta={
            "schema": _json.dumps(schema_json),
            "partition-spec": _json.dumps(partition_spec_json),
            "partition-spec-id": str(partition_spec_id),
            "format-version": "2",
            "content": "data",
        },
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    import os

    os.rename(tmp, path)
    return len(blob)


def read_manifest(path: str) -> list[dict]:
    with open(path, "rb") as f:
        _schema, records = read_ocf(f.read())
    return records


def write_manifest_list(
    path: str,
    manifest_files: list[dict],
    *,
    snapshot_id: int,
    parent_snapshot_id: int | None,
    sequence_number: int,
) -> None:
    blob = write_ocf(
        MANIFEST_FILE_SCHEMA,
        manifest_files,
        meta={
            "snapshot-id": str(snapshot_id),
            "parent-snapshot-id": str(parent_snapshot_id) if parent_snapshot_id else "null",
            "sequence-number": str(sequence_number),
            "format-version": "2",
        },
    )
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    import os

    os.rename(tmp, path)


def read_manifest_list(path: str) -> list[dict]:
    with open(path, "rb") as f:
        _schema, records = read_ocf(f.read())
    return records
