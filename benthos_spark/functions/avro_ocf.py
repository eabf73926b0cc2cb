"""Pure-python Avro Object Container File codec.

The reference's file input supports an ``avro-ocf`` codec
(internal/codec/reader.go: avro-ocf scanner) decoding one message per
record. The sandbox has neither spark-avro (DataSource jar) nor a
Python avro package, so this is a from-scratch implementation of the
PUBLIC Avro 1.11 spec (container file + binary encoding):

- header: magic ``Obj\\x01``, metadata map (avro.schema JSON,
  avro.codec), 16-byte sync marker
- blocks: record count (zigzag long), byte size, payload (null or
  deflate codec), sync marker
- binary encoding: zigzag varint longs, little-endian float/double,
  length-prefixed bytes/string, records/arrays/maps/unions/enums/fixed

Supports the full primitive set + record/array/map/union/enum/fixed —
enough to read (and, for tests, write) real OCF files.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any

MAGIC = b"Obj\x01"


class AvroError(ValueError):
    pass


# -- binary primitives -------------------------------------------------------


def _read_long(buf: io.BytesIO) -> int:
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise AvroError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # zigzag


def _write_long(out: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise AvroError("truncated bytes")
    return data


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


# -- schema-driven decode/encode ---------------------------------------------


def _decode(schema: Any, buf: io.BytesIO) -> Any:
    if isinstance(schema, list):  # union
        idx = _read_long(buf)
        return _decode(schema[idx], buf)
    if isinstance(schema, str):
        t = schema
    else:
        t = schema["type"]
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "record":
        return {f["name"]: _decode(f["type"], buf) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t == "fixed":
        return buf.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)  # block byte size, unused
                n = -n
            for _ in range(n):
                out.append(_decode(schema["items"], buf))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf)
        return out
    raise AvroError(f"unsupported avro type {t!r}")


def _encode(schema: Any, value: Any, out: io.BytesIO) -> None:
    if isinstance(schema, list):  # union: pick first matching branch
        for i, branch in enumerate(schema):
            if _matches(branch, value):
                _write_long(out, i)
                _encode(branch, value, out)
                return
        raise AvroError(f"no union branch for {value!r}")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_long(out, int(value))
    elif t == "float":
        out.write(struct.pack("<f", value))
    elif t == "double":
        out.write(struct.pack("<d", value))
    elif t == "bytes":
        _write_bytes(out, bytes(value))
    elif t == "string":
        _write_bytes(out, value.encode("utf-8"))
    elif t == "record":
        for f in schema["fields"]:
            _encode(f["type"], value.get(f["name"]), out)
    elif t == "enum":
        _write_long(out, schema["symbols"].index(value))
    elif t == "fixed":
        out.write(bytes(value))
    elif t == "array":
        if value:
            _write_long(out, len(value))
            for item in value:
                _encode(schema["items"], item, out)
        _write_long(out, 0)
    elif t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _write_bytes(out, k.encode("utf-8"))
                _encode(schema["values"], v, out)
        _write_long(out, 0)
    else:
        raise AvroError(f"unsupported avro type {t!r}")


def _matches(schema: Any, value: Any) -> bool:
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return value is None
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if t in ("string", "enum"):
        return isinstance(value, str)
    if t == "record" or t == "map":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, list)
    return False


# -- container file ----------------------------------------------------------


def read_ocf(data: bytes) -> tuple[Any, list[Any]]:
    """OCF bytes → (schema, records). Codecs: null, deflate."""
    schema, records, _meta = read_ocf_with_meta(data)
    return schema, records


def read_ocf_with_meta(data: bytes) -> tuple[Any, list[Any], dict[str, bytes]]:
    """OCF bytes → (schema, records, header metadata). Iceberg manifests
    carry their table schema / partition spec in the OCF header."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise AvroError("not an avro OCF (bad magic)")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = _decode(meta_schema, buf)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(16)
    records: list[Any] = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        n = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompressobj(-15).decompress(block)
        elif codec != "null":
            raise AvroError(f"unsupported avro codec {codec!r}")
        bbuf = io.BytesIO(block)
        for _ in range(n):
            records.append(_decode(schema, bbuf))
        if buf.read(16) != sync:
            raise AvroError("sync marker mismatch")
    return schema, records, meta


def write_ocf(
    schema: Any,
    records: list[Any],
    codec: str = "null",
    meta: dict[str, str] | None = None,
) -> bytes:
    """(schema, records) → OCF bytes (test/fixture encoder). ``meta``
    adds extra header metadata entries (Iceberg manifests require
    schema/partition-spec/format-version keys in the header)."""
    out = io.BytesIO()
    out.write(MAGIC)
    hdr = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    for k, v in (meta or {}).items():
        hdr[k] = v.encode()
    _encode({"type": "map", "values": "bytes"}, hdr, out)
    sync = b"\x00\x01\x02\x03\x04\x05\x06\x07\x08\x09\x0a\x0b\x0c\x0d\x0e\x0f"
    out.write(sync)
    body = io.BytesIO()
    for r in records:
        _encode(schema, r, body)
    block = body.getvalue()
    if codec == "deflate":
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        block = co.compress(block) + co.flush()
    elif codec != "null":
        raise AvroError(f"unsupported avro codec {codec!r}")
    _write_long(out, len(records))
    _write_long(out, len(block))
    out.write(block)
    out.write(sync)
    return out.getvalue()
