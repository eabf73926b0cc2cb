"""Pure-python proto3 codec for the `protobuf` processor.

The reference converts protobuf messages ↔ JSON using .proto schemas
(internal/impl/protobuf/processor_protobuf.go: operator to_json /
from_json, message, import_paths). The sandbox has no protoc or
protobuf runtime, so this is a from-scratch implementation of the
PUBLIC proto3 language subset + wire format + canonical JSON mapping
(protobuf.dev/programming-guides/proto3 + /encoding):

- descriptor parser: `message` (nested), `enum`, scalar types,
  `repeated`, `map<k,v>`, `oneof` (fields flattened), package +
  relative imports via import_paths
- wire format: varint / zigzag (sint*) / fixed32 / fixed64 /
  length-delimited, packed repeated scalars on decode
- JSON mapping: lowerCamelCase names, proto3 default-value omission,
  enums as names, bytes as base64, google.protobuf.Timestamp as
  RFC3339 strings
"""

from __future__ import annotations

import base64
import io
import re
import struct
from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import DataFrame


class ProtoError(ValueError):
    pass


_SCALARS = {
    "double", "float", "int32", "int64", "uint32", "uint64", "sint32",
    "sint64", "fixed32", "fixed64", "sfixed32", "sfixed64", "bool",
    "string", "bytes",
}

_VARINT_TYPES = {"int32", "int64", "uint32", "uint64", "bool", "enum"}
_ZIGZAG_TYPES = {"sint32", "sint64"}
_FIXED64 = {"fixed64", "sfixed64", "double"}
_FIXED32 = {"fixed32", "sfixed32", "float"}


def _camel(name: str) -> str:
    parts = name.split("_")
    return parts[0] + "".join(p.title() for p in parts[1:])


@dataclass
class Field:
    name: str
    number: int
    type: str  # scalar name, "enum", or "message"
    type_name: Optional[str] = None  # message/enum fully-qualified name
    repeated: bool = False
    map_entry: Optional[tuple] = None  # (key_type, value Field)

    @property
    def json_name(self) -> str:
        return _camel(self.name)


@dataclass
class Message:
    name: str
    fields: dict = field(default_factory=dict)  # number -> Field

    def by_name(self) -> dict:
        out = {}
        for f in self.fields.values():
            out[f.name] = f
            out[f.json_name] = f
        return out


@dataclass
class FileSet:
    messages: dict = field(default_factory=dict)  # fqn -> Message
    enums: dict = field(default_factory=dict)  # fqn -> {name: num, num: name}


_TOKEN = re.compile(r'//[^\n]*|/\*.*?\*/|"(?:[^"\\]|\\.)*"|[A-Za-z0-9_.]+|[{}=;<>,\[\]]', re.S)


def _tokens(src: str) -> list[str]:
    return [t for t in _TOKEN.findall(src) if not t.startswith(("//", "/*"))]


def parse_proto(src: str, fs: Optional[FileSet] = None, import_loader=None) -> FileSet:
    """Parse a .proto file into (messages, enums). ``import_loader``
    resolves import paths → source text (google well-known Timestamp is
    built in)."""
    fs = fs or FileSet()
    toks = _tokens(src)
    i = 0
    package = ""

    def parse_enum(prefix: str, idx: int) -> int:
        name = toks[idx]
        idx += 1
        if toks[idx] != "{":
            raise ProtoError("expected { after enum name")
        idx += 1
        values: dict = {}
        while toks[idx] != "}":
            vname = toks[idx]
            if toks[idx + 1] != "=":
                raise ProtoError(f"bad enum entry {vname}")
            num = int(toks[idx + 2])
            values[vname] = num
            values[num] = vname
            idx += 3
            if toks[idx] == ";":
                idx += 1
        fs.enums[f"{prefix}{name}"] = values
        return idx + 1

    def parse_message(prefix: str, idx: int) -> int:
        name = toks[idx]
        fqn = f"{prefix}{name}"
        msg = Message(fqn)
        fs.messages[fqn] = msg
        idx += 1
        if toks[idx] != "{":
            raise ProtoError("expected { after message name")
        idx += 1
        while toks[idx] != "}":
            t = toks[idx]
            if t == ";":
                idx += 1
                continue
            if t == "message":
                idx = parse_message(fqn + ".", idx + 1)
                continue
            if t == "enum":
                idx = parse_enum(fqn + ".", idx + 1)
                continue
            if t == "oneof":
                # members are plain optional fields in the wire format
                idx += 2  # name {
                if toks[idx - 1] != "{":
                    raise ProtoError("expected { after oneof")
                while toks[idx] != "}":
                    idx = parse_field(msg, fqn, idx, repeated=False)
                idx += 1
                continue
            if t == "reserved" or t == "option":
                while toks[idx] != ";":
                    idx += 1
                idx += 1
                continue
            repeated = False
            if t == "repeated":
                repeated = True
                idx += 1
            elif t in ("optional", "required"):  # proto2 labels
                idx += 1
            idx = parse_field(msg, fqn, idx, repeated)
        return idx + 1

    def parse_field(msg: Message, scope: str, idx: int, repeated: bool) -> int:
        ftype = toks[idx]
        if ftype == "map":
            # map < key , value >
            if toks[idx + 1] != "<":
                raise ProtoError("expected < after map")
            key_t = toks[idx + 2]
            val_t = toks[idx + 4]
            idx += 6  # map < k , v >
            fname = toks[idx]
            num = int(toks[idx + 2])
            vf = _mk_field("value", 2, val_t, scope)
            msg.fields[num] = Field(fname, num, "map", repeated=True, map_entry=(key_t, vf))
            idx += 3
            while toks[idx] != ";":
                idx += 1
            return idx + 1
        fname = toks[idx + 1]
        if toks[idx + 2] != "=":
            raise ProtoError(f"bad field {fname!r}")
        num = int(toks[idx + 3])
        f = _mk_field(fname, num, ftype, scope)
        f.repeated = repeated
        msg.fields[num] = f
        idx += 4
        while toks[idx] != ";":
            idx += 1  # [options]
        return idx + 1

    def _mk_field(fname: str, num: int, ftype: str, scope: str) -> Field:
        if ftype in _SCALARS:
            return Field(fname, num, ftype)
        return Field(fname, num, "ref", type_name=_resolve_name(ftype, scope))

    def _resolve_name(ftype: str, scope: str):
        # relative resolution: innermost scope outward (proto3 name
        # resolution); candidates checked for existence at use time
        if "." in ftype:
            return [ftype, f"{package}.{ftype}" if package else ftype]
        parts = scope.split(".") if scope else []
        cands = [".".join(parts[:k] + [ftype]) for k in range(len(parts), 0, -1)]
        cands.append(f"{package}.{ftype}" if package else ftype)
        return cands

    while i < len(toks):
        t = toks[i]
        if t == "syntax":
            i += 3  # syntax = "proto3"
        elif t == "package":
            package = toks[i + 1]
            i += 2
        elif t == "import":
            path = toks[i + 1].strip('"')
            i += 2
            if path == "google/protobuf/timestamp.proto":
                ts = Message("google.protobuf.Timestamp")
                ts.fields[1] = Field("seconds", 1, "int64")
                ts.fields[2] = Field("nanos", 2, "int32")
                fs.messages["google.protobuf.Timestamp"] = ts
            elif import_loader is not None:
                parse_proto(import_loader(path), fs, import_loader)
            else:
                raise ProtoError(f"cannot resolve import {path!r} without import_loader")
        elif t == "message":
            i = parse_message(f"{package}." if package else "", i + 1)
        elif t == "enum":
            i = parse_enum(f"{package}." if package else "", i + 1)
        elif t == ";" or t == "option":
            while i < len(toks) and toks[i] != ";":
                i += 1
            i += 1
        else:
            i += 1
    return fs


def load_schema(import_paths: list[str], files: Optional[list[str]] = None) -> FileSet:
    """Parse every .proto under ``import_paths`` (or the given files)."""
    import os

    fs = FileSet()

    def loader(rel: str) -> str:
        for base in import_paths:
            p = os.path.join(base, rel)
            if os.path.exists(p):
                return open(p).read()
        raise ProtoError(f"import {rel!r} not found in {import_paths}")

    todo = files
    if todo is None:
        todo = []
        for base in import_paths:
            for root, _d, names in os.walk(base):
                todo += [os.path.join(root, n) for n in names if n.endswith(".proto")]
    for path in todo:
        parse_proto(open(path).read(), fs, loader)
    return fs


# -- wire format -------------------------------------------------------------


def _read_varint(buf: io.BytesIO) -> int:
    shift = acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise ProtoError("truncated varint")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            return acc
        shift += 7


def _write_varint(out: io.BytesIO, n: int) -> None:
    if n < 0:
        n &= (1 << 64) - 1  # two's complement, like int64 on the wire
    while True:
        b = n & 0x7F
        n >>= 7
        out.write(bytes([b | 0x80]) if n else bytes([b]))
        if not n:
            return


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _decode_scalar(ftype: str, wire: int, buf: io.BytesIO, fs: FileSet):
    if wire == 0:
        v = _read_varint(buf)
        if ftype in _ZIGZAG_TYPES:
            return _unzigzag(v)
        if ftype == "bool":
            return bool(v)
        if ftype in ("int32", "int64"):
            return v - (1 << 64) if v >= (1 << 63) else v
        return v
    if wire == 1:
        raw = buf.read(8)
        if ftype == "double":
            return struct.unpack("<d", raw)[0]
        v = struct.unpack("<Q", raw)[0]
        return struct.unpack("<q", raw)[0] if ftype == "sfixed64" else v
    if wire == 5:
        raw = buf.read(4)
        if ftype == "float":
            return struct.unpack("<f", raw)[0]
        v = struct.unpack("<I", raw)[0]
        return struct.unpack("<i", raw)[0] if ftype == "sfixed32" else v
    if wire == 2:
        data = buf.read(_read_varint(buf))
        if ftype == "string":
            return data.decode("utf-8")
        if ftype == "bytes":
            return data
        return data  # packed / sub-message handled by caller
    raise ProtoError(f"unsupported wire type {wire}")


def decode_message(data: bytes, msg_name: str, fs: FileSet) -> dict:
    msg = fs.messages.get(msg_name)
    if msg is None:
        raise ProtoError(f"unknown message {msg_name!r}")
    buf = io.BytesIO(data)
    out: dict = {}
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        key = _read_varint(buf)
        number, wire = key >> 3, key & 7
        f = msg.fields.get(number)
        if f is None:
            _decode_scalar("bytes" if wire == 2 else "uint64", wire, buf, fs)
            continue  # unknown field skipped
        if f.type == "map":
            if wire != 2:  # mismatched wire type: treat as unknown
                _decode_scalar("uint64", wire, buf, fs)
                continue
            entry = _decode_scalar("bytes", wire, buf, fs)
            ebuf = io.BytesIO(entry)
            k = v = None
            while True:
                h = ebuf.read(1)
                if not h:
                    break
                ebuf.seek(-1, 1)
                ek = _read_varint(ebuf)
                en, ew = ek >> 3, ek & 7
                if en == 1:
                    k = _decode_scalar(f.map_entry[0], ew, ebuf, fs)
                else:
                    v = _decode_value(f.map_entry[1], ew, ebuf, fs)
            out.setdefault(f.json_name, {})[str(k)] = v
            continue
        val = _decode_value(f, wire, buf, fs)
        if f.repeated:
            if isinstance(val, list):
                out.setdefault(f.json_name, []).extend(val)
            else:
                out.setdefault(f.json_name, []).append(val)
        else:
            out[f.json_name] = val
    return out


def _resolve_ref(f: Field, fs: FileSet) -> tuple[str, str]:
    """(kind, fqn) for a ref field: 'enum' or 'message'."""
    cands = f.type_name if isinstance(f.type_name, list) else [f.type_name]
    for c in cands:
        if c in fs.enums:
            return "enum", c
    for c in cands:
        if c in fs.messages:
            return "message", c
    raise ProtoError(f"unresolved type {cands!r}")


def _decode_value(f: Field, wire: int, buf: io.BytesIO, fs: FileSet):
    if f.type == "ref":
        kind, fqn = _resolve_ref(f, fs)
        if kind == "enum":
            if f.repeated and wire == 2:
                # proto3 packs repeated enums by default: length-delimited
                # blob of varints, same layout as packed scalars
                raw = _decode_scalar("bytes", wire, buf, fs)
                sub = io.BytesIO(raw)
                vals = []
                while sub.tell() < len(raw):
                    v = _read_varint(sub)
                    vals.append(fs.enums[fqn].get(v, v))
                return vals
            v = _read_varint(buf)
            return fs.enums[fqn].get(v, v)
        raw = _decode_scalar("bytes", wire, buf, fs)
        if fqn == "google.protobuf.Timestamp":
            sub = decode_message(raw, fqn, fs)
            return _ts_to_rfc3339(sub.get("seconds", 0), sub.get("nanos", 0))
        return decode_message(raw, fqn, fs)
    if f.repeated and wire == 2 and f.type not in ("string", "bytes"):
        # packed repeated scalars
        raw = _decode_scalar("bytes", wire, buf, fs)
        sub = io.BytesIO(raw)
        vals = []
        while sub.tell() < len(raw):
            w = 0 if f.type in _VARINT_TYPES | _ZIGZAG_TYPES else (1 if f.type in _FIXED64 else 5)
            vals.append(_decode_scalar(f.type, w, sub, fs))
        return vals
    return _decode_scalar(f.type, wire, buf, fs)


def _ts_to_rfc3339(seconds: int, nanos: int) -> str:
    import datetime as dt

    ts = dt.datetime.fromtimestamp(seconds, dt.timezone.utc)
    s = ts.strftime("%Y-%m-%dT%H:%M:%S")
    if nanos:
        frac = f"{nanos:09d}".rstrip("0")
        s += "." + frac
    return s + "Z"


def _rfc3339_to_ts(s: str) -> tuple[int, int]:
    import datetime as dt

    m = re.match(r"(.*?)(?:\.(\d+))?(Z|[+-]\d{2}:\d{2})$", s)
    base, frac, off = m.group(1), m.group(2) or "", m.group(3)
    ts = dt.datetime.fromisoformat(base + (off if off != "Z" else "+00:00"))
    nanos = int((frac + "0" * 9)[:9]) if frac else 0
    return int(ts.timestamp()), nanos


def encode_message(doc: dict, msg_name: str, fs: FileSet) -> bytes:
    msg = fs.messages.get(msg_name)
    if msg is None:
        raise ProtoError(f"unknown message {msg_name!r}")
    by_name = msg.by_name()
    out = io.BytesIO()
    for key, val in doc.items():
        f = by_name.get(key)
        if f is None:
            raise ProtoError(f"unknown field {key!r} for {msg_name}")
        if f.type == "map":
            for k, v in val.items():
                ebuf = io.BytesIO()
                kf = Field("key", 1, f.map_entry[0])
                _encode_field(ebuf, kf, _coerce_key(f.map_entry[0], k), fs)
                _encode_field(ebuf, f.map_entry[1], v, fs)
                _write_varint(out, (f.number << 3) | 2)
                payload = ebuf.getvalue()
                _write_varint(out, len(payload))
                out.write(payload)
            continue
        vals = val if f.repeated else [val]
        for v in vals:
            _encode_field(out, f, v, fs)
    return out.getvalue()


def _coerce_key(ktype: str, k: str):
    if ktype in ("string",):
        return k
    if ktype == "bool":
        return k in ("true", "True", True)
    return int(k)


def _encode_field(out: io.BytesIO, f: Field, v, fs: FileSet) -> None:
    if f.type == "ref":
        kind, fqn = _resolve_ref(f, fs)
        if kind == "enum":
            ev = fs.enums[fqn].get(v, v) if isinstance(v, str) else v
            _write_varint(out, (f.number << 3) | 0)
            _write_varint(out, int(ev))
            return
        if fqn == "google.protobuf.Timestamp" and isinstance(v, str):
            secs, nanos = _rfc3339_to_ts(v)
            v = {"seconds": secs, "nanos": nanos}
        payload = encode_message(v, fqn, fs)
        _write_varint(out, (f.number << 3) | 2)
        _write_varint(out, len(payload))
        out.write(payload)
        return
    t = f.type
    if t in _VARINT_TYPES or t in _ZIGZAG_TYPES:
        _write_varint(out, (f.number << 3) | 0)
        n = int(v) if not isinstance(v, bool) else int(v)
        _write_varint(out, _zigzag(n) if t in _ZIGZAG_TYPES else n)
    elif t in _FIXED64:
        _write_varint(out, (f.number << 3) | 1)
        out.write(struct.pack("<d" if t == "double" else ("<q" if t == "sfixed64" else "<Q"), v))
    elif t in _FIXED32:
        _write_varint(out, (f.number << 3) | 5)
        out.write(struct.pack("<f" if t == "float" else ("<i" if t == "sfixed32" else "<I"), v))
    elif t == "string":
        data = v.encode("utf-8")
        _write_varint(out, (f.number << 3) | 2)
        _write_varint(out, len(data))
        out.write(data)
    elif t == "bytes":
        data = base64.b64decode(v) if isinstance(v, str) else bytes(v)
        _write_varint(out, (f.number << 3) | 2)
        _write_varint(out, len(data))
        out.write(data)
    else:
        raise ProtoError(f"unsupported field type {t!r}")


def message_to_json_dict(data: bytes, msg_name: str, fs: FileSet) -> dict:
    """decode + canonical JSON presentation (bytes→base64)."""
    def conv(v):
        if isinstance(v, bytes):
            return base64.b64encode(v).decode()
        if isinstance(v, dict):
            return {k: conv(x) for k, x in v.items()}
        if isinstance(v, list):
            return [conv(x) for x in v]
        return v

    return conv(decode_message(data, msg_name, fs))


# -- processor ---------------------------------------------------------------


@dataclass
class ProtobufProcessor:
    """`protobuf` processor (processor_protobuf.go): operator
    to_json / from_json with a message name + import_paths, over a
    binary/string ``value`` column, Arrow-batched."""

    operator: str
    message: str
    import_paths: list
    col: str = "value"

    def __call__(self, df: DataFrame) -> DataFrame:
        import json as _json

        import pandas as pd

        op, msg, paths, col = self.operator, self.message, list(self.import_paths), self.col
        out_type = "string" if op == "to_json" else "binary"
        schema = ", ".join(
            f"{n} {out_type}" if n == col else f"{n} {df.schema[n].dataType.simpleString()}"
            for n in df.columns
        )

        def run(batches):
            fs = load_schema(paths)
            for pdf in batches:
                vals = []
                for v in pdf[col].tolist():
                    if op == "to_json":
                        vals.append(_json.dumps(message_to_json_dict(bytes(v), msg, fs),
                                                separators=(",", ":")))
                    elif op == "from_json":
                        doc = _json.loads(v)
                        vals.append(encode_message(doc, msg, fs))
                    else:
                        raise ProtoError(f"operator not recognised: {op}")
                pdf = pdf.copy()
                pdf[col] = vals
                yield pdf

        return df.mapInPandas(run, schema=schema)
