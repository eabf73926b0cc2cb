"""Confluent-compatible schema registry: wire format, serdes, server, client.

Mirrors internal/impl/confluent/ in the reference:

- wire format (processor_schema_registry_decode.go:183-195 `extractID`,
  processor_schema_registry_encode.go:242-249 `insertID`): one magic
  ``0x00`` byte, a big-endian uint32 schema id, then the payload. For
  PROTOBUF payloads a zigzag-varint message-index list follows the id
  (serde_protobuf.go:254-311, adapted there from confluent-kafka-go).
- AVRO serde (serde_avro.go): binary ↔ textual JSON in either "Avro
  JSON" (unions wrapped as {"branchName": value}) or standard/raw JSON,
  matching goavro's NewCodec vs NewCodecForStandardJSONFull split that
  the `avro_raw_json` field toggles. Schema references hydrate a root
  array-of-names into a union of the referenced schemas
  (serde_avro.go:13-46).
- JSON serde (serde_json.go): validate only — the message body is
  already JSON; the payload crosses the wire unchanged.
- registry REST API subset (client.go): GET /schemas/ids/{id},
  GET /subjects/{subject}/versions/{v|latest}, POST
  /subjects/{subject}/versions. `RegistryServer` here is a from-scratch
  in-process implementation of that API for tests and local pipelines;
  `RegistryClient` is the urllib consumer used by the processors and
  works against any Confluent-API-compatible service.

The binary Avro codec and the proto3 codec are this repo's own
(functions/avro_ocf.py, functions/protobuf.py) — no jars, no pip codecs.
"""

from __future__ import annotations

import io
import json
import struct
import threading
import urllib.error
import urllib.parse
import urllib.request
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Optional

from benthos_spark.functions.avro_ocf import AvroError, _decode, _encode, _matches
from benthos_spark.functions import jsonschema
from benthos_spark.functions import protobuf as pb

MAGIC = 0


class SchemaRegistryError(ValueError):
    pass


# -- wire format --------------------------------------------------------------


def insert_id(schema_id: int, payload: bytes) -> bytes:
    """processor_schema_registry_encode.go:242 — 0x00 + uint32_be id."""
    return bytes([MAGIC]) + struct.pack(">I", schema_id) + payload


def extract_id(b: bytes) -> tuple[int, bytes]:
    """processor_schema_registry_decode.go:183 — header off, id + rest."""
    if len(b) == 0:
        raise SchemaRegistryError("message is empty")
    if b[0] != MAGIC:
        raise SchemaRegistryError(
            f"serialization format version number {b[0]} not supported"
        )
    if len(b) < 5:
        raise SchemaRegistryError("message truncated inside schema id header")
    return struct.unpack(">I", b[1:5])[0], b[5:]


def _put_zigzag(out: io.BytesIO, n: int) -> None:
    u = (n << 1) ^ (n >> 63)
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _get_zigzag(b: bytes, pos: int) -> tuple[int, int]:
    shift = u = 0
    while True:
        if pos >= len(b):
            raise SchemaRegistryError("unable to read message indexes")
        byte = b[pos]
        pos += 1
        u |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1), pos


def message_indexes_to_bytes(indexes: list[int]) -> bytes:
    """serde_protobuf.go:275 `toMessageIndexBytes` — [0] optimizes to a
    single zero byte; otherwise zigzag(count) then each zigzag index."""
    if indexes == [0]:
        return b"\x00"
    out = io.BytesIO()
    _put_zigzag(out, len(indexes))
    for i in indexes:
        _put_zigzag(out, i)
    return out.getvalue()


def read_message_indexes(payload: bytes) -> tuple[int, list[int]]:
    """serde_protobuf.go:254 — returns (bytes_consumed, index path)."""
    n, pos = _get_zigzag(payload, 0)
    if n == 0:
        return pos, [0]
    idx = []
    for _ in range(n):
        v, pos = _get_zigzag(payload, pos)
        idx.append(v)
    return pos, idx


# -- Avro: named-type resolution + textual JSON codec -------------------------

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


def resolve_avro_names(schema: Any) -> Any:
    """Inline named-type references ("type": "Foo") so the positional
    binary codec in avro_ocf.py can walk the tree. Recursive schemas are
    rejected (the registry serde never needs them)."""
    names: dict[str, Any] = {}

    def collect(s: Any, namespace: str):
        if isinstance(s, list):
            for b in s:
                collect(b, namespace)
            return
        if not isinstance(s, dict):
            return
        t = s.get("type")
        ns = s.get("namespace", namespace)
        if t in ("record", "enum", "fixed") and "name" in s:
            full = f"{ns}.{s['name']}" if ns else s["name"]
            names[full] = s
            names[s["name"]] = s
        if t == "record":
            for f in s.get("fields", []):
                collect(f["type"], ns)
        elif t == "array":
            collect(s.get("items"), ns)
        elif t == "map":
            collect(s.get("values"), ns)
        elif isinstance(t, (dict, list)):
            collect(t, ns)

    collect(schema, "")

    def inline(s: Any, seen: frozenset) -> Any:
        if isinstance(s, list):
            return [inline(b, seen) for b in s]
        if isinstance(s, str):
            if s in _PRIMITIVES:
                return s
            if s in names:
                full = full_name(names[s])
                if full in seen:
                    raise SchemaRegistryError(
                        f"recursive avro schema {s!r} not supported"
                    )
                return inline(names[s], seen | {full})
            raise SchemaRegistryError(f"unknown avro type reference {s!r}")
        if isinstance(s, dict):
            t = s.get("type")
            out = dict(s)
            if t == "record":
                if full_name(s) in seen - {full_name(s)}:
                    raise SchemaRegistryError("recursive avro schema")
                out["fields"] = [
                    {**f, "type": inline(f["type"], seen | {full_name(s)})}
                    for f in s.get("fields", [])
                ]
            elif t == "array":
                out["items"] = inline(s["items"], seen)
            elif t == "map":
                out["values"] = inline(s["values"], seen)
            elif isinstance(t, (list, dict, str)) and t not in (
                "enum",
                "fixed",
            ) and t not in _PRIMITIVES:
                out["type"] = inline(t, seen)
            return out
        return s

    return inline(schema, frozenset())


def full_name(s: Any) -> str:
    if isinstance(s, str):
        return s
    ns = s.get("namespace", "")
    return f"{ns}.{s['name']}" if ns else s["name"]


def _branch_name(s: Any) -> str:
    """Union branch key in Avro JSON: type name, or full name for named
    types (Avro spec §JSON Encoding; goavro union.go)."""
    if isinstance(s, str):
        return s
    t = s["type"]
    if t in ("record", "enum", "fixed"):
        return full_name(s)
    return t


def to_avro_json(schema: Any, value: Any, raw: bool = False) -> Any:
    """Native python value → JSON-ready value. raw=False wraps unions
    per the Avro JSON encoding; raw=True emits plain JSON (goavro
    NewCodecForStandardJSONFull)."""
    if isinstance(schema, list):
        for branch in schema:
            if _matches(branch, value):
                if value is None:
                    return None
                inner = to_avro_json(branch, value, raw)
                return inner if raw else {_branch_name(branch): inner}
        raise AvroError(f"no union branch for {value!r}")
    t = schema if isinstance(schema, str) else schema["type"]
    if t in ("bytes", "fixed"):
        return bytes(value).decode("latin-1")
    if t == "record":
        return {
            f["name"]: to_avro_json(f["type"], value.get(f["name"]), raw)
            for f in schema["fields"]
        }
    if t == "array":
        return [to_avro_json(schema["items"], v, raw) for v in value or []]
    if t == "map":
        return {
            k: to_avro_json(schema["values"], v, raw) for k, v in (value or {}).items()
        }
    if t == "float" or t == "double":
        return float(value)
    return value


def from_avro_json(schema: Any, jv: Any, raw: bool = False) -> Any:
    """JSON value → native python value suitable for the binary encoder."""
    if isinstance(schema, list):
        if jv is None:
            if any(_branch_name(b) == "null" for b in schema):
                return None
            raise AvroError("null not permitted by union")
        if not raw:
            if not (isinstance(jv, dict) and len(jv) == 1):
                raise AvroError(
                    "avro JSON union values must be single-key objects; "
                    "set avro_raw_json for plain values"
                )
            key, inner = next(iter(jv.items()))
            for branch in schema:
                bn = _branch_name(branch)
                if bn == key or bn.split(".")[-1] == key:
                    return from_avro_json(branch, inner, raw)
            raise AvroError(f"union branch {key!r} not in schema")
        errs = []
        for branch in schema:
            try:
                native = from_avro_json(branch, jv, raw)
                if _matches(branch, native) or native is None:
                    return native
            except (AvroError, TypeError, ValueError) as e:  # try next branch
                errs.append(str(e))
        raise AvroError(f"no union branch accepts {jv!r}: {errs}")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        if jv is not None:
            raise AvroError("expected null")
        return None
    if t == "boolean":
        if not isinstance(jv, bool):
            raise AvroError("expected boolean")
        return jv
    if t in ("int", "long"):
        if isinstance(jv, bool) or not isinstance(jv, int):
            raise AvroError("expected integer")
        return jv
    if t in ("float", "double"):
        if isinstance(jv, bool) or not isinstance(jv, (int, float)):
            raise AvroError("expected number")
        return float(jv)
    if t in ("bytes", "fixed"):
        if not isinstance(jv, str):
            raise AvroError("expected latin-1 string for bytes")
        return jv.encode("latin-1")
    if t in ("string", "enum"):
        if not isinstance(jv, str):
            raise AvroError("expected string")
        return jv
    if t == "record":
        if not isinstance(jv, dict):
            raise AvroError("expected object for record")
        out = {}
        for f in schema["fields"]:
            if f["name"] in jv:
                out[f["name"]] = from_avro_json(f["type"], jv[f["name"]], raw)
            elif "default" in f:
                out[f["name"]] = f["default"]
            elif isinstance(f["type"], list) and any(
                _branch_name(b) == "null" for b in f["type"]
            ):
                out[f["name"]] = None
            else:
                raise AvroError(f"missing record field {f['name']!r}")
        return out
    if t == "array":
        if not isinstance(jv, list):
            raise AvroError("expected array")
        return [from_avro_json(schema["items"], v, raw) for v in jv]
    if t == "map":
        if not isinstance(jv, dict):
            raise AvroError("expected object for map")
        return {k: from_avro_json(schema["values"], v, raw) for k, v in jv.items()}
    raise AvroError(f"unsupported avro type {t!r}")


def decode_textual(schema: Any, buf: io.BytesIO, raw: bool) -> Any:
    """Avro binary → JSON value directly: the union index read from the
    wire names the branch, so avro-JSON wrapping uses the branch that
    actually encoded the datum (a decode-then-structural-rematch picks
    the first same-shaped branch instead)."""
    from benthos_spark.functions.avro_ocf import _read_bytes, _read_long

    if isinstance(schema, list):
        branch = schema[_read_long(buf)]
        inner = decode_textual(branch, buf, raw)
        if inner is None or raw:
            return inner
        return {_branch_name(branch): inner}
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "record":
        return {
            f["name"]: decode_textual(f["type"], buf, raw) for f in schema["fields"]
        }
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                _read_long(buf)
                n = -n
            for _ in range(n):
                out.append(decode_textual(schema["items"], buf, raw))
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
                out[k] = decode_textual(schema["values"], buf, raw)
        return out
    v = _decode(schema, buf)
    if t in ("bytes", "fixed"):
        return bytes(v).decode("latin-1")
    if t in ("float", "double"):
        return float(v)
    return v


def encode_textual(schema: Any, jv: Any, raw: bool, out: io.BytesIO) -> None:
    """Textual JSON → Avro binary directly, so union branch identity
    chosen while parsing (by branch NAME in avro-JSON mode) drives the
    union index — a two-step parse-then-structural-match loses that for
    unions of same-shaped records."""
    if isinstance(schema, list):
        if jv is None:
            for i, b in enumerate(schema):
                if _branch_name(b) == "null":
                    from benthos_spark.functions.avro_ocf import _write_long

                    _write_long(out, i)
                    return
            raise AvroError("null not permitted by union")
        from benthos_spark.functions.avro_ocf import _write_long

        if not raw:
            if not (isinstance(jv, dict) and len(jv) == 1):
                raise AvroError(
                    "avro JSON union values must be single-key objects; "
                    "set avro_raw_json for plain values"
                )
            key, inner = next(iter(jv.items()))
            for i, branch in enumerate(schema):
                bn = _branch_name(branch)
                if bn == key or bn.split(".")[-1] == key:
                    _write_long(out, i)
                    encode_textual(branch, inner, raw, out)
                    return
            raise AvroError(f"union branch {key!r} not in schema")
        errs = []
        for i, branch in enumerate(schema):
            scratch = io.BytesIO()
            try:
                encode_textual(branch, jv, raw, scratch)
            except (AvroError, TypeError, ValueError) as e:
                errs.append(str(e))
                continue
            _write_long(out, i)
            out.write(scratch.getvalue())
            return
        raise AvroError(f"no union branch accepts {jv!r}: {errs}")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "record":
        if not isinstance(jv, dict):
            raise AvroError("expected object for record")
        for f in schema["fields"]:
            if f["name"] in jv:
                encode_textual(f["type"], jv[f["name"]], raw, out)
            elif "default" in f:
                # defaults in schema JSON are plain (not union-wrapped)
                encode_textual(f["type"], f["default"], True, out)
            elif isinstance(f["type"], list) and any(
                _branch_name(b) == "null" for b in f["type"]
            ):
                encode_textual(f["type"], None, raw, out)
            else:
                raise AvroError(f"missing record field {f['name']!r}")
        return
    from benthos_spark.functions.avro_ocf import _write_bytes, _write_long

    if t == "array":
        if not isinstance(jv, list):
            raise AvroError("expected array")
        if jv:
            _write_long(out, len(jv))
            for item in jv:
                encode_textual(schema["items"], item, raw, out)
        _write_long(out, 0)
        return
    if t == "map":
        if not isinstance(jv, dict):
            raise AvroError("expected object for map")
        if jv:
            _write_long(out, len(jv))
            for k, v in jv.items():
                _write_bytes(out, k.encode("utf-8"))
                encode_textual(schema["values"], v, raw, out)
        _write_long(out, 0)
        return
    _encode(schema, from_avro_json(schema, jv, raw), out)


def hydrate_avro_references(root_schema: str, refs: dict[str, str]) -> Any:
    """serde_avro.go:13-46: a root schema that is a JSON array of names
    becomes the array of the referenced schema documents (a union)."""
    doc = json.loads(root_schema)
    if not refs or not isinstance(doc, list) or not all(isinstance(x, str) for x in doc):
        return doc
    out = []
    for name in doc:
        if name not in refs:
            raise SchemaRegistryError(
                f"referenced type '{name}' was not found in references"
            )
        out.append(json.loads(refs[name]))
    return out


# -- compiled serdes -----------------------------------------------------------


class AvroSerde:
    def __init__(self, schema_doc: Any, raw_json: bool):
        self.schema = resolve_avro_names(schema_doc)
        self.raw = raw_json

    def decode(self, payload: bytes) -> bytes:
        jv = decode_textual(self.schema, io.BytesIO(payload), self.raw)
        return json.dumps(jv, separators=(",", ":")).encode()

    def encode(self, body: bytes) -> bytes:
        out = io.BytesIO()
        encode_textual(self.schema, json.loads(body), self.raw, out)
        return out.getvalue()


class JsonSerde:
    """Validate-only: JSON in == JSON out (serde_json.go:40-66)."""

    def __init__(self, schema_doc: Any, refs: dict[str, str]):
        self.schema = jsonschema.compile_schema(schema_doc, refs)

    def _check(self, body: bytes) -> bytes:
        errs = self.schema.validate(json.loads(body))
        if errs:
            raise SchemaRegistryError("; ".join(errs))
        return body

    decode = _check
    encode = _check


class ProtobufSerde:
    """proto3 binary ↔ canonical JSON over this repo's own codec.

    The root .proto's top-level message order drives the wire-format
    message indexes; nested declaration order drives deeper hops
    (serde_protobuf.go:191-311)."""

    def __init__(self, proto_src: str, refs: dict[str, str]):
        fs = pb.FileSet()
        for name, src in refs.items():
            pb.parse_proto(src, fs)
        before = set(fs.messages)
        pb.parse_proto(proto_src, fs)
        self.fs = fs
        added = [k for k in fs.messages if k not in before]
        # top-level = added fqns that are not nested inside another added fqn
        self.top_level = [
            k for k in added if not any(k.startswith(p + ".") for p in added)
        ]
        if not self.top_level:
            raise SchemaRegistryError("protobuf schema declares no messages")
        self._last_ok: Optional[str] = None

    def _children(self, fqn: str) -> list[str]:
        pre = fqn + "."
        return [
            k
            for k in self.fs.messages
            if k.startswith(pre) and "." not in k[len(pre):]
        ]

    def _by_indexes(self, idx: list[int]) -> str:
        try:
            cur = self.top_level[idx[0]]
            for i in idx[1:]:
                cur = self._children(cur)[i]
        except IndexError:
            raise SchemaRegistryError(f"message indexes {idx} out of range")
        return cur

    def _indexes_of(self, fqn: str) -> list[int]:
        if fqn in self.top_level:
            return [self.top_level.index(fqn)]
        parent = fqn.rsplit(".", 1)[0]
        return self._indexes_of(parent) + [self._children(parent).index(fqn)]

    def decode(self, payload: bytes) -> bytes:
        consumed, idx = read_message_indexes(payload)
        fqn = self._by_indexes(idx)
        doc = pb.decode_message(payload[consumed:], fqn, self.fs)
        return json.dumps(doc, separators=(",", ":")).encode()

    def encode(self, body: bytes) -> bytes:
        doc = json.loads(body)
        candidates = list(self.top_level)
        if self._last_ok in candidates:
            candidates.remove(self._last_ok)
            candidates.insert(0, self._last_ok)
        errs = []
        for fqn in candidates:
            try:
                data = pb.encode_message(doc, fqn, self.fs)
            except Exception as e:  # try the next message type
                errs.append(f"{fqn}: {e}")
                continue
            self._last_ok = fqn
            return message_indexes_to_bytes(self._indexes_of(fqn)) + data
        raise SchemaRegistryError(f"no message type accepts document: {errs}")


def build_serde(info: dict, refs: dict[str, str], avro_raw_json: bool):
    """processor dispatch (decode.go:281-292 / encode.go:309-319):
    schemaType '' or AVRO → avro, JSON → validate, PROTOBUF → proto3."""
    stype = info.get("schemaType") or "AVRO"
    if stype == "AVRO":
        return AvroSerde(hydrate_avro_references(info["schema"], refs), avro_raw_json)
    if stype == "JSON":
        return JsonSerde(info["schema"], refs)
    if stype == "PROTOBUF":
        return ProtobufSerde(info["schema"], refs)
    raise SchemaRegistryError(f"schema type {stype} not supported")


# -- registry server ------------------------------------------------------------


@dataclass
class RegistryServer:
    """From-scratch Confluent-API-subset schema registry. Runs on the
    driver; processors reach it over plain HTTP so the same config works
    against a real registry URL. State is in-memory; ids are global and
    identical schema text registered twice under any subject dedupes to
    the same id (Confluent's documented behavior)."""

    address: str = "127.0.0.1:0"
    _server: object = field(default=None, repr=False)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)
    _by_id: dict = field(default_factory=dict, repr=False)  # id -> info
    _subjects: dict = field(default_factory=dict, repr=False)  # subject -> [ids]
    _next_id: int = 1

    @property
    def url(self) -> str:
        return f"http://{self.address}"

    def register(self, subject: str, schema: str, schema_type: str = "AVRO",
                 references: Optional[list] = None) -> int:
        with self._lock:
            key = (schema_type, schema, json.dumps(references or [], sort_keys=True))
            for sid, info in self._by_id.items():
                if (info["schemaType"], info["schema"],
                        json.dumps(info["references"], sort_keys=True)) == key:
                    versions = self._subjects.setdefault(subject, [])
                    if sid not in versions:
                        versions.append(sid)
                    return sid
            sid = self._next_id
            self._next_id += 1
            self._by_id[sid] = {
                "id": sid,
                "schemaType": schema_type,
                "schema": schema,
                "references": references or [],
            }
            self._subjects.setdefault(subject, []).append(sid)
            return sid

    # -- REST handlers -----------------------------------------------------

    def _lookup(self, path: str) -> tuple[int, Any]:
        parts = [p for p in urllib.parse.unquote(path).split("/") if p]
        with self._lock:
            if len(parts) == 3 and parts[0] == "schemas" and parts[1] == "ids":
                info = self._by_id.get(int(parts[2]))
                if info is None:
                    return 404, {"error_code": 40403, "message": "Schema not found"}
                return 200, info
            if len(parts) == 1 and parts[0] == "subjects":
                return 200, sorted(self._subjects)
            if len(parts) == 4 and parts[0] == "subjects" and parts[2] == "versions":
                versions = self._subjects.get(parts[1])
                if not versions:
                    return 404, {"error_code": 40401, "message": "Subject not found"}
                if parts[3] == "latest":
                    v = len(versions)
                elif parts[3].isdigit() and 1 <= int(parts[3]) <= len(versions):
                    v = int(parts[3])
                else:
                    return 404, {"error_code": 40402, "message": "Version not found"}
                info = dict(self._by_id[versions[v - 1]])
                info.update({"subject": parts[1], "version": v})
                return 200, info
        return 404, {"error_code": 404, "message": "not found"}

    def start(self) -> "RegistryServer":
        host, port = self.address.rsplit(":", 1)
        registry = self

        class Handler(BaseHTTPRequestHandler):
            def _send(self, code: int, doc: Any):
                body = json.dumps(doc).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                self._send(*registry._lookup(self.path))

            def do_POST(self):
                parts = [p for p in urllib.parse.unquote(self.path).split("/") if p]
                n = int(self.headers.get("Content-Length", 0))
                body = self.rfile.read(n)
                if len(parts) == 3 and parts[0] == "subjects" and parts[2] == "versions":
                    doc = json.loads(body)
                    sid = registry.register(
                        parts[1],
                        doc["schema"],
                        doc.get("schemaType", "AVRO"),
                        doc.get("references"),
                    )
                    self._send(200, {"id": sid})
                    return
                self._send(404, {"error_code": 404, "message": "not found"})

            def log_message(self, *a):  # quiet test output
                pass

        self._server = ThreadingHTTPServer((host, int(port)), Handler)
        self.address = "%s:%d" % self._server.server_address[:2]
        threading.Thread(target=self._server.serve_forever, daemon=True).start()
        return self

    def stop(self) -> None:
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None


# -- registry client -------------------------------------------------------------


class RegistryClient:
    """client.go — GET schema by id / by subject+version, and reference
    walking (WalkReferences): references name → SchemaInfo, recursively."""

    def __init__(self, url: str, timeout: float = 5.0):
        self.base = url.rstrip("/")
        self.timeout = timeout

    def _get(self, path: str) -> dict:
        try:
            with urllib.request.urlopen(self.base + path, timeout=self.timeout) as r:
                return json.loads(r.read())
        except urllib.error.HTTPError as e:
            if e.code == 404:
                raise SchemaRegistryError(f"not found by registry: {path}")
            raise SchemaRegistryError(f"request failed for {path}: {e}")
        except urllib.error.URLError as e:
            raise SchemaRegistryError(f"request failed for {path}: {e}")

    def schema_by_id(self, schema_id: int) -> dict:
        """client.go:75-101 — reference-exact error strings."""
        try:
            return self._get(f"/schemas/ids/{schema_id}")
        except SchemaRegistryError as e:
            if "not found" in str(e):
                raise SchemaRegistryError(
                    f"schema '{schema_id}' not found by registry"
                )
            raise SchemaRegistryError(f"request failed for schema '{schema_id}': {e}")

    def schema_by_subject(self, subject: str, version: Optional[int] = None) -> dict:
        v = "latest" if version is None else str(version)
        try:
            return self._get(
                f"/subjects/{urllib.parse.quote(subject, safe='')}/versions/{v}"
            )
        except SchemaRegistryError as e:
            if "not found" in str(e):
                raise SchemaRegistryError(
                    f"schema subject '{subject}' not found by registry"
                )
            raise SchemaRegistryError(
                f"request failed for schema subject '{subject}': {e}"
            )

    def walk_references(self, info: dict) -> dict[str, str]:
        """Flatten the reference graph to name → schema text."""
        out: dict[str, str] = {}

        def walk(refs: list):
            for ref in refs or []:
                if ref["name"] in out:
                    continue
                child = self.schema_by_subject(ref["subject"], ref.get("version"))
                out[ref["name"]] = child["schema"]
                walk(child.get("references"))

        walk(info.get("references"))
        return out

    def serde_by_id(self, schema_id: int, avro_raw_json: bool):
        info = self.schema_by_id(schema_id)
        return build_serde(info, self.walk_references(info), avro_raw_json)

    def serde_latest(self, subject: str, avro_raw_json: bool):
        info = self.schema_by_subject(subject)
        return build_serde(info, self.walk_references(info), avro_raw_json), info["id"]
