"""OTLP/HTTP trace export — the OpenTelemetry Protocol's published
``ExportTraceServiceRequest`` over ``POST /v1/traces`` with
``Content-Type: application/x-protobuf`` (opentelemetry.io/docs/specs/
otlp; message layout from the published opentelemetry-proto
trace/v1/trace.proto + collector/trace/v1/trace_service.proto),
encoded with the repo's own .proto compiler (functions/protobuf.py).

The reference ships ``open_telemetry_collector`` and ``jaeger``
tracers (internal/impl/otlp/tracer_otlp.go:46,
internal/impl/jaeger/tracer_jaeger.go:26) over the otel-go SDK; here
the same spans the engine already records (streaming/tracing.py's
W3C-traceparent span dicts) are marshalled to OTLP by hand. Jaeger
has accepted OTLP natively since v1.35 (its published ingestion
surface — the classic Thrift agent port is deprecated upstream), so
one exporter serves both tracer names; :class:`MiniOtlpCollector`
stands in for the collector and DECODES every request with the same
schema to prove the bytes parse."""

from __future__ import annotations

import threading
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

from benthos_spark.functions.protobuf import (FileSet, decode_message,
                                              encode_message, parse_proto)

OTLP_PROTO = """
syntax = "proto3";
package opentelemetry.proto;

message AnyValue {
    string string_value = 1;
    bool bool_value = 2;
    int64 int_value = 3;
    double double_value = 4;
}

message KeyValue {
    string key = 1;
    AnyValue value = 2;
}

message Resource {
    repeated KeyValue attributes = 1;
}

message InstrumentationScope {
    string name = 1;
    string version = 2;
}

message Span {
    bytes trace_id = 1;
    bytes span_id = 2;
    string trace_state = 3;
    bytes parent_span_id = 4;
    string name = 5;
    int32 kind = 6;
    fixed64 start_time_unix_nano = 7;
    fixed64 end_time_unix_nano = 8;
    repeated KeyValue attributes = 9;
}

message ScopeSpans {
    InstrumentationScope scope = 1;
    repeated Span spans = 2;
}

message ResourceSpans {
    Resource resource = 1;
    repeated ScopeSpans scope_spans = 2;
}

message ExportTraceServiceRequest {
    repeated ResourceSpans resource_spans = 1;
}
"""

# Span.SpanKind (trace.proto): INTERNAL=1, SERVER=2, CLIENT=3,
# PRODUCER=4, CONSUMER=5
_KINDS = {"input": 5, "processor": 1, "output": 4,
          "CONSUME": 5, "PRODUCE": 4}

_FS: Optional[FileSet] = None


def _fs() -> FileSet:
    global _FS
    if _FS is None:
        _FS = parse_proto(OTLP_PROTO)
    return _FS


def spans_to_otlp(spans: list[dict], service_name: str = "benthos") -> bytes:
    """Marshal the engine's span dicts (trace_id/span_id hex,
    parent_span_id, name, kind, ts seconds) into an
    ExportTraceServiceRequest."""
    def b64safe_hex(h: Optional[str]) -> bytes:
        return bytes.fromhex(h) if h else b""

    out_spans = []
    for s in spans:
        ns = int(float(s.get("ts", 0)) * 1e9)
        out_spans.append({
            "traceId": b64safe_hex(s.get("trace_id")),
            "spanId": b64safe_hex(s.get("span_id")),
            "parentSpanId": b64safe_hex(s.get("parent_span_id")),
            "name": s.get("name", ""),
            "kind": _KINDS.get(str(s.get("kind", "")), 1),
            "startTimeUnixNano": ns,
            "endTimeUnixNano": ns,
            "attributes": [{"key": "component.kind",
                            "value": {"stringValue": str(s.get("kind", ""))}}],
        })
    req = {"resourceSpans": [{
        "resource": {"attributes": [
            {"key": "service.name",
             "value": {"stringValue": service_name}}]},
        "scopeSpans": [{
            "scope": {"name": "benthos_spark", "version": "1.0"},
            "spans": out_spans}],
    }]}
    return encode_message(req, "opentelemetry.proto.ExportTraceServiceRequest",
                          _fs())


def otlp_to_spans(payload: bytes) -> list[dict]:
    """Decode an ExportTraceServiceRequest back into plain span dicts
    (the mini collector's proof-of-parse path)."""
    doc = decode_message(payload,
                         "opentelemetry.proto.ExportTraceServiceRequest",
                         _fs())
    out = []
    for rs in doc.get("resourceSpans", []):
        service = ""
        for kv in rs.get("resource", {}).get("attributes", []):
            if kv["key"] == "service.name":
                service = kv["value"].get("stringValue", "")
        for ss in rs.get("scopeSpans", []):
            for s in ss.get("spans", []):
                out.append({
                    "service": service,
                    "trace_id": s.get("traceId", b"").hex(),
                    "span_id": s.get("spanId", b"").hex(),
                    "parent_span_id": s.get("parentSpanId", b"").hex() or None,
                    "name": s.get("name", ""),
                    "kind": s.get("kind", 0),
                    "start_ns": s.get("startTimeUnixNano", 0),
                })
    return out


class OtlpHttpExporter:
    """`tracer: open_telemetry_collector` / `jaeger` — POST
    x-protobuf ExportTraceServiceRequests to <endpoint>/v1/traces.
    Used as a tracing.py tracer (same ``emit(spans)`` contract as
    FileCollector); failures are swallowed after ``retries`` — tracing
    must never take the pipeline down (the reference's exporters are
    equally fire-and-forget)."""

    def __init__(self, endpoint: str, service_name: str = "benthos",
                 retries: int = 2, timeout_s: float = 10.0):
        self.endpoint = (endpoint if endpoint.startswith("http")
                         else "http://" + endpoint).rstrip("/")
        self.service_name, self.retries = service_name, retries
        self._timeout = timeout_s

    def emit(self, spans: list[dict]) -> None:
        if not spans:
            return
        payload = spans_to_otlp(spans, self.service_name)
        req = urllib.request.Request(
            f"{self.endpoint}/v1/traces", data=payload,
            headers={"Content-Type": "application/x-protobuf"},
            method="POST")
        for _ in range(self.retries + 1):
            try:
                with urllib.request.urlopen(req, timeout=self._timeout):
                    return
            except OSError:
                continue


class MiniOtlpCollector:
    """Loopback collector: decodes every request with the same schema
    (a byte-level parse check, not an echo) and stores the spans."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self.host, self.port = host, port
        self.spans: list[dict] = []
        self.requests = 0
        self._lock = threading.Lock()

    def start(self) -> "MiniOtlpCollector":
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                n = int(self.headers.get("Content-Length") or 0)
                payload = self.rfile.read(n)
                if (self.path != "/v1/traces"
                        or self.headers.get("Content-Type")
                        != "application/x-protobuf"):
                    self.send_response(415)
                    self.end_headers()
                    return
                try:
                    decoded = otlp_to_spans(payload)
                except Exception:
                    self.send_response(400)
                    self.end_headers()
                    return
                with outer._lock:
                    outer.spans.extend(decoded)
                    outer.requests += 1
                self.send_response(200)
                self.send_header("Content-Length", "0")
                self.end_headers()

        self._httpd = ThreadingHTTPServer((self.host, self.port), Handler)
        self.port = self._httpd.server_port
        threading.Thread(target=self._httpd.serve_forever, daemon=True).start()
        return self

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()

    @property
    def endpoint(self) -> str:
        return f"http://{self.host}:{self.port}"
