"""OTLP/HTTP trace export (functions/otlp.py): the wire bytes are
decoded back by the mini collector with the published trace.proto
schema — a parse-level check — and an end-to-end traced pipeline lands
its spans in the collector."""

from __future__ import annotations

import pytest

from benthos_spark.functions.otlp import (MiniOtlpCollector, OtlpHttpExporter,
                                          otlp_to_spans, spans_to_otlp)


@pytest.fixture()
def collector():
    c = MiniOtlpCollector().start()
    yield c
    c.stop()


def test_otlp_roundtrip_wire():
    spans = [{"trace_id": "0af7651916cd43dd8448eb211c80319c",
              "span_id": "b7ad6b7169203331",
              "parent_span_id": "00f067aa0ba902b7",
              "name": "proc:mapping", "kind": "processor", "ts": 1.5}]
    payload = spans_to_otlp(spans, service_name="svc")
    back = otlp_to_spans(payload)
    assert back == [{
        "service": "svc",
        "trace_id": "0af7651916cd43dd8448eb211c80319c",
        "span_id": "b7ad6b7169203331",
        "parent_span_id": "00f067aa0ba902b7",
        "name": "proc:mapping", "kind": 1,
        "start_ns": 1_500_000_000}]


def test_otlp_span_kinds():
    payload = spans_to_otlp([
        {"trace_id": "00" * 16, "span_id": "11" * 8, "name": "a",
         "kind": "input", "ts": 0},
        {"trace_id": "00" * 16, "span_id": "22" * 8, "name": "b",
         "kind": "output", "ts": 0}])
    kinds = [s["kind"] for s in otlp_to_spans(payload)]
    assert kinds == [5, 4]  # CONSUMER, PRODUCER (trace.proto SpanKind)


def test_collector_rejects_garbage(collector):
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        f"{collector.endpoint}/v1/traces", data=b"\xff\xfe not protobuf",
        headers={"Content-Type": "application/x-protobuf"}, method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    assert collector.requests == 0


def test_exporter_emit(collector):
    exp = OtlpHttpExporter(collector.endpoint, service_name="pipeline-x")
    exp.emit([{"trace_id": "ab" * 16, "span_id": "cd" * 8,
               "name": "input:file", "kind": "input", "ts": 2.0}])
    assert collector.requests == 1
    (s,) = collector.spans
    assert (s["service"], s["name"], s["kind"]) == ("pipeline-x",
                                                    "input:file", 5)


def test_traced_pipeline_exports_to_collector(collector, spark, tmp_path):
    from benthos_spark.config import run_config

    src = tmp_path / "in.jsonl"
    src.write_text('{"v": 1}\n{"v": 2}\n')
    conf = f"""
input:
  file:
    path: "{src}"
    codec: lines
pipeline:
  processors:
    - mutation:
        upper: upper(value)
output:
  file:
    path: "{tmp_path / 'out.jsonl'}"
tracer:
  open_telemetry_collector:
    endpoint: "{collector.endpoint}"
    service_name: traced-e2e
"""
    run_config(spark, conf, checkpoint=str(tmp_path / "ckpt"))
    assert collector.requests >= 1
    names = {s["name"] for s in collector.spans}
    assert any(n.startswith("input") for n in names)
    assert all(s["service"] == "traced-e2e" for s in collector.spans)
    # deterministic trace ids: sha256-of-content (tracing.py contract)
    assert all(len(s["trace_id"]) == 32 for s in collector.spans)
